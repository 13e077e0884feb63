"""Jitted training engine.

TPU re-design of the reference train/validation loops
(`exp/experiment_classification.py:295-421`): the whole optimizer step —
forward (bf16 policy), loss (CE + model reg + beta-weighted SBM CE), backward,
global-norm clip, Adam update, optional non-negative projection of the SBM
classifier — is ONE compiled XLA program, optionally pjit-sharded over a
device mesh (data-parallel batch axis; the reference's nn.DataParallel
equivalent, SURVEY.md SS2.7).

Key mappings:
- torch.optim.Adam(lr)                  -> optax.adam with matching defaults
- CosineAnnealingWarmRestarts(T_0=E)    -> per-epoch cosine schedule (lr_decay)
- gradient_accumulation_steps           -> optax.MultiSteps
- autocast(bf16)                        -> Config.compute_dtype policy in models
- model.step() weight clamp             -> clamp_sbm_weights post-update
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from sie_tpu.config import Config
from sie_tpu.models import build_model
from sie_tpu.models.sbm import clamp_sbm_weights


def compute_beta(epoch: int, max_epoch: int, schedule: str = "cosine") -> float:
    """SBM-branch loss weight schedule (reference exp:19-26)."""
    if schedule == "cosine":
        return 0.5 * (1 + np.cos(np.pi * epoch / max_epoch))
    if schedule == "linear":
        return 1 - epoch / max_epoch
    return 1.0


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    # under MultiSteps the inner adam's count advances once per
    # accumulation group, so convert the micro-batch steps_per_epoch to
    # optimizer steps — otherwise the anneal runs k times too slowly
    accum = max(cfg.gradient_accumulation_steps, 1)
    opt_steps_per_epoch = max(-(-steps_per_epoch // accum), 1)

    if cfg.lr_decay:
        def base(step):
            epoch = step // opt_steps_per_epoch
            return cfg.lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch / cfg.train_epochs))
    else:
        def base(step):
            return cfg.lr

    if cfg.lr_warmup_epochs > 0:
        warmup_steps = max(int(cfg.lr_warmup_epochs * opt_steps_per_epoch), 1)

        def schedule(step):
            ramp = jnp.minimum((step + 1) / warmup_steps, 1.0)
            return base(step) * ramp
    elif cfg.lr_decay:
        schedule = base
    else:
        schedule = cfg.lr
    chain = []
    if cfg.gradient_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.gradient_clip))
    chain.append(optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8))
    tx = optax.chain(*chain)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx


def weighted_ce(logits: jax.Array, labels: jax.Array, weights: jax.Array) -> jax.Array:
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def _eval_forward(state: "TrainState", x, mask, gating_value=None):
    """Single source of truth for the eval-mode forward pass — shared by
    every jitted eval program (per-batch, staged, indexed, and the scanned
    whole-epoch pass) so the paths certified equivalent by
    tests/test_scan_epoch.py cannot silently diverge."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return state.apply_fn(variables, x, mask, train=False,
                          gating_value=gating_value)


def make_loss_fn(cfg: Config, apply_fn: Callable,
                 loss_head: Optional[Callable] = None):
    """loss_head(logits, labels, weights) -> scalar; defaults to weighted CE.

    The regression experiment passes a CRPS head (reference
    exp/experiment_regression.py:59-75)."""
    head = loss_head or weighted_ce
    is_interpgn = cfg.model == "InterpGN"

    def loss_fn(params, batch_stats, batch, beta, train, rng):
        x, y, mask, w = batch
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train:
            # 'losses' collects scalar aux objectives sown by submodules
            # (e.g. the MoE router's load-balance loss, models/moe.py)
            (logits, info), new_vars = apply_fn(
                variables, x, mask, train=True, rngs={"dropout": rng},
                mutable=["batch_stats", "losses"])
            new_stats = new_vars.get("batch_stats", batch_stats)
            sown = jax.tree.leaves(new_vars.get("losses", {}))
        else:
            logits, info = apply_fn(variables, x, mask, train=False)
            new_stats = batch_stats
            sown = []
        loss = head(logits, y, w)
        for s in sown:
            loss = loss + jnp.sum(s)
        if info.loss is not None:
            loss = loss + jnp.mean(info.loss)
        if is_interpgn:
            loss = loss + beta * head(info.shapelet_preds, y, w)
        return loss, (logits, info, new_stats)

    return loss_fn


class Trainer:
    """Owns the model, optimizer, and the compiled train/eval steps."""

    def __init__(self, cfg: Config, steps_per_epoch: int,
                 loss_head: Optional[Callable] = None,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg, steps_per_epoch)
        self.loss_fn = make_loss_fn(cfg, self.model.apply, loss_head)
        self.mesh = mesh
        self._train_step = None
        self._eval_steps = {}
        self._train_step_idx = None
        self._eval_steps_idx = {}
        self._train_step_staged = None
        self._train_epoch_staged = None
        self._eval_steps_staged = {}
        self._eval_epochs_scan = {}
        self._dev_data = {}

    # ---- state ----------------------------------------------------------
    def init_state(self, sample_batch, seed: int) -> TrainState:
        x, _y, mask, _w = sample_batch
        # jit the init: eager flax init dispatches the whole forward op-by-op
        # (the 6 scan-based shapelet banks alone cost ~20 s on CPU)
        init_fn = jax.jit(functools.partial(self.model.init, train=False))
        variables = init_fn(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            jnp.asarray(x), jnp.asarray(mask))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params),
                           tx=self.tx, apply_fn=self.model.apply)
        if self.mesh is not None:
            from sie_tpu.parallel.mesh import shard_state
            state = shard_state(state, self.mesh, self.cfg)
        return state

    # ---- compiled steps -------------------------------------------------
    def train_step(self, state: TrainState, batch, beta):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = self._device_batch(batch)
        return self._train_step(state, batch,
                                jnp.asarray(beta, jnp.float32))

    def eval_step(self, state: TrainState, batch, gating_value=None):
        if gating_value not in self._eval_steps:
            self._eval_steps[gating_value] = self._build_eval_step(gating_value)
        batch = self._device_batch(batch)
        return self._eval_steps[gating_value](state, batch)

    def device_batch_from_local(self, batch):
        """Multi-host dp input path: `batch` holds THIS process's rows of
        the global batch; returns global jax.Arrays assembled from the
        per-process shards (parallel/mesh.py:global_batch_from_local).
        Feed the result to train_step — _device_batch passes
        already-global arrays through untouched."""
        from sie_tpu.parallel.mesh import global_batch_from_local
        assert self.mesh is not None
        return global_batch_from_local(
            tuple(np.asarray(b) for b in batch), self.mesh)

    def _device_batch(self, batch):
        # idempotent: callers may pre-place batches (prefetch_to_device
        # uses this method as its device_put hook, then train_step calls
        # it again). Global arrays from device_batch_from_local span
        # non-addressable devices and must pass through untouched.
        if any(isinstance(b, jax.Array) and not b.is_fully_addressable
               for b in batch):
            return tuple(batch)
        batch = tuple(jnp.asarray(b) for b in batch)
        if self.mesh is not None:
            from sie_tpu.parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
        return batch

    def _update(self, state: TrainState, batch, beta):
        """Shared body of the jitted train steps: loss+grad, optimizer update,
        optional non-negativity projection."""
        cfg = self.cfg
        rng = jax.random.fold_in(jax.random.key(cfg.seed + 17), state.step)
        if cfg.augment:
            # train-only on-device augmentation (data/augment.py) — fuses
            # into this compiled step; eval paths never see it
            from sie_tpu.data.augment import apply_augmentations
            x, y, mask, w = batch
            x, mask = apply_augmentations(
                cfg, jax.random.fold_in(rng, 9173), x, mask)
            batch = (x, y, mask, w)
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        (loss, (logits, _info, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, beta, True, rng)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.pos_weight and cfg.model in ("SBM", "LTS", "InterpGN"):
            params = clamp_sbm_weights(params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, loss, logits

    def _build_train_step(self):
        def step(state: TrainState, batch, beta):
            return self._update(state, batch, beta)

        return jax.jit(step, donate_argnums=(0,))

    def _build_eval_step(self, gating_value=None):
        def step(state: TrainState, batch):
            x, y, mask, w = batch
            return _eval_forward(state, x, mask, gating_value)

        return jax.jit(step)

    # ---- device-resident data path ---------------------------------------
    # TPU-first input pipeline: the whole split lives in HBM once and batches
    # are gathered on-device from an index vector — per-step host->device
    # traffic drops from the full batch (tens of MB) to a few hundred bytes.
    # (The reference re-collates and re-uploads every batch via DataLoader.)
    # Used on a single device; the mesh path keeps host feeding (per-host
    # sharded feeding is the multi-host deployment model).

    def device_data(self, tag: str, ds) -> Tuple[jax.Array, ...]:
        if tag not in self._dev_data:
            self._dev_data[tag] = (jnp.asarray(ds.x), jnp.asarray(ds.y),
                                   jnp.asarray(ds.padding_mask))
        return self._dev_data[tag]

    def train_step_indexed(self, state: TrainState, dev_data, idx, w, beta):
        if self._train_step_idx is None:
            def step(state: TrainState, data, idx, w, beta):
                x, y, mask = (leaf[idx] for leaf in data)
                return self._update(state, (x, y, mask, w), beta)

            self._train_step_idx = jax.jit(step, donate_argnums=(0,))
        return self._train_step_idx(state, dev_data, jnp.asarray(idx),
                                    jnp.asarray(w),
                                    jnp.asarray(beta, jnp.float32))

    # ---- epoch-staged steps ----------------------------------------------
    # Through the axon relay each host->device buffer upload costs ~2 ms of
    # latency; the indexed path pays it 3x per step (idx, w, beta) — measured
    # 9.4 -> 2.2 ms/step for a tiny model when the whole epoch's schedule is
    # staged in HBM up front and each step passes only a host int. On a real
    # TPU VM the upload latency is far smaller, but one scalar per step is
    # strictly cheaper everywhere.

    def stage_steps(self, steps, beta=0.0):
        """Upload an epoch's (idx, w) schedule + beta in three transfers.
        steps: list of (idx (B,), w (B,)) pairs from Batcher.epoch_indices.
        Returns None for an empty epoch (np.stack would raise); callers loop
        `range(len(steps))` so a None schedule is never dereferenced."""
        if not steps:
            return None
        idx_all = np.stack([i for i, _ in steps]).astype(np.int32)
        w_all = np.stack([w for _, w in steps]).astype(np.float32)
        return (jax.device_put(idx_all), jax.device_put(w_all),
                jax.device_put(np.float32(beta)))

    def train_step_staged(self, state: TrainState, dev_data, staged, k: int):
        if self._train_step_staged is None:
            def step(state: TrainState, data, ia, wa, beta, k):
                idx = ia[k]
                x, y, mask = (leaf[idx] for leaf in data)
                return self._update(state, (x, y, mask, wa[k]), beta)

            self._train_step_staged = jax.jit(step, donate_argnums=(0,))
        ia, wa, beta = staged
        return self._train_step_staged(state, dev_data, ia, wa, beta, k)

    def train_epoch_staged(self, state: TrainState, dev_data, staged):
        """Whole-epoch fused dispatch (cfg.scan_epoch): lax.scan over the
        staged (idx, w) schedule runs every step of the epoch in ONE
        compiled program — zero per-step host involvement (the per-step
        path still uploads one int scalar and pays one dispatch per step;
        through the axon relay that is ~2 ms/step, which dominates
        fast-step models). Numerically equivalent to looping
        train_step_staged (tests/test_scan_epoch.py). Returns
        (state, per-step losses (n_steps,)). One compile per distinct
        (n_steps, B) schedule shape; Batcher pads the final batch and
        yields a fixed step count every epoch, so a given split compiles
        exactly one program."""
        if self._train_epoch_staged is None:
            def epoch(state, data, ia, wa, beta):
                def body(st, sched):
                    idx, w = sched
                    x, y, mask = (leaf[idx] for leaf in data)
                    st, loss, _logits = self._update(st, (x, y, mask, w),
                                                     beta)
                    return st, loss
                return jax.lax.scan(body, state, (ia, wa))

            self._train_epoch_staged = jax.jit(epoch, donate_argnums=(0,))
        ia, wa, beta = staged
        return self._train_epoch_staged(state, dev_data, ia, wa, beta)

    def eval_epoch_staged_scan(self, state: TrainState, dev_data, staged,
                               gating_value=None, collect: bool = False):
        """Whole-eval-pass fused dispatch (cfg.scan_epoch): scans the staged
        schedule in ONE compiled program and returns stacked
        (logits (n,B,C), per-sample CE (n,B), per-batch model loss (n,),
        stacked ModelInfo or None). The per-batch staged eval path pays a
        dispatch + a blocking logits fetch + a CE round trip per batch
        (~4 relay round trips each); here the caller fetches everything
        with one device_get. CE is computed in-graph on the device labels."""
        key = (gating_value, bool(collect))
        if key not in self._eval_epochs_scan:
            def epoch(state: TrainState, data, ia):
                def body(carry, idx):
                    x, y, mask = (leaf[idx] for leaf in data)
                    logits, info = _eval_forward(state, x, mask, gating_value)
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits, y)
                    mloss = (jnp.mean(info.loss) if info.loss is not None
                             else jnp.zeros(()))
                    return carry, (logits, ce, mloss,
                                   info if collect else None)

                _, ys = jax.lax.scan(body, None, ia)
                return ys

            self._eval_epochs_scan[key] = jax.jit(epoch)
        return self._eval_epochs_scan[key](state, dev_data, staged[0])

    def eval_step_staged(self, state: TrainState, dev_data, staged, k: int,
                         gating_value=None):
        if gating_value not in self._eval_steps_staged:
            def step(state: TrainState, data, ia, k):
                idx = ia[k]
                x, y, mask = (leaf[idx] for leaf in data)
                return _eval_forward(state, x, mask, gating_value)

            self._eval_steps_staged[gating_value] = jax.jit(step)
        ia = staged[0]
        return self._eval_steps_staged[gating_value](state, dev_data, ia, k)

    def eval_step_indexed(self, state: TrainState, dev_data, idx,
                          gating_value=None):
        if gating_value not in self._eval_steps_idx:
            def step(state: TrainState, data, idx):
                x, y, mask = (leaf[idx] for leaf in data)
                return _eval_forward(state, x, mask, gating_value)

            self._eval_steps_idx[gating_value] = jax.jit(step)
        return self._eval_steps_idx[gating_value](state, dev_data,
                                                  jnp.asarray(idx))
