"""Vectorized multi-seed training — vmap over the seed axis.

The reference's main loop trains its 5 seeds SEQUENTIALLY
(reference run.py:564-625); each run re-dispatches the same program. On
TPU the natural formulation is `jax.vmap` over a leading seed axis of
(params, opt_state, rng): one compiled program trains every seed at once,
and for the small backbones that dominate the UEA sweep (FCN/ResNet steps
are dispatch-bound at ~8k samples/s, docs/BENCH_NOTES.md) N seeds cost
close to 1x wall time. Composes with a device mesh: the vmapped step can
additionally shard its batch axis.

Semantics parity with the sequential Trainer (train/trainer.py) is kept
exactly: per-seed init keys are `key(seed)`/`key(seed+1)` and per-step
dropout rng is `fold_in(key(seed+17), step)` — the same derivations
`Trainer.init_state`/`Trainer._update` use — so seed i of the ensemble is
the same experiment as a sequential run with `--seed i`
(tests/test_ensemble.py certifies per-seed loss-trajectory equality).

Early stopping across seeds is a host decision: pass `alive` (N,) to
train_step and stopped seeds get zeroed updates (params frozen, step still
advances) — the vmapped program never recompiles as seeds finish.

Library-level capability (like parallel/pipeline.py): the CLI's
skip-train-if-checkpoint / per-seed artifact layout is inherently
per-seed-sequential, so this surface is exercised by tests and available
to sweep scripts, not wired as a run.py default.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from sie_tpu.config import Config
from sie_tpu.models import build_model
from sie_tpu.models.sbm import clamp_sbm_weights
from sie_tpu.train.trainer import TrainState, make_loss_fn, make_optimizer


class EnsembleTrainer:
    """Trains N independently-seeded replicas of one model in one program."""

    def __init__(self, cfg: Config, steps_per_epoch: int,
                 seeds: Tuple[int, ...]):
        self.cfg = cfg
        self.seeds = jnp.asarray(seeds, jnp.int32)
        self.n = len(seeds)
        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg, steps_per_epoch)
        self.loss_fn = make_loss_fn(cfg, self.model.apply)
        self._train_step = None
        self._eval_step = {}

    # ---- state -----------------------------------------------------------
    def init_states(self, sample_batch) -> TrainState:
        """TrainState whose leaves carry a leading (N,) seed axis."""
        x, _y, mask, _w = sample_batch
        x, mask = jnp.asarray(x), jnp.asarray(mask)

        def init_one(seed):
            variables = self.model.init(
                {"params": jax.random.key(seed),
                 "dropout": jax.random.key(seed + 1)}, x, mask, train=False)
            params = variables["params"]
            return (params, variables.get("batch_stats", FrozenDict()),
                    self.tx.init(params))

        params, batch_stats, opt_state = jax.jit(jax.vmap(init_one))(
            self.seeds)
        return TrainState(step=jnp.zeros((self.n,), jnp.int32),
                          params=params, batch_stats=batch_stats,
                          opt_state=opt_state, tx=self.tx,
                          apply_fn=self.model.apply)

    # ---- steps -----------------------------------------------------------
    def _update_one(self, seed, alive, state: TrainState, batch, beta):
        cfg = self.cfg
        rng = jax.random.fold_in(jax.random.key(seed + 17), state.step)
        if cfg.augment:
            # same derivation as Trainer._update so per-seed parity holds
            # for augmented configs too
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
        # stopped seeds: fully frozen — zeroed update, old opt-state, and
        # old batch_stats (BatchNorm running stats must not keep drifting
        # after the seed early-stops)
        updates = jax.tree.map(lambda u: u * alive, updates)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(alive > 0, new, old),
            opt_state, state.opt_state)
        new_stats = jax.tree.map(
            lambda new, old: jnp.where(alive > 0, new, old),
            new_stats, state.batch_stats)
        params = optax.apply_updates(state.params, updates)
        if cfg.pos_weight and cfg.model in ("SBM", "LTS", "InterpGN"):
            params = clamp_sbm_weights(params)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats,
                             opt_state=opt_state), loss, logits

    def train_step(self, states: TrainState, batches, beta,
                   alive: Optional[np.ndarray] = None):
        """batches: per-seed stacked (N, B, ...) tuple — each seed keeps its
        own shuffle order, like sequential runs do. alive: (N,) float mask
        (1 = still training)."""
        if self._train_step is None:
            def step(states, batches, beta, alive):
                return jax.vmap(
                    self._update_one, in_axes=(0, 0, 0, 0, None)
                )(self.seeds, alive, states, batches, beta)

            self._train_step = jax.jit(step, donate_argnums=(0,))
        if alive is None:
            alive = np.ones((self.n,), np.float32)
        batches = tuple(jnp.asarray(b) for b in batches)
        return self._train_step(states, batches,
                                jnp.asarray(beta, jnp.float32),
                                jnp.asarray(alive, jnp.float32))

    def eval_step(self, states: TrainState, batch, gating_value=None):
        """One SHARED batch evaluated by every seed: (N, B, num_class).
        Programs are cached per gating_value (like Trainer._eval_steps)."""
        if gating_value not in self._eval_step:
            def one(params, batch_stats, x, mask, gv=gating_value):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.model.apply(variables, x, mask, train=False,
                                        gating_value=gv)

            self._eval_step[gating_value] = jax.jit(jax.vmap(
                one, in_axes=(0, 0, None, None)))
        x, _y, mask, _w = batch
        return self._eval_step[gating_value](
            states.params, states.batch_stats,
            jnp.asarray(x), jnp.asarray(mask))


def stack_seed_batches(batcher_steps, data_x, data_y, data_mask):
    """Helper: turn per-seed (idx, w) schedules into one stacked batch tuple
    (N, B, ...) for train_step. batcher_steps: list over seeds of (idx, w)."""
    xs, ys, ms, ws = [], [], [], []
    for idx, w in batcher_steps:
        xs.append(data_x[idx]); ys.append(data_y[idx])
        ms.append(data_mask[idx]); ws.append(w)
    return (np.stack(xs), np.stack(ys), np.stack(ms),
            np.stack(ws).astype(np.float32))
