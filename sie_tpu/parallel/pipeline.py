"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

Reference parity: none to match — the reference's only parallelism is
single-process nn.DataParallel (exp/experiment_classification.py:279-281).
This is the TPU-native scaling surface for deep homogeneous stacks
(SURVEY §2.7 scopes anything beyond dp as rebuild extras): pipeline stages
live on mesh shards, activations rotate stage-to-stage over ICI via
`lax.ppermute` inside `shard_map`, and microbatching keeps the bubble
fraction at (S-1)/(M+S-1).

Schedule (forward): `lax.scan` over T = M + S - 1 ticks. At tick t stage 0
ingests microbatch min(t, M-1) (ticks past M feed it a repeat whose output
is never collected), every stage applies its layer slice, and results
rotate one stage forward. The last stage collects tick outputs t >= S-1
into its (M, ...) buffer; a masked psum replicates them across the pipe
axis at the end. Reverse-mode AD through scan + ppermute yields the
standard backward pipeline (reverse rotation, same bubble) for free — no
hand-written backward schedule.

The executor is generic over `stage_fn` and used library-level: the
reference model zoo tops out at e_layers=3, where a pipeline cannot win —
so this is exercised by `dryrun_multichip` and the test suite as a
capability, not wired as a CLI default.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(layer_params: list, n_stages: int) -> Any:
    """Stack L per-layer param trees (identical structure) into one tree of
    (S, L/S, ...) leaves — stage-major so shard s of a P('pipe') sharding
    holds exactly its consecutive layer slice."""
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers do not split into "
                         f"{n_stages} equal stages")
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params)
    return jax.tree.map(
        lambda leaf: leaf.reshape(n_stages, n_layers // n_stages,
                                  *leaf.shape[1:]), stacked)


def gpipe(stage_fn: Callable, stacked_params: Any, x: jax.Array,
          mesh: Mesh, *, axis: str = "pipe", n_microbatches: int,
          data_axis: Optional[str] = None, collect_aux: bool = False):
    """Run a homogeneous layer stack as a pipeline.

    stage_fn(layer_params, x_mb, tick) -> y_mb applies ONE layer (its
    params = one (…) slice of the stacked tree's second axis); tick is the
    schedule step, available for rng folding so dropout masks differ per
    microbatch. stacked_params: (S, L/S, ...) leaves (stack_stage_params).
    x: (B, ...) with B % n_microbatches == 0. data_axis: optional mesh axis
    the batch dim is (and stays) sharded over — pipelining composes with
    data parallelism on a ('data', 'pipe') mesh.

    collect_aux=True threads a scalar auxiliary-loss channel through the
    schedule (VERDICT r3 item 5 — the MoE router's load-balance loss):
    stage_fn must then return (y_mb, aux_scalar). Bubble-tick contributions
    (where a stage processes garbage) are masked out; the return becomes
    (out, aux) where aux = mean over microbatches of the per-microbatch
    layer-summed aux, averaged over the data axis — the pipeline analogue
    of the standard path's sown-losses sum.
    """
    from jax import shard_map

    n_stages = mesh.shape[axis]
    n_micro = n_microbatches
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible into "
                         f"{n_micro} microbatches")
    layers_per_stage = jax.tree.leaves(stacked_params)[0].shape[1]

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    x_spec = P(data_axis, *([None] * (x.ndim - 1)))
    out_specs = (x_spec, P()) if collect_aux else x_spec
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(param_specs, x_spec),
                       out_specs=out_specs, check_vma=False)
    def run(params, xl):
        # local views: (1, L/S, ...) param slice -> (L/S, ...); batch shard
        # -> (M, b_local/M, ...) microbatches
        params = jax.tree.map(lambda p: p[0], params)
        mbs = xl.reshape(n_micro, xl.shape[0] // n_micro, *xl.shape[1:])
        stage = jax.lax.axis_index(axis)

        def apply_stage(p, xm, t):
            aux = jnp.zeros((), jnp.float32)
            for i in range(layers_per_stage):
                out = stage_fn(jax.tree.map(lambda q, i=i: q[i], p), xm, t)
                if collect_aux:
                    xm, a = out
                    aux = aux + a.astype(jnp.float32)
                else:
                    xm = out
            return xm, aux

        def tick(carry, t):
            state, outs, aux_acc = carry
            inp = jax.lax.dynamic_index_in_dim(
                mbs, jnp.minimum(t, n_micro - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, inp, state)
            y, aux = apply_stage(params, cur, t)
            # this stage holds a REAL microbatch only for ticks in
            # [stage, stage + M - 1]; bubble ticks process garbage and must
            # not contribute to the aux objective
            valid = ((t >= stage) & (t - stage <= n_micro - 1)
                     ).astype(jnp.float32)
            aux_acc = aux_acc + aux * valid
            idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            collected = jax.lax.dynamic_update_index_in_dim(outs, y, idx, 0)
            take = (stage == n_stages - 1) & (t >= n_stages - 1)
            outs = jnp.where(take, collected, outs)
            state = jax.lax.ppermute(y, axis, perm)
            return (state, outs, aux_acc), None

        init = (jnp.zeros_like(mbs[0]), jnp.zeros_like(mbs),
                jnp.zeros((), jnp.float32))
        (_, outs, aux_acc), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stages - 1))
        # only the last stage holds real outputs; masked psum replicates
        # them across the pipe axis (out_specs then slices the batch shard)
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis)
        if not collect_aux:
            return outs.reshape(xl.shape)
        # per-microbatch means, summed over all stages' layer slices; then
        # averaged over data shards so the scalar is globally replicated
        aux = jax.lax.psum(aux_acc, axis) / n_micro
        if data_axis is not None:
            aux = jax.lax.pmean(aux, data_axis)
        return outs.reshape(xl.shape), aux

    return run(stacked_params, x)


def encoder_layer_stage_fn(cfg, rng: Optional[jax.Array] = None,
                           train: bool = False,
                           collect_aux: bool = False) -> Callable:
    """stage_fn running one standard EncoderLayer (models/layers.py) from an
    extracted param subtree; dropout rng folds in the schedule tick so each
    microbatch draws independent masks. With collect_aux=True the layer runs
    with a mutable 'losses' collection and the stage_fn returns
    (y, sum-of-sown-scalars) — the MoE router's load-balance loss survives
    the pipeline instead of being silently dropped."""
    from sie_tpu.models.layers import EncoderLayer

    layer = EncoderLayer(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.dropout,
                         cfg.activation, cfg.compute_dtype,
                         use_flash=False, use_fused=cfg.use_fused_attention,
                         fused_max_len=cfg.fused_attention_max_len,
                         fused_min_len=cfg.fused_attention_min_len,
                         moe_experts=cfg.moe_experts,
                         moe_capacity_factor=cfg.moe_capacity_factor,
                         moe_top_k=cfg.moe_top_k,
                         moe_aux_weight=cfg.moe_aux_weight)

    def stage_fn(p, xm, t):
        rngs = None
        if train and rng is not None:
            rngs = {"dropout": jax.random.fold_in(rng, t)}
        if not collect_aux:
            return layer.apply({"params": p}, xm, train=train, rngs=rngs)
        y, mut = layer.apply({"params": p}, xm, train=train, rngs=rngs,
                             mutable=["losses"])
        sown = jax.tree.leaves(mut.get("losses", {}))
        aux = sum((jnp.sum(s) for s in sown), jnp.zeros((), jnp.float32))
        return y, aux

    return stage_fn


def pipelined_encoder_apply(cfg, encoder_params: Any, x: jax.Array,
                            mesh: Mesh, *, n_microbatches: int,
                            axis: str = "pipe",
                            data_axis: Optional[str] = None,
                            rng: Optional[jax.Array] = None,
                            train: bool = False,
                            return_aux: bool = False):
    """Apply a trained Encoder's (models/layers.py:Encoder) params as a
    pipeline: layer_i subtrees become stages, the trailing 'norm' LayerNorm
    runs after the pipeline (it is not part of the homogeneous stack).

    With return_aux=True the result is (out, aux) where aux carries the
    stages' sown 'losses' scalars (MoE load balance) through the schedule.
    TRAINING a MoE stack through the pipeline WITHOUT return_aux raises:
    the balancing objective would otherwise be silently lost
    (models/moe.py sows it; make_loss_fn adds it on the standard path)."""
    import flax.linen as nn

    if cfg.moe_experts > 0 and train and not return_aux:
        raise ValueError(
            "moe_experts > 0 under the pipeline executor with train=True "
            "requires return_aux=True — the router's sown load-balance loss "
            "is not collectable through shard_map otherwise, and dropping "
            "it silently un-balances the experts. Pass return_aux=True and "
            "add the returned aux scalar to the objective.")
    layers = [encoder_params[f"layer_{i}"]
              for i in range(cfg.e_layers)]
    stacked = stack_stage_params(layers, mesh.shape[axis])
    out = gpipe(encoder_layer_stage_fn(cfg, rng=rng, train=train,
                                       collect_aux=return_aux), stacked,
                x, mesh, axis=axis, n_microbatches=n_microbatches,
                data_axis=data_axis, collect_aux=return_aux)
    if return_aux:
        out, aux = out
    out = nn.LayerNorm().apply({"params": encoder_params["norm"]}, out)
    return (out, aux) if return_aux else out
