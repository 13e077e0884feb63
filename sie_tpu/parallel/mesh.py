"""Device-mesh parallelism: data-parallel batch sharding + tensor-parallel
param sharding over `jax.sharding.Mesh` (SURVEY.md SS2.7 — the TPU-native
replacement for the reference's nn.DataParallel, exp:279-281).

Recipe (jax-ml.github.io/scaling-book): pick a mesh, annotate the shardings of
params and batch, jit the step, and let XLA GSPMD insert the collectives over
ICI. Rules:

- batch tensors:      P('data') on axis 0; with a 'seq' mesh axis, axis 1
                      (time) of every rank>=2 batch tensor is sharded too —
                      sequence parallelism the GSPMD-compositional way: the
                      elementwise/conv/norm stages run time-sharded, and ops
                      that need the full sequence declare it (attention and
                      shapelet kernels carry need_replication_factors="T" in
                      their custom_partitioning rules), so XLA inserts the
                      all-gathers exactly at those seams
- shapelet banks      (n, C, L)        -> P('model')      per-bank shapelets split
- LTS thresholds      (n, C)           -> P('model')
- SBM classifier      (F, num_class)   -> P('model', None)  row-parallel (psum)
- FFN in  / QKV kernels (d, d_ff)      -> P(None, 'model')  column-parallel
- FFN out / attn-out  (d_ff, d)        -> P('model', None)  row-parallel
- MoE expert stacks   (E, ...)         -> P('expert', ...)  expert-parallel
  (leading expert axis; composes with 'model' on the d_ff dim of wi/wo —
  GSPMD places the all-to-all at the dispatch/combine einsums in
  models/moe.py)
- everything else replicated.

Optimizer state inherits param shardings by initializing optax *after* the
params are device_put with their NamedShardings (zeros_like preserves
sharding).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sie_tpu.config import Config


# NOTE (r3): the round-2 contextvar seam (active_mesh/mesh_context) that let
# the Trainer signal an ambient mesh to the Pallas shapelet op is GONE — the
# op now carries custom_partitioning rules (ops/pallas/shapelet_pallas.py),
# so GSPMD partitions it from the input shardings alone and `model.apply`
# with sharded params works outside any Trainer-owned context.


def make_mesh(cfg: Config, devices: Optional[Sequence[jax.Device]] = None
              ) -> Optional[Mesh]:
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(cfg.mesh_shape)
    if not shape or int(np.prod(shape)) <= 1:
        return None
    if int(np.prod(shape)) > len(devices):
        raise ValueError(f"mesh {shape} needs {np.prod(shape)} devices, "
                         f"have {len(devices)}")
    axes = cfg.mesh_axes[: len(shape)]
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axes)


def _axis(mesh: Mesh, name: str) -> Optional[str]:
    return name if name in mesh.axis_names else None


def params_partition_specs(params: Any, mesh: Mesh) -> Any:
    """Rule-based PartitionSpec tree for a model's params."""
    model = _axis(mesh, "model")
    expert = _axis(mesh, "expert")

    def rule(path: Tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if expert is not None and names and str(names[-1]).startswith(
                "expert_") and leaf.ndim >= 1:
            # stacked MoE expert params (models/moe.py): leading E axis is
            # expert-parallel; wi (E, d, f) / wo (E, f, d) / bi (E, f)
            # additionally split their d_ff dim over 'model' when present
            last = str(names[-1])
            if last == "expert_wi" and leaf.ndim == 3:
                return P(expert, None, model)
            if last == "expert_wo" and leaf.ndim == 3:
                return P(expert, model, None)
            if last == "expert_bi" and leaf.ndim == 2:
                return P(expert, model)
            return P(*([expert] + [None] * (leaf.ndim - 1)))
        if model is None or leaf.ndim == 0:
            return P()
        if "shapelets_" in joined and leaf.ndim == 3:
            return P(model, None, None)
        if "threshold_" in joined and leaf.ndim == 2:
            return P(model, None)
        if names and names[-1] == "kernel" and leaf.ndim == 2:
            parent = names[-2] if len(names) >= 2 else ""
            if parent in ("conv1", "query", "key", "value", "q", "k", "v",
                          "linear1"):
                return P(None, model)
            if parent in ("conv2", "out", "out_proj", "linear2",
                          "output_layer"):
                return P(model, None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    specs = params_partition_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def _batch_specs(batch: Tuple, mesh: Mesh) -> Tuple[P, ...]:
    data = _axis(mesh, "data")
    seq = _axis(mesh, "seq")
    specs = []
    for b in batch:
        axes = [data] + [None] * (b.ndim - 1)
        if seq is not None and b.ndim >= 2:
            # batch layout convention: axis 1 is time for every rank>=2
            # tensor (x (B,T,C), padding_mask (B,T), forecast marks (B,T,F))
            axes[1] = seq
        specs.append(P(*axes))
    return tuple(specs)


def shard_batch(batch: Tuple, mesh: Mesh) -> Tuple:
    data = _axis(mesh, "data")
    seq = _axis(mesh, "seq")
    if data is None and seq is None:
        return tuple(jax.device_put(b, NamedSharding(mesh, P())) for b in batch)
    specs = _batch_specs(batch, mesh)
    return tuple(jax.device_put(b, NamedSharding(mesh, s))
                 for b, s in zip(batch, specs))


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices of more than one process —
    multi-host data parallelism (each host feeds only its local rows)."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def global_batch_from_local(batch: Tuple, mesh: Mesh) -> Tuple:
    """Multi-host dp input path: every process passes ITS slice of the
    global batch (its rows of the 'data'-axis shard), and the returned
    jax.Arrays are GLOBAL — the batch dim is the sum over processes. The
    standard single-controller-per-host TPU feeding recipe
    (`jax.make_array_from_process_local_data`); composes with 'seq'/'model'
    axes because only the local data is process-local."""
    specs = _batch_specs(batch, mesh)
    return tuple(
        jax.make_array_from_process_local_data(NamedSharding(mesh, s),
                                               np.asarray(b))
        for b, s in zip(batch, specs))


def shard_state(state, mesh: Mesh, cfg: Config):
    """Shard a freshly-initialized TrainState: params by rule, batch_stats
    replicated, optimizer state re-initialized from the sharded params so its
    moments inherit the shardings."""
    params = shard_params(state.params, mesh)
    batch_stats = replicate(state.batch_stats, mesh)
    opt_state = state.tx.init(params)
    return state.replace(params=params, batch_stats=batch_stats,
                         opt_state=opt_state,
                         step=jax.device_put(
                             state.step, NamedSharding(mesh, P())))
