"""Batching (vmap) support for the custom_partitioning-wrapped Pallas ops.

JAX has no batching rule for the `custom_partitioning` primitive
(`NotImplementedError: Batching rule for 'custom_partitioning' not
implemented`), so any `vmap` that reaches one of our GSPMD-aware kernel
wrappers fails — first hit by the vectorized multi-seed EnsembleTrainer
(train/ensemble.py), which vmaps the whole train step over the seed axis.
The CPU suite never sees it because the CPU model paths route to the XLA
scan/einsum fallbacks; only the TPU kernel path (use_pallas /
use_fused_attention) binds these ops.

`sequential_vmap` wraps a cp-op in `jax.custom_batching.custom_vmap` whose
rule runs the unbatched op once per batch element via `lax.map`. Sequential
over the mapped axis is the right call here, not a folded "bigger batch":

- the mapped axis is the ENSEMBLE SEED axis — small (5 seeds) — while each
  per-element call is already a full-size kernel launch that saturates the
  chip on its own;
- it preserves bit-exact per-replica numerics (each element sees the exact
  unbatched op with its own operands), which the ensemble's
  sequential-parity certification (tests/test_ensemble.py) requires —
  folding the seed axis into the kernel's batch/BH grid would re-key the
  in-kernel dropout hash and break that parity;
- the lax.map body is traced/compiled ONCE, so compile time does not scale
  with the seed count.

Unbatched operands are NOT broadcast to the mapped axis — lax.map runs
over the batched operands only and the body closes over the unbatched ones
(scan operands are real buffers, so materializing an unbatched operand N
times would cost O(N*size) HBM; e.g. shared data under a seed-vmap with
per-seed shapelets). One level of vmap is supported (a second vmap over the
already-mapped op would batch the scan body and hit the same missing rule
— no current caller nests vmaps over these ops).

Reference parity note: the torch reference has no analogue (it runs seeds
sequentially, run.py:490-692); this exists so the vmapped multi-seed
driver matches those sequential semantics exactly.
"""

from __future__ import annotations

import jax
from jax import custom_batching


def sequential_vmap(op):
    """Wrap `op` (positional array args -> array or tuple of arrays) so it
    can appear under one level of `jax.vmap`, batching by mapping the
    unbatched op sequentially over the leading (mapped) axis."""

    wrapped = custom_batching.custom_vmap(lambda *args: op(*args))

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        # map over the batched operands only; unbatched operands enter the
        # body by closure (broadcasting them to the mapped axis would
        # materialize N copies of shared buffers in HBM under lax.map)
        batched_args = tuple(a for a, b in zip(args, in_batched) if b)
        if not batched_args:               # degenerate: nothing is mapped
            out = op(*args)
            out = jax.tree.map(lambda o: jax.lax.broadcast(o, (axis_size,)),
                               out)
            return out, jax.tree.map(lambda _: True, out)

        def body(xs):
            it = iter(xs)
            merged = tuple(next(it) if b else a
                           for a, b in zip(args, in_batched))
            return op(*merged)

        out = jax.lax.map(body, batched_args)
        return out, jax.tree.map(lambda _: True, out)

    return wrapped
