#!/usr/bin/env python
"""A/B lab for the fused attention kernel (ops/pallas/attention_pallas.py) at
the CHISCO bench shape. Each variant re-implements the forward with a
different intermediate-storage strategy; timings on the real chip.

Usage: python scripts/attn_lab.py v0 v1 ...   (one process per few variants —
the relay accumulates executables)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, T, DK = 512, 845, 64
T_PAD = 896
SCALE = 0.125


def timeit(name, fn, *args):
    out = fn(*args)
    float(jax.device_get(out.astype(jnp.float32).sum()))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn(*args)
        float(jax.device_get(out.astype(jnp.float32).sum()))
        reps.append((time.perf_counter() - t0) / n * 1e3)
    print(f"{name}: {np.median(reps):.2f} ms  {[round(r, 2) for r in reps]}",
          flush=True)


def call(kernel, bq, t_pad=T_PAD, extra_f32_out=False):
    qs = pl.BlockSpec((1, bq, DK), lambda i, j: (i, j, 0))
    ks = pl.BlockSpec((1, t_pad, DK), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, DK), jnp.bfloat16),
        grid=(BH, t_pad // bq),
        in_specs=[qs, ks, ks],
        out_specs=qs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def k_v0(q_ref, k_ref, v_ref, o_ref, *, t_real=T):
    """Round-2 formulation: f32 scores, bf16 round, jax.nn.softmax."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s.astype(jnp.bfloat16).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_real, s * SCALE, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        a.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_v1(q_ref, k_ref, v_ref, o_ref, *, t_real=T):
    """bf16-STORED scores (parity: autocast bmm stores bf16); manual softmax
    reading the bf16 matrix (half the VMEM traffic per pass)."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s16 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
    col = jax.lax.broadcasted_iota(jnp.int32, s16.shape, 1)
    valid = col < t_real
    m = jnp.max(jnp.where(valid, s16.astype(jnp.float32), -1e30), axis=-1,
                keepdims=True) * SCALE
    e = jnp.where(valid,
                  jnp.exp(s16.astype(jnp.float32) * SCALE - m), 0.0)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        a, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_v2(q_ref, k_ref, v_ref, o_ref, *, t_real=T):
    """v1 + unnormalized exp stored bf16; the 1/sum folds into the PV output
    (row-scaling the (BQ, DK) result instead of the (BQ, T) probs)."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s16 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
    col = jax.lax.broadcasted_iota(jnp.int32, s16.shape, 1)
    valid = col < t_real
    sf = jnp.where(valid, s16.astype(jnp.float32) * SCALE, -1e30)
    m = jnp.max(sf, axis=-1, keepdims=True)
    e = jnp.exp(sf - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def k_e0(q_ref, k_ref, v_ref, o_ref):
    """Roofline probe: QK matmul + ONE exp pass + PV (no max/sum/mask) —
    isolates the transcendental cost."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(s * SCALE - 20.0)
    o_ref[0] = jax.lax.dot_general(e.astype(jnp.bfloat16), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def k_n0(q_ref, k_ref, v_ref, o_ref):
    """Roofline probe: matmuls only (scores straight into PV)."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot_general((s * 1e-3).astype(jnp.bfloat16), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def k_n1(q_ref, kt_ref, v_ref, o_ref):
    """Matmul probe with K PRE-TRANSPOSED host-side: (M,K)@(K,N) layout for
    the scores matmul instead of a dim-1/dim-1 contraction."""
    q, kt, v = q_ref[0], kt_ref[0], v_ref[0]
    s = jnp.dot(q, kt, preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot_general((s * 1e-3).astype(jnp.bfloat16), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def call_kt(kernel, bq, t_pad=T_PAD):
    qs = pl.BlockSpec((1, bq, DK), lambda i, j: (i, j, 0))
    kts = pl.BlockSpec((1, DK, t_pad), lambda i, j: (i, 0, 0))
    vs = pl.BlockSpec((1, t_pad, DK), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, DK), jnp.bfloat16),
        grid=(BH, t_pad // bq),
        in_specs=[qs, kts, vs],
        out_specs=qs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def k_n2(q_ref, k_ref, v_ref, o_ref):
    """Matmul probe with dk zero-PADDED to 128: full MXU contraction depth
    for QK and full output-column tile for PV."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot_general((s * 1e-3).astype(jnp.bfloat16), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def call_pad(kernel, bq, dkp=128, t_pad=T_PAD):
    qs = pl.BlockSpec((1, bq, dkp), lambda i, j: (i, j, 0))
    ks = pl.BlockSpec((1, t_pad, dkp), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, dkp), jnp.bfloat16),
        grid=(BH, t_pad // bq),
        in_specs=[qs, ks, ks],
        out_specs=qs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    variants = sys.argv[1:] or ["v0", "v1", "v2"]
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, T_PAD, DK)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, T_PAD, DK)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, T_PAD, DK)), jnp.bfloat16)
    kernels = {"v0": k_v0, "v1": k_v1, "v2": k_v2, "e0": k_e0, "n0": k_n0}
    for name in variants:
        base, _, bqs = name.partition("@")
        bq = int(bqs) if bqs else T_PAD
        if base == "n1":
            fn = jax.jit(call_kt(k_n1, bq))
            timeit(f"n1@bq{bq}", fn, q, jnp.swapaxes(k, 1, 2), v)
            continue
        if base == "n2":
            pad = lambda z: jnp.pad(z, ((0, 0), (0, 0), (0, 64)))
            fn = jax.jit(call_pad(k_n2, bq))
            timeit(f"n2@bq{bq}", fn, pad(q), pad(k), pad(v))
            continue
        fn = jax.jit(call(kernels[base], bq))
        timeit(f"{base}@bq{bq}", fn, q, k, v)


if __name__ == "__main__":
    main()
