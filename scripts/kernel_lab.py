#!/usr/bin/env python
"""Kernel experiment lab — forward-variant A/B measurements on the chip.

Usage: python scripts/kernel_lab.py <variant> [bank_index|-1=all6] [iters]
Variants:
  v1       library kernel (baseline)
  v4       pre-shifted x copies: x8[k] = x shifted by k sublanes, so every
           in-kernel window read is sublane-ALIGNED (hypothesis: the per-k
           unaligned reads cost ~2x on the VPU load path)
  v4bwd    v4-style backward (pre-shifted, aligned reads), fwd+bwd timing
  v1bwd    library fwd+bwd baseline
One variant per process (relay executable accumulation).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEQ_LEN, ENC_IN, BATCH, NSH = 845, 122, 64, 10
FRACS = (0.05, 0.1, 0.2, 0.3, 0.5, 0.8)
CK = 8


def _window_tile(n, c, w):
    from sie_tpu.ops.pallas.shapelet_pallas import _window_tile as wt
    return wt(n, c, w)


# ---------------------------------------------------------------- v4 forward
def _fwd_kernel_v4(x8_ref, s_ref, out_ref, acc_ref):
    # x8_ref: (1, CK, T8, C) pre-shifted copies (x8[k, t] = x[t + k]);
    # s_ref: (n, L, C); out_ref: (1, n, WT, C); all reads sublane-aligned:
    # window w, tap l=ci*CK+k reads x8[k, w + ci*CK] -> offset w0 + ci*CK
    # (both multiples of 8).
    n, l, c = s_ref.shape
    wt = out_ref.shape[2]
    w0 = pl.program_id(1) * wt
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_body(ci, _):
        base = ci * CK
        sch = s_ref[:, pl.ds(base, CK), :]
        part = jnp.zeros((n, wt, c), jnp.float32)
        for k in range(CK):
            xs = x8_ref[0, k, pl.ds(w0 + base, wt), :]     # aligned
            part = part + jnp.abs(xs[None] - sch[:, k: k + 1, :])
        acc_ref[:] += part
        return 0

    if l >= CK:
        jax.lax.fori_loop(0, l // CK, chunk_body, 0)
    tail0 = l - l % CK
    if l % CK:
        tail = jnp.zeros((n, wt, c), jnp.float32)
        for li in range(tail0, l):
            k = li - tail0
            xs = x8_ref[0, k, pl.ds(w0 + tail0, wt), :]
            tail = tail + jnp.abs(xs[None] - s_ref[:, li: li + 1, :])
        acc_ref[:] += tail
    out_ref[0] = acc_ref[:] * (1.0 / l)


def fwd_v4(x, s):
    b, c, t = x.shape
    n, _, l = s.shape
    w = t - l + 1
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    # host-side pre-shift: x8[k, t] = x[t + k]; pad so every aligned read of
    # (wt) rows at offset w0+ci*CK is in bounds: max offset = (nwt*wt - wt) +
    # (l//CK)*CK + wt <= nwt*wt + l
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)          # (B, T, C)
    t8 = nwt * wt + l + CK
    xp = jnp.pad(xt, ((0, 0), (0, t8 + CK - t), (0, 0)))
    x8 = jnp.stack([xp[:, k: k + t8, :] for k in range(CK)], axis=1)
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)
    out = pl.pallas_call(
        _fwd_kernel_v4,
        out_shape=jax.ShapeDtypeStruct((b, n, w, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, CK, t8, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, wt, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c * CK + n * l * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x8, st)
    return jnp.swapaxes(out, 2, 3)


# ------------------------------------------------------- v5: dual partials
def _fwd_kernel_v5(x_ref, s_ref, out_ref, x8_ref, acc_ref):
    """Library kernel + two independent partial accumulators inside the
    k-chain (halve the serial dependency depth)."""
    n, l, c = s_ref.shape
    wt = out_ref.shape[2]
    w0 = pl.program_id(1) * wt
    t8 = x8_ref.shape[1]
    for k in range(CK):
        x8_ref[k] = x_ref[0, pl.ds(w0 + k, t8), :]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_body(ci, _):
        base = ci * CK
        sch = s_ref[:, pl.ds(base, CK), :]
        p1 = jnp.zeros((n, wt, c), jnp.float32)
        p2 = jnp.zeros((n, wt, c), jnp.float32)
        for k in range(0, CK, 2):
            xs1 = x8_ref[k, pl.ds(base, wt), :]
            xs2 = x8_ref[k + 1, pl.ds(base, wt), :]
            p1 = p1 + jnp.abs(xs1[None] - sch[:, k: k + 1, :])
            p2 = p2 + jnp.abs(xs2[None] - sch[:, k + 1: k + 2, :])
        acc_ref[:] += (p1 + p2)
        return 0

    if l >= CK:
        jax.lax.fori_loop(0, l // CK, chunk_body, 0)
    tail0 = l - l % CK
    if l % CK:
        tail = jnp.zeros((n, wt, c), jnp.float32)
        for li in range(tail0, l):
            xs = x8_ref[li - tail0, pl.ds(tail0, wt), :]
            tail = tail + jnp.abs(xs[None] - s_ref[:, li: li + 1, :])
        acc_ref[:] += tail
    out_ref[0] = acc_ref[:] * (1.0 / l)


def fwd_v5(x, s):
    b, c, t = x.shape
    n, _, l = s.shape
    w = t - l + 1
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    from sie_tpu.ops.pallas.shapelet_pallas import _padded_x
    xt = _padded_x(x, wt, 1, l)
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)
    t_pad = xt.shape[1]
    out = pl.pallas_call(
        _fwd_kernel_v5,
        out_shape=jax.ShapeDtypeStruct((b, n, w, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CK, l + wt + CK, c), jnp.float32),
            pltpu.VMEM((n, wt, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, st)
    return jnp.swapaxes(out, 2, 3)


def banks(rng):
    lengths = [max(3, int(np.ceil(f * SEQ_LEN))) for f in FRACS]
    return [jnp.asarray(rng.normal(size=(NSH, ENC_IN, L)).astype(np.float32))
            for L in lengths]


def sync(v):
    float(jax.device_get(jax.tree.leaves(v)[0].reshape(-1)[0]))


def main():
    variant = sys.argv[1]
    bank_i = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, ENC_IN, SEQ_LEN)).astype(np.float32))
    bs = banks(rng)
    sel = bs if bank_i < 0 else [bs[bank_i]]

    if variant in ("v1", "v4", "v5"):
        if variant == "v1":
            from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance
            f = lambda x, s: l1_sliding_distance(x, s, 1)
        elif variant == "v5":
            f = fwd_v5
        else:
            f = fwd_v4

        @jax.jit
        def run(carry):
            x, sel = carry
            tot = 0.0
            for s in sel:
                tot = tot + jnp.mean(f(x, s))
            return (x + tot * 1e-12, sel)

        state = run((x, sel))
        sync(state)
        # correctness check vs scan
        from sie_tpu.ops.shapelet import _l1_distance
        want = _l1_distance(x[:2], sel[0][:, :, :], 1)
        got = f(x[:2], sel[0])
        err = float(jnp.max(jnp.abs(want - got)))
        t0 = time.perf_counter()
        for _ in range(iters):
            state = run(state)
        sync(state)
        dt = (time.perf_counter() - t0) / iters
        flops = sum(3 * BATCH * NSH * ENC_IN * (SEQ_LEN - s.shape[-1] + 1)
                    * s.shape[-1] for s in sel)
        print(f"{variant} bank={bank_i}: {dt * 1e3:.2f} ms "
              f"({flops / dt / 1e12:.2f} TFLOP/s)  maxerr={err:.2e}")
    else:
        raise SystemExit(f"unknown variant {variant}")


if __name__ == "__main__":
    main()
