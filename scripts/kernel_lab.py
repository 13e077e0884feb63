#!/usr/bin/env python
"""Kernel experiment lab — forward-variant A/B measurements on the chip.

Usage: python scripts/kernel_lab.py <variant> [bank_index|-1=all6] [iters]
Forward variants (timed fwd-only, correctness vs the scan reference):
  v1       library kernel (baseline)
  v4       pre-shifted aligned x copies, round-1 (n, WT, C) part-chain
  v5       v4 + dual partial accumulators in the k-chain
  v6       register-tiled window subtiles (V6_WS env knob)
Backward variants (timed bwd-only with a fixed dense upstream gradient,
correctness vs the scan VJP — expect a small relerr from exact-f32-tie
semantics, identical between v1bwd and v6bwd):
  v1bwd    library backward
  v6bwd    register-tiled l-subtiles (V6_LS env knob)
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


# ----------------------------------------------- v6: register-tiled windows
# Hypothesis: in the library kernel the (n, WT, C) part-chain makes Mosaic
# iterate n outermost over vregs, so the xs window slice is re-read from VMEM
# once PER SHAPELET (~1.1 loads/element — the dominant non-ALU term in the
# roofline). Fix: shrink the window tile to WS (register-resident: n separate
# (WS, C) accumulators as SSA values), loop l in fori with 8-tap unroll; xs is
# then ONE SSA value reused by all n accumulators.

V6_WS = int(os.environ.get("V6_WS", "16"))


def _fwd_kernel_v6(x_ref, s_ref, out_ref, x8_ref):
    # x_ref: (1, T_pad, C) @ (i, 0, 0) — same block across all j (fetched once
    # per batch row); s_ref: (n, L, C); out_ref: (1, n, WS, C) @ (i, 0, j, 0)
    # x8_ref: persistent scratch (8, T8, C), filled once per batch row (j==0).
    n, l, c = s_ref.shape
    ws = out_ref.shape[2]
    j = pl.program_id(1)
    t8 = x8_ref.shape[1]

    @pl.when(j == 0)
    def _():
        for k in range(CK):
            x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    ws0 = j * ws

    def chunk_body(ci, accs):
        base = ci * CK
        sch = s_ref[:, pl.ds(base, CK), :]                 # (n, CK, C)
        for k in range(CK):
            xs = x8_ref[k, pl.ds(ws0 + base, ws), :]       # aligned (WS%8==0)
            accs = tuple(a + jnp.abs(xs - sch[ni, k]) for ni, a in enumerate(accs))
        return accs

    accs = tuple(jnp.zeros((ws, c), jnp.float32) for _ in range(n))
    if l >= CK:
        accs = jax.lax.fori_loop(0, l // CK, chunk_body, accs)
    tail0 = l - l % CK
    for li in range(tail0, l):
        k = li - tail0
        xs = x8_ref[k, pl.ds(ws0 + tail0, ws), :]
        accs = tuple(a + jnp.abs(xs - s_ref[ni, li]) for ni, a in enumerate(accs))
    out_ref[0] = jnp.stack(accs) * (1.0 / l)


def fwd_v6(x, s):
    b, c, t = x.shape
    n, _, l = s.shape
    w = t - l + 1
    ws = V6_WS
    nws = -(-w // ws)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)          # (B, T, C)
    t8 = nws * ws + l + CK
    xp = jnp.pad(xt, ((0, 0), (0, t8 + CK - t), (0, 0)))
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)
    out = pl.pallas_call(
        _fwd_kernel_v6,
        out_shape=jax.ShapeDtypeStruct((b, n, w, c), jnp.float32),
        grid=(b, nws),
        in_specs=[
            pl.BlockSpec((1, t8 + CK, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, ws, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CK, t8, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c + n * l * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, st)
    return jnp.swapaxes(out, 2, 3)


# -------------------------------------- v7: K window-subtiles per program
# Short banks are grid-overhead dominated (bank0 L=43: 2176 programs of ~1 us
# compute each). v7 keeps the v6 register tiling but amortizes per-program
# cost over K subtiles (grid shrinks by K).

V7_K = int(os.environ.get("V7_K", "8"))


def _fwd_kernel_v7(x_ref, s_ref, out_ref, x8_ref):
    n, l, c = s_ref.shape
    kws = out_ref.shape[2]
    ws = kws // V7_K
    j = pl.program_id(1)
    t8 = x8_ref.shape[1]

    @pl.when(j == 0)
    def _():
        for k in range(CK):
            x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    def sub_body(ki, _):
        ws0 = j * kws + ki * ws

        def chunk_body(ci, accs):
            base = ci * CK
            sch = s_ref[:, pl.ds(base, CK), :]
            for k in range(CK):
                xs = x8_ref[k, pl.ds(ws0 + base, ws), :]
                accs = tuple(a + jnp.abs(xs - sch[ni, k])
                             for ni, a in enumerate(accs))
            return accs

        accs = tuple(jnp.zeros((ws, c), jnp.float32) for _ in range(n))
        if l <= int(os.environ.get("V7_UNROLL", "96")):
            # static full-tap unroll: a 5-trip fori leaves pipeline bubbles
            for ci in range(l // CK):
                accs = chunk_body(ci, accs)
        elif l >= CK:
            accs = jax.lax.fori_loop(0, l // CK, chunk_body, accs)
        tail0 = l - l % CK
        for li in range(tail0, l):
            k = li - tail0
            xs = x8_ref[k, pl.ds(ws0 + tail0, ws), :]
            accs = tuple(a + jnp.abs(xs - s_ref[ni, li])
                         for ni, a in enumerate(accs))
        out_ref[0, :, pl.ds(ki * ws, ws), :] = jnp.stack(accs) * (1.0 / l)
        return 0

    jax.lax.fori_loop(0, V7_K, sub_body, 0)


def fwd_v7(x, s):
    b, c, t = x.shape
    n, _, l = s.shape
    w = t - l + 1
    ws = V6_WS
    kws = ws * V7_K
    nj = -(-w // kws)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    t8 = nj * kws + l + CK
    xp = jnp.pad(xt, ((0, 0), (0, t8 + CK - t), (0, 0)))
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)
    out = pl.pallas_call(
        _fwd_kernel_v7,
        out_shape=jax.ShapeDtypeStruct((b, n, w, c), jnp.float32),
        grid=(b, nj),
        in_specs=[
            pl.BlockSpec((1, t8 + CK, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, kws, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CK, t8, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, st)
    return jnp.swapaxes(out, 2, 3)


# ----------------------------------------------- v6 backward: register-tiled
# ds[n,l,c] = (1/L) sum_{b,w} select(s[n,l,c] > x[b,c,w+l], g, -g)[b,n,c,w]
# Same register-tiling idea with (l <-> w) roles swapped: accumulators over an
# (LS, C) l-subtile per shapelet (registers), loop windows in 8-chunks; the
# s-subtile is loop-invariant over windows (live-in regs), g broadcasts per
# (window, shapelet) amortize over LS/8 accumulator vregs.

V6_LS = int(os.environ.get("V6_LS", "16"))


def _bwd_kernel_v6(x_ref, s_ref, g_ref, out_ref, x8_ref, *, w_total: int):
    n, l_pad, c = s_ref.shape
    wt = g_ref.shape[2]
    ls = V6_LS
    b = pl.program_id(0)
    j = pl.program_id(1)
    w0 = j * wt
    t8 = x8_ref.shape[1]
    for k in range(CK):
        x8_ref[k] = x_ref[0, pl.ds(w0 + k, t8), :]

    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def sub_body(li, _):
        l0 = li * ls
        s_tile = [s_ref[ni, pl.ds(l0, ls), :] for ni in range(n)]  # live-ins

        def chunk_body(wi, accs):
            wb = wi * CK
            gch = g_ref[0, :, pl.ds(wb, CK), :]                # (n, CK, C)
            for k in range(CK):
                gk = jnp.where(w0 + wb + k < w_total, gch[:, k], 0.0)  # (n, C)
                xs = x8_ref[k, pl.ds(l0 + wb, ls), :]          # aligned
                accs = tuple(
                    a + jnp.where(s_tile[ni] > xs, gk[ni], -gk[ni])
                    for ni, a in enumerate(accs))
            return accs

        accs = tuple(jnp.zeros((ls, c), jnp.float32) for _ in range(n))
        accs = jax.lax.fori_loop(0, wt // CK, chunk_body, accs)
        cur = out_ref[:, pl.ds(l0, ls), :]
        out_ref[:, pl.ds(l0, ls), :] = cur + jnp.stack(accs)
        return 0

    jax.lax.fori_loop(0, l_pad // ls, sub_body, 0)


def bwd_v6(x, s, g):
    """g: (B, n, C, W) upstream grad -> grad_s (n, C, L)."""
    b, c, t = x.shape
    n, _, l = s.shape
    w = g.shape[-1]
    ls = V6_LS
    l_pad = -(-l // ls) * ls
    from sie_tpu.ops.pallas.shapelet_pallas import _window_tile
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    t8 = wt + l_pad + CK
    xp = jnp.pad(xt, ((0, 0), (0, nwt * wt + l_pad + 2 * CK - t), (0, 0)))
    st = jnp.pad(jnp.swapaxes(s.astype(jnp.float32), 1, 2),
                 ((0, 0), (0, l_pad - l), (0, 0)))
    gt = jnp.swapaxes(g.astype(jnp.float32), 2, 3) * (1.0 / l)  # (B,n,W,C)
    grad = pl.pallas_call(
        functools.partial(_bwd_kernel_v6, w_total=w),
        out_shape=jax.ShapeDtypeStruct((n, l_pad, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CK, t8, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c + n * l_pad * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, st, gt)
    return jnp.swapaxes(grad[:, :l, :], 1, 2)


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
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    variant = sys.argv[1]
    bank_i = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, ENC_IN, SEQ_LEN)).astype(np.float32))
    bs = banks(rng)
    sel = bs if bank_i < 0 else [bs[bank_i]]

    if variant in ("v1", "v4", "v5", "v6", "v7"):
        if variant == "v1":
            from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance
            f = lambda x, s: l1_sliding_distance(x, s, 1)
        elif variant == "v5":
            f = fwd_v5
        elif variant == "v6":
            f = fwd_v6
        elif variant == "v7":
            f = fwd_v7
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
    elif variant in ("v1bwd", "v6bwd"):
        # backward-only timing with a fixed dense upstream gradient
        from sie_tpu.ops.pallas import shapelet_pallas as sp

        if variant == "v1bwd":
            f = lambda x, s, g: sp._l1_bwd_rule(1, False, (x, s), g)[1]
        else:
            f = bwd_v6

        gs = [jnp.asarray(rng.normal(
                size=(BATCH, NSH, ENC_IN, SEQ_LEN - s.shape[-1] + 1)
              ).astype(np.float32)) for s in sel]

        @jax.jit
        def run(carry):
            sel, gs = carry
            outs = [f(x, s, g) for s, g in zip(sel, gs)]
            return ([s + o * 1e-20 for s, o in zip(sel, outs)], gs)

        state = run((sel, gs))
        sync(state)
        # correctness vs the scan-path VJP
        from sie_tpu.ops.shapelet import _l1_distance
        _, vjp = jax.vjp(lambda s: _l1_distance(x[:2], s, 1), sel[0])
        want = vjp(gs[0][:2])[0]
        got = f(x[:2], sel[0], gs[0][:2])
        err = float(jnp.max(jnp.abs(want - got)) / jnp.max(jnp.abs(want)))
        t0 = time.perf_counter()
        for _ in range(iters):
            state = run(state)
        sync(state)
        dt = (time.perf_counter() - t0) / iters
        flops = sum(4 * BATCH * NSH * ENC_IN * (SEQ_LEN - s.shape[-1] + 1)
                    * s.shape[-1] for s in sel)
        print(f"{variant} bank={bank_i}: {dt * 1e3:.2f} ms "
              f"({flops / dt / 1e12:.2f} TFLOP/s)  relerr={err:.2e}")
    else:
        raise SystemExit(f"unknown variant {variant}")


if __name__ == "__main__":
    main()
