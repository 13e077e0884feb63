"""Pallas TPU kernel for the L1 (mean-absolute) sliding shapelet distance —
the hot op of the whole framework (SURVEY.md SS3.3: the reference's
(B, W, n, C, L) broadcast at model/Shapelet.py:61-74).

d[b, n, c, w] = (1/L) * sum_l |x[b, c, w*stride + l] - s[n, c, l]|

Design:
- grid (batch, window-tiles); each program holds one series row, the whole
  shapelet bank, and an (n, WT, C) output tile in VMEM — zero HBM traffic for
  intermediates (the reference materializes the full 5-D broadcast or falls
  back to a Python window loop).
- channels-last in-kernel layout (T, C) / (n, L, C) / (n, W, C): the dynamic
  offsets of the sliding window land on the SUBLANE axis (Mosaic supports
  dynamic sublane slices; dynamic lane slices it does not), and the channel
  axis sits on vector lanes (122 -> one 128-lane tile).
- x is padded host-side by one window-tile span so every pl.ds read is
  in-bounds even for the zero-padded tail tile; tail writes are masked by
  Pallas automatically, tail gradient contributions are masked explicitly.
- forward: fori over l; each step is a fully-vectorized (n, WT, C) VPU op.
- backward (custom VJP): fori over the tile's windows; accumulates the
  (n, L, C) shapelet-gradient tile in place — no strided stores. grad_x is
  zero by contract (parity with the reference's memory-efficient autograd,
  Shapelet.py:40; the input is always instance-normalized data).
- grad_s accumulation exploits the sequential TPU grid: every program adds
  into the same output block, initialized by the first program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TILE_ELEMS = 1280 * 1024  # per-buffer cap (n * WT * C floats) ~ 5 MB


def _window_tile(n: int, c: int, w: int) -> int:
    """Window-tile size: fits the VMEM budget AND balances the tiles so the
    padded tail is minimal (an unbalanced split wastes up to ~40% compute)."""
    wt_max = max(16, _MAX_TILE_ELEMS // max(n * c, 1))
    n_tiles = -(-w // wt_max)
    wt = -(-w // n_tiles)
    return -(-wt // _TAPS) * _TAPS  # bwd chunks the tile by _TAPS windows


_L_CHUNK = 8    # sublane modulus: number of shifted copies
_TAPS = 8       # taps unrolled per fori iteration. Any tap is reachable from
# the 8 copies (x8[li % 8] at aligned offset 8*(li//8)); 16 taps/iteration
# measured WORSE (fwd 72.8 vs 69.3 ms, fwd+bwd 156 vs 152 — register
# pressure beats the halved accumulator RMW), so 8 it is.


def _fill_shifted(x_ref, x8_ref, start, t8):
    """x8[k] = x[start + k : start + k + t8] for k in 0..7 — ONE unaligned
    read per k, done once per program. Every subsequent window read hits x8 at
    a sublane-ALIGNED offset; the per-k unaligned sublane loads in the inner
    loop measured ~24% of forward kernel time (BENCH_NOTES r2)."""
    for k in range(_L_CHUNK):
        x8_ref[k] = x_ref[0, pl.ds(start + k, t8), :]


def _fwd_kernel(x_ref, s_ref, out_ref, x8_ref, acc_ref, *, stride: int):
    # x_ref: (1, T_pad, C); s_ref: (n, L, C); out_ref: (1, n, WT, C)
    # x8_ref: VMEM scratch (8, T8, C) of sublane-shifted x copies
    # acc_ref: VMEM scratch (n, WT, C) — accumulating into a scratch ref with
    # per-chunk register partials measured ~25% faster than carrying the big
    # accumulator through fori_loop (the carry spills/reloads every iteration).
    n, l, c = s_ref.shape
    wt = out_ref.shape[2]
    w0 = pl.program_id(1) * wt
    ck = _TAPS
    t8 = x8_ref.shape[1]
    _fill_shifted(x_ref, x8_ref, w0 * stride, t8)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    span = (wt - 1) * stride + 1

    def chunk_body(ci, _):
        base = ci * ck
        sch = s_ref[:, pl.ds(base, ck), :]                # (n, ck, C)
        part = jnp.zeros((n, wt, c), jnp.float32)
        for k in range(ck):
            # tap base+k == x8[k % 8] at aligned offset base + 8*(k//8)
            xs = x8_ref[k % _L_CHUNK,
                        pl.ds(base + (k // _L_CHUNK) * _L_CHUNK, span), :]
            if stride > 1:
                xs = xs[::stride, :]
            part = part + jnp.abs(xs[None, :, :] - sch[:, k: k + 1, :])
        acc_ref[:] += part
        return 0

    if l >= ck:
        jax.lax.fori_loop(0, l // ck, chunk_body, 0)
    # static tail (L % chunk iterations)
    tail = jnp.zeros((n, wt, c), jnp.float32)
    base0 = l - l % ck
    for li in range(base0, l):
        k = li - base0
        xs = x8_ref[k % _L_CHUNK,
                    pl.ds(base0 + (k // _L_CHUNK) * _L_CHUNK, span), :]
        if stride > 1:
            xs = xs[::stride, :]
        tail = tail + jnp.abs(xs[None, :, :] - s_ref[:, li: li + 1, :])
    if l % ck:
        acc_ref[:] += tail
    out_ref[0] = acc_ref[:] * (1.0 / l)


def _bwd_kernel(x_ref, s_ref, g_ref, out_ref, x8_ref, *,
                stride: int, w_total: int):
    # x_ref: (1, T_pad, C); s_ref: (n, L, C); g_ref: (1, n, WT, C)
    # out_ref: (n, L, C) — shared accumulator across the whole grid
    # x8_ref: VMEM scratch (8, T8, C) of stride-shifted x copies so every
    # per-window read of (L, C) is sublane-aligned (see _fill_shifted).
    n, l, c = s_ref.shape
    wt = g_ref.shape[2]
    b = pl.program_id(0)
    j = pl.program_id(1)
    w0 = j * wt
    s = s_ref[:]
    t8 = x8_ref.shape[1]
    # x8[k] starts at x[(w0 + k)*stride]: window w0+wbase+k reads
    # x8[k, wbase*stride : +l] with wbase*stride a multiple of 8 for stride 1.
    for k in range(_L_CHUNK):
        x8_ref[k] = x_ref[0, pl.ds((w0 + k) * stride, t8), :]

    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ck = _TAPS
    inv_l = 1.0 / l

    def chunk_body(ci, _):
        wbase = ci * ck
        gch = g_ref[0, :, pl.ds(wbase, ck), :]            # (n, ck, C)
        part = jnp.zeros((n, l, c), jnp.float32)
        for k in range(ck):
            # window w0+wbase+k == x8[k % 8] at offset (wbase + 8*(k//8))*s
            xs = x8_ref[k % _L_CHUNK,
                        pl.ds((wbase + (k // _L_CHUNK) * _L_CHUNK) * stride,
                              l), :]                      # aligned (stride 1)
            gw = gch[:, k: k + 1, :]
            gw = jnp.where(w0 + wbase + k < w_total, gw, 0.0)
            # d|s-x|/ds * g == select(s > x, g, -g); exact ties contribute g
            # instead of sign's 0 — measure-zero for continuous data, and the
            # reference's own two autograd paths already disagree there.
            # (copysign(g, s-x) is WRONG — it drops g's own sign — and
            # measured slower anyway: 180.6 vs 151.8 ms fwd+bwd.)
            part = part + jnp.where(s > xs[None, :, :], gw, -gw)
        out_ref[:] += part * inv_l   # grid-shared accumulator (see docstring)
        return 0

    # wt is a multiple of _L_CHUNK (see _window_tile: rounded to 8)
    jax.lax.fori_loop(0, wt // ck, chunk_body, 0)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def l1_sliding_distance(x: jax.Array, s: jax.Array, stride: int = 1,
                        interpret: bool | None = None) -> jax.Array:
    """x (B, C, T), s (n, C, L) -> d (B, n, C, W) float32."""
    return _l1_fwd(x, s, stride, interpret)


def _padded_x(x: jax.Array, wt: int, stride: int, l: int) -> jax.Array:
    """(B, C, T) -> channels-last (B, T_pad, C) with enough tail padding that
    every shifted-copy fill of the padded tail tile stays in bounds."""
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    pad = wt * stride + l + 5 * _L_CHUNK
    return jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))


def _l1_fwd(x, s, stride, interpret):
    if interpret is None:
        interpret = _interpret_default()
    if stride != 1 and not interpret:
        raise NotImplementedError(
            "compiled Pallas path is stride-1 only (Mosaic cannot lower the "
            "strided value slice); sie_tpu.ops.shapelet.sliding_distance "
            "routes stride>1 to the scan implementation")
    b, c, t = x.shape
    n, _, l = s.shape
    w = (t - l) // stride + 1
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    xt = _padded_x(x, wt, stride, l)
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)       # (n, L, C)
    t_pad = xt.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, stride=stride),
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
            pltpu.VMEM((_L_CHUNK, l + (wt - 1) * stride + 1 + 3 * _L_CHUNK, c),
                       jnp.float32),
            pltpu.VMEM((n, wt, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c + n * l * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, st)
    return jnp.swapaxes(out, 2, 3)                       # (B, n, C, W)


def _l1_fwd_rule(x, s, stride, interpret):
    return _l1_fwd(x, s, stride, interpret), (x, s)


def _l1_bwd_rule(stride, interpret, res, g):
    x, s = res
    if interpret is None:
        interpret = _interpret_default()
    b, c, t = x.shape
    n, _, l = s.shape
    w = g.shape[-1]
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    xt = _padded_x(x, wt, stride, l)
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)       # (n, L, C)
    gt = jnp.swapaxes(g.astype(jnp.float32), 2, 3)       # (B, n, W, C)
    t_pad = xt.shape[1]
    grad_st = pl.pallas_call(
        functools.partial(_bwd_kernel, stride=stride, w_total=w),
        out_shape=jax.ShapeDtypeStruct((n, l, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_L_CHUNK, (wt - _L_CHUNK) * stride + l + 3 * _L_CHUNK,
                        c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c + n * l * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, st, gt)
    grad_s = jnp.swapaxes(grad_st, 1, 2).astype(s.dtype)
    return jnp.zeros_like(x), grad_s


l1_sliding_distance.defvjp(_l1_fwd_rule, _l1_bwd_rule)
