"""Pallas TPU kernel for the sliding shapelet distance — the hot op of the
whole framework (SURVEY.md SS3.3: the reference's (B, W, n, C, L) broadcast at
model/Shapelet.py:61-74). Two metrics share the kernel (static `metric` switch;
identical memory movement, only the per-tap VPU op differs):

  'euclidean'   d = (1/L) * sum_l |x[b, c, w*stride + l] - s[n, c, l]|
                (reference default path, Shapelet.py:74)
  'sqeuclidean' d = (1/L) * sum_l (x[...] - s[...])^2
                (reference memory-efficient path, Shapelet.py:27-28; backward
                is (2/L)*g*(s-x), the 2/L folded into g host-side like 1/L.
                The r5 on-chip measurement of the conv decomposition
                [x2 - 2xs + s2 via feature_group_count=C depthwise convs,
                ops/shapelet.py] was 1052 ms for the SBM step vs this
                kernel's ~93 ms: degenerate per-channel convs never tile
                onto the MXU, so the VPU kernel wins ~11x.)

Design (round-2 "register-tiled" formulation — 1.7x over the round-1 tiled
kernels, ~4.1 TFLOP/s effective fp32 = the VPU ALU roofline for the
3-op/element |sub|+abs+add chain):
- channels-last in-kernel layout (T, C) / (n, L, C) / (n, W, C): the dynamic
  offsets of the sliding window land on the SUBLANE axis (Mosaic supports
  dynamic sublane slices; dynamic lane slices it does not), and the channel
  axis sits on vector lanes (122 -> one 128-lane tile).
- 8 sublane-shifted copies of the series row in VMEM scratch (filled once per
  batch row) make every inner-loop window read sublane-ALIGNED.
- forward: grid (batch, W/WS) with a SMALL window subtile WS so the n
  per-shapelet (WS, C) accumulators live in vector REGISTERS (explicit SSA
  values, fori carry). The x window slice is then loaded once and reused by
  all n shapelets; the round-1 formulation's (n, WT, C) part-chain re-read it
  once per shapelet (~1.1 VMEM loads/element — the dominant non-ALU term).
- backward (custom VJP): same idea with the (l <-> w) roles swapped — grid
  (batch, window-tiles), register accumulators over an (LS, C) l-subtile per
  shapelet, windows walked in 8-chunks; the s-subtile is loop-invariant over
  windows and the g broadcast amortizes over LS/8 accumulator vregs. The
  (n, L, C) gradient output block has a constant index map, so it stays
  VMEM-resident across the whole sequential grid and every program adds into
  it (initialized by the first program). grad_x is zero by contract (parity
  with the reference's memory-efficient autograd, Shapelet.py:40; the input
  is always instance-normalized data).
- x is padded host-side so every pl.ds read is in-bounds even for the
  zero-padded tail tile; tail output writes are masked by Pallas
  automatically, tail gradient contributions are masked explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TILE_ELEMS = 1280 * 1024  # per-buffer cap (n * WT * C floats) ~ 5 MB


def _window_tile(n: int, c: int, w: int) -> int:
    """Backward grid window-tile size: fits the g-block VMEM budget AND
    balances the tiles so the padded tail is minimal (an unbalanced split
    wastes up to ~40% compute)."""
    wt_max = max(16, _MAX_TILE_ELEMS // max(n * c, 1))
    n_tiles = -(-w // wt_max)
    wt = -(-w // n_tiles)
    return -(-wt // _TAPS) * _TAPS  # bwd chunks the tile by _TAPS windows


_L_CHUNK = 8    # sublane modulus: number of shifted copies
_TAPS = 8       # taps/windows unrolled per fori iteration (any tap is
# reachable from the 8 copies: x8[li % 8] at aligned offset 8*(li//8))


def _fwd_ws(n: int, c: int) -> int:
    """Forward register window-subtile: n * (WS/8) * ceil(C/128) accumulator
    vregs must fit the register file, so the subtile shrinks with both the
    shapelet count and the lane-tile count (PEMS-SF C=963 or num_shapelet=32
    would otherwise spill 3-8x the vregs). ~30 acc vregs measured best at the
    CHISCO config n=10, C=122 -> WS=24 (16: 39.1, 24: 37.3, 32: 38.0,
    48: 39.1, 64: 41.5 ms for the 6-bank fwd)."""
    lanes = -(-max(c, 1) // 128)
    ws = 8 * max(1, 30 // max(n * lanes, 1))
    return max(8, min(ws, 48))


def _bwd_ls_max(n: int, c: int) -> int:
    """Backward register l-subtile cap (same budget logic; ~40 acc vregs
    measured best at n=10, C=122 -> LS=32: 8: 19.8, 16: 13.8, 32: 13.7,
    64: 14.8 ms on the L=254 bank)."""
    lanes = -(-max(c, 1) // 128)
    ls = 8 * max(1, 40 // max(n * lanes, 1))
    return max(8, min(ls, 48))


def _bwd_l_split(n: int, c: int, l: int) -> tuple[int, int]:
    """(ls, l_pad) for the backward l-subtile loop: BALANCED like
    _window_tile, so L just above a subtile multiple doesn't waste up to
    ~50% of the bank's backward on zero-padded taps (L=43 with a fixed
    ls=32 would pad to 64: 33% garbage; balanced -> ls=24, l_pad=48)."""
    l8 = -(-l // _L_CHUNK) * _L_CHUNK
    n_sub = -(-l8 // _bwd_ls_max(n, c))
    ls = _L_CHUNK * (-(-l8 // (_L_CHUNK * n_sub)))
    return ls, n_sub * ls


def _tap_op(metric: str):
    """Static per-tap accumulate op (the ONLY compute difference between
    the metrics; all indexing/layout/tiling is shared)."""
    return jnp.abs if metric == "euclidean" else jnp.square


def _fwd_kernel(x_ref, s_ref, out_ref, x8_ref, *, stride: int,
                metric: str = "euclidean"):
    # x_ref: (1, T_pad, C) @ (i, 0, 0) — same block for every j, fetched once
    # per batch row; s_ref: (n, L, C); out_ref: (1, n, WS, C) @ (i, 0, j, 0).
    # x8_ref: persistent VMEM scratch (8, T8, C) of sublane-shifted x copies,
    # filled once per batch row (j == 0; the TPU grid runs j innermost) — one
    # unaligned pass so every inner-loop window read is sublane-ALIGNED.
    n, l, c = s_ref.shape
    ws = out_ref.shape[2]
    j = pl.program_id(1)
    t8 = x8_ref.shape[1]
    ck = _TAPS
    op = _tap_op(metric)

    if stride == 1:
        @pl.when(j == 0)
        def _():
            for k in range(_L_CHUNK):
                x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    ws0 = j * ws

    def chunk_body(ci, accs):
        base = ci * ck
        sch = s_ref[:, pl.ds(base, ck), :]                 # (n, ck, C)
        for k in range(ck):
            if stride == 1:
                xs = x8_ref[k, pl.ds(ws0 + base, ws), :]   # aligned
            else:  # interpret-only (compiled path is stride-1, see _l1_fwd)
                span = (ws - 1) * stride + 1
                xs = x_ref[0, pl.ds(ws0 * stride + base + k, span), :][::stride]
            accs = tuple(a + op(xs - sch[ni, k])
                         for ni, a in enumerate(accs))
        return accs

    accs = tuple(jnp.zeros((ws, c), jnp.float32) for _ in range(n))
    if l >= ck:
        accs = jax.lax.fori_loop(0, l // ck, chunk_body, accs)
    # static tail (L % chunk taps)
    base0 = l - l % ck
    for li in range(base0, l):
        k = li - base0
        if stride == 1:
            xs = x8_ref[k, pl.ds(ws0 + base0, ws), :]
        else:
            span = (ws - 1) * stride + 1
            xs = x_ref[0, pl.ds(ws0 * stride + li, span), :][::stride]
        accs = tuple(a + op(xs - s_ref[ni, li])
                     for ni, a in enumerate(accs))
    out_ref[0] = jnp.stack(accs) * (1.0 / l)


def _bwd_kernel(x_ref, s_ref, g_ref, out_ref, x8_ref, *,
                stride: int, w_total: int, ls: int,
                metric: str = "euclidean"):
    # x_ref: (1, T_pad, C); s_ref: (n, L_pad, C); g_ref: (1, n, WT, C);
    # out_ref: (n, L_pad, C) — constant index map, so the block stays
    # VMEM-resident across the whole sequential grid and every program adds
    # into it. x8_ref: VMEM scratch (8, T8, C) of shifted x copies so every
    # per-window read of an (LS, C) l-subtile is sublane-aligned.
    # The 1/L normalization is folded into g host-side (_l1_bwd_impl).
    n, l_pad, c = s_ref.shape
    wt = g_ref.shape[2]
    b = pl.program_id(0)
    j = pl.program_id(1)
    w0 = j * wt
    t8 = x8_ref.shape[1]
    ck = _TAPS

    if stride == 1:
        # STATIC-offset fill of the whole padded series, once per batch row
        # (j == 0; j runs innermost). A w0-shifted per-program fill
        # (pl.ds(w0 + k, t8)) crashes the Mosaic compiler whenever C spans
        # more than one 128-lane tile (FaceDetection C=144, PEMS-SF 963,
        # DuckDuckGeese 1345 — found by the r3 shape sweep; bisected to the
        # dynamic-offset multi-lane sublane copy, scripts/uea_shape_sweep.py).
        # Window reads below add w0 instead — dynamic READS at multi-lane C
        # compile fine (the forward kernel always did exactly that).
        @pl.when(j == 0)
        def _():
            for k in range(_L_CHUNK):
                x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def sub_body(li, _):
        l0 = li * ls
        # loop-invariant over windows: live-in register values
        s_tile = [s_ref[ni, pl.ds(l0, ls), :] for ni in range(n)]

        def chunk_body(wi, accs):
            wb = wi * ck
            gch = g_ref[0, :, pl.ds(wb, ck), :]            # (n, ck, C)
            for k in range(ck):
                # d|s-x|/ds * g == select(s > x, g, -g); exact ties give g
                # instead of sign's 0 — measure-zero for continuous data, and
                # the reference's own two autograd paths already disagree
                # there. (copysign(g, s-x) is WRONG — it drops g's own sign —
                # and measured slower anyway.)
                gk = jnp.where(w0 + wb + k < w_total, gch[:, k], 0.0)
                if stride == 1:
                    # aligned: w0, l0, wb all multiples of 8
                    xs = x8_ref[k, pl.ds(w0 + l0 + wb, ls), :]
                else:  # interpret-only (compiled path is stride-1)
                    xs = x_ref[0, pl.ds((w0 + wb + k) * stride + l0, ls), :]
                if metric == "sqeuclidean":
                    # d(s-x)^2/ds * g == 2(s-x)g; the 2/L is folded into g
                    # host-side (_l1_bwd_impl) like the L1 path's 1/L
                    accs = tuple(a + (s_tile[ni] - xs) * gk[ni]
                                 for ni, a in enumerate(accs))
                else:
                    accs = tuple(
                        a + jnp.where(s_tile[ni] > xs, gk[ni], -gk[ni])
                        for ni, a in enumerate(accs))
            return accs

        accs = tuple(jnp.zeros((ls, c), jnp.float32) for _ in range(n))
        # wt is a multiple of _TAPS (see _window_tile: rounded to 8)
        accs = jax.lax.fori_loop(0, wt // ck, chunk_body, accs)
        out_ref[:, pl.ds(l0, ls), :] += jnp.stack(accs)
        return 0

    jax.lax.fori_loop(0, l_pad // ls, sub_body, 0)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# GSPMD integration (VERDICT r2 item 5): a pallas_call is an opaque custom
# call that GSPMD would replicate with all-gathered inputs. custom_partitioning
# teaches the partitioner the op's parallel structure instead — batch rows
# ('B') and shapelet rows ('n') are embarrassingly parallel; T/L/W/C must be
# replicated (windows span T; C sits on vector lanes). The backward op's 'B'
# is a REDUCTION factor: each data shard computes a partial ds and lower_fn
# psums over the batch mesh axes (Shardy does NOT insert that all-reduce for
# a partition callback — verified empirically: omitting it gives per-shard
# partial grads). This replaces the Trainer-set contextvar + explicit
# shard_map region that round 2 used (`_mesh_aware_distance`, deleted).
# --------------------------------------------------------------------------

def _dim_axes(spec, dim):
    """Mesh axis names a PartitionSpec shards dimension `dim` over."""
    if spec is None or len(spec) <= dim or spec[dim] is None:
        return ()
    ax = spec[dim]
    return tuple(ax) if isinstance(ax, tuple) else (ax,)


@functools.lru_cache(maxsize=None)
def _fwd_cp(stride: int, interpret: bool, metric: str = "euclidean"):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    f = custom_partitioning(
        lambda x, s: _l1_fwd(x, s, stride, interpret, metric))

    def partition(mesh, arg_shapes, result_shape):
        # Returned arg shardings must be ones the LOCAL kernel can honor:
        # keep only the embarrassingly-parallel dims (B of x, n of s) and
        # replicate the rest — with a 'seq' mesh axis the inputs can arrive
        # T-sharded, and echoing that sharding back would hand the kernel a
        # partial time axis (GSPMD all-gathers to whatever we return here).
        xs = arg_shapes[0].sharding.spec
        ss = arg_shapes[1].sharding.spec
        xb = xs[0] if len(xs) else None
        sn = ss[0] if len(ss) else None

        def lower_fn(x, s):
            return _l1_fwd(x, s, stride, interpret, metric)
        return (mesh, lower_fn,
                NamedSharding(mesh, P(xb, sn, None, None)),
                (NamedSharding(mesh, P(xb, None, None)),
                 NamedSharding(mesh, P(sn, None, None))))

    def infer(mesh, arg_shapes, shape):
        xs = arg_shapes[0].sharding.spec
        ss = arg_shapes[1].sharding.spec
        return NamedSharding(mesh, P(xs[0] if len(xs) else None,
                                     ss[0] if len(ss) else None, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="B C T, n C L -> B n C W",
        need_replication_factors=("C", "T", "L", "W"),
    )
    from sie_tpu.ops.pallas.seq_vmap import sequential_vmap
    return sequential_vmap(f)   # vmap (ensemble seed axis) support


@functools.lru_cache(maxsize=None)
def _bwd_cp(stride: int, interpret: bool, metric: str = "euclidean"):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(x, s, g):
        _, grad_s = _l1_bwd_impl(x, s, g, stride, interpret, metric)
        return grad_s

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        # sanitize like the forward: keep B of x / n of s, replicate the
        # rest, and force g onto the SAME (B, n) shardings so the local
        # shards line up; psum the per-data-shard partial grads
        xs = arg_shapes[0].sharding.spec
        ss = arg_shapes[1].sharding.spec
        xb = xs[0] if len(xs) else None
        sn = ss[0] if len(ss) else None
        b_axes = _dim_axes(P(xb), 0)

        def lower_fn(x, s, g):
            grad = impl(x, s, g)
            for ax in b_axes:           # sum the per-data-shard partials
                grad = jax.lax.psum(grad, ax)
            return grad
        return (mesh, lower_fn,
                NamedSharding(mesh, P(sn, None, None)),
                (NamedSharding(mesh, P(xb, None, None)),
                 NamedSharding(mesh, P(sn, None, None)),
                 NamedSharding(mesh, P(xb, sn, None, None))))

    def infer(mesh, arg_shapes, shape):
        ss = arg_shapes[1].sharding.spec
        return NamedSharding(mesh, P(ss[0] if len(ss) else None, None, None))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="B C T, n C L, B n C W -> n C L",
        reduction_factors=("B",),
        need_replication_factors=("C", "T", "L", "W"),
    )
    from sie_tpu.ops.pallas.seq_vmap import sequential_vmap
    return sequential_vmap(f)   # vmap (ensemble seed axis) support


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def l1_sliding_distance(x: jax.Array, s: jax.Array, stride: int = 1,
                        interpret: bool | None = None,
                        metric: str = "euclidean") -> jax.Array:
    """x (B, C, T), s (n, C, L) -> d (B, n, C, W) float32. GSPMD-partitionable
    (custom_partitioning): shard x over B and/or s over n freely. metric
    'euclidean' (mean |diff|, the name predates the sq variant) or
    'sqeuclidean' (mean diff^2, reference memory-efficient semantics)."""
    if interpret is None:
        interpret = _interpret_default()
    return _fwd_cp(stride, interpret, metric)(x, s)


def _padded_x(x: jax.Array, wt: int, stride: int, l: int) -> jax.Array:
    """(B, C, T) -> channels-last (B, T_pad, C) with enough tail padding that
    every shifted-copy fill of the padded tail tile stays in bounds."""
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    pad = wt * stride + l + 5 * _L_CHUNK
    return jnp.pad(xt, ((0, 0), (0, pad), (0, 0)))


def _l1_fwd(x, s, stride, interpret, metric="euclidean"):
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
    ws = _fwd_ws(n, c)
    nws = -(-w // ws)
    t8 = nws * ws + l + _L_CHUNK
    t_pad = max(t8 + _L_CHUNK, nws * ws * stride + l + 2 * _L_CHUNK)
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    xt = jnp.pad(xt, ((0, 0), (0, t_pad - t), (0, 0)))
    st = jnp.swapaxes(s.astype(jnp.float32), 1, 2)       # (n, L, C)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, stride=stride, metric=metric),
        out_shape=jax.ShapeDtypeStruct((b, n, w, c), jnp.float32),
        grid=(b, nws),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, ws, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # stride>1 (interpret-only) never touches the shifted-copy
            # scratch: shrink it to a token allocation instead of 8x the
            # series-row footprint per program (ADVICE r2)
            pltpu.VMEM((_L_CHUNK, t8, c) if stride == 1 else (1, 1, 1),
                       jnp.float32),
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


def _l1_fwd_rule(x, s, stride, interpret, metric="euclidean"):
    if interpret is None:
        interpret = _interpret_default()
    return _fwd_cp(stride, interpret, metric)(x, s), (x, s)


def _l1_bwd_rule(stride, interpret, metric, res, g):
    x, s = res
    if interpret is None:
        interpret = _interpret_default()
    grad_s = _bwd_cp(stride, interpret, metric)(x, s, g)
    return jnp.zeros_like(x), grad_s


def _l1_bwd_impl(x, s, g, stride, interpret, metric="euclidean"):
    b, c, t = x.shape
    n, _, l = s.shape
    w = g.shape[-1]
    ls, l_pad = _bwd_l_split(n, c, l)
    wt = _window_tile(n, c, w)
    nwt = -(-w // wt)
    xt = _padded_x(x, wt, stride, l_pad)
    st = jnp.pad(jnp.swapaxes(s.astype(jnp.float32), 1, 2),
                 ((0, 0), (0, l_pad - l), (0, 0)))       # (n, L_pad, C)
    # 1/L (2/L for the sq metric) folded into g here (XLA fuses it into the
    # transpose pass)
    g_scale = (2.0 if metric == "sqeuclidean" else 1.0) / l
    gt = jnp.swapaxes(g.astype(jnp.float32), 2, 3) * g_scale    # (B, n, W, C)
    t_pad = xt.shape[1]
    # full-series scratch: the static j==0 fill covers every window tile's
    # reads (see _bwd_kernel's multi-lane-C note)
    t8 = nwt * wt * stride + l_pad + _L_CHUNK
    grad_st = pl.pallas_call(
        functools.partial(_bwd_kernel, stride=stride, w_total=w, ls=ls,
                          metric=metric),
        out_shape=jax.ShapeDtypeStruct((n, l_pad, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_L_CHUNK, t8, c) if stride == 1 else (1, 1, 1),
                       jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * w * l,
            bytes_accessed=4 * (b * t * c + n * l_pad * c + b * n * w * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, st, gt)
    grad_s = jnp.swapaxes(grad_st[:, :l, :], 1, 2).astype(s.dtype)
    return jnp.zeros_like(x), grad_s


l1_sliding_distance.defvjp(_l1_fwd_rule, _l1_bwd_rule)


# --------------------------------------------------------------------------
# Grouped (multi-bank) launch: several short banks fused into ONE kernel
# (VERDICT r2 item 3 — reference concatenates per-bank outputs,
# model/Shapelet.py:190-196). Separate launches pay per-launch dispatch AND
# an x8 shifted-copy fill per launch; short banks (L=43/85) amortize neither
# (1.5 TF/s standalone vs 4.16 fused-roofline). One launch shares the fill,
# the window grid, and the x-window loads across all groups' shapelets —
# group-specific tap ranges mean NO wasted distance compute (only the packed
# s buffer is zero-padded to L_max).
# --------------------------------------------------------------------------

def _row_starts(counts):
    starts = [0]
    for n in counts:
        starts.append(starts[-1] + n)
    return starts


def _fwd_kernel_grouped(x_ref, s_ref, out_ref, x8_ref, *,
                        counts: tuple, lengths: tuple):
    # Stride-1 only. s_ref: (N, L_max, C) packed banks (ascending L, each
    # zero-padded to L_max); out_ref: (1, N, WS, C) on the W_max grid.
    # Taps are processed in per-group segments: taps [L_{g-1}, L_g) update
    # only the shapelet rows of groups g..G-1 (static row slices).
    n, _l_max, c = s_ref.shape
    ws = out_ref.shape[2]
    j = pl.program_id(1)
    t8 = x8_ref.shape[1]
    ck = _TAPS

    @pl.when(j == 0)
    def _():
        for k in range(_L_CHUNK):
            x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    ws0 = j * ws
    starts = _row_starts(counts)

    def tap_static(accs, li, ns):
        xs = x8_ref[li % ck, pl.ds(ws0 + li - li % ck, ws), :]
        return tuple(a + jnp.abs(xs - s_ref[ni, li]) if ni >= ns else a
                     for ni, a in enumerate(accs))

    def segment(accs, lo, hi, ns):
        """Taps [lo, hi) onto shapelet rows ns..N-1."""
        a0 = min(-(-lo // ck) * ck, hi)           # align head
        for li in range(lo, a0):
            accs = tap_static(accs, li, ns)
        n_chunks = (hi - a0) // ck

        def chunk_body(ci, accs):
            base = a0 + ci * ck
            sch = s_ref[ns:, pl.ds(base, ck), :]  # (N-ns, ck, C)
            for k in range(ck):
                xs = x8_ref[k, pl.ds(ws0 + base, ws), :]
                accs = tuple(a + jnp.abs(xs - sch[ni - ns, k]) if ni >= ns
                             else a for ni, a in enumerate(accs))
            return accs

        if n_chunks > 0:
            accs = jax.lax.fori_loop(0, n_chunks, chunk_body, accs)
        for li in range(a0 + n_chunks * ck, hi):
            accs = tap_static(accs, li, ns)
        return accs

    accs = tuple(jnp.zeros((ws, c), jnp.float32) for _ in range(n))
    lo = 0
    for g, l_g in enumerate(lengths):
        accs = segment(accs, lo, l_g, starts[g])
        lo = l_g
    scales = [1.0 / lengths[g] for g in range(len(counts))
              for _ in range(counts[g])]
    out_ref[0] = jnp.stack([a * s for a, s in zip(accs, scales)])


def _bwd_kernel_grouped(x_ref, s_ref, g_ref, out_ref, x8_ref, *,
                        w_total: int, ls: int,
                        counts: tuple, lengths: tuple):
    # Same structure as _bwd_kernel, but the (static) l-subtile loop skips
    # shapelet rows whose group length ends before the subtile — group-0 rows
    # do NOT pay group-1's extra taps. The garbage gradient rows beyond each
    # group's L are sliced off host-side. 1/L_g is folded into g host-side.
    n, l_pad, c = s_ref.shape
    wt = g_ref.shape[2]
    b = pl.program_id(0)
    j = pl.program_id(1)
    w0 = j * wt
    t8 = x8_ref.shape[1]
    ck = _TAPS

    # static-offset full-series fill per batch row (dynamic-offset fills
    # crash Mosaic at multi-lane C — see _bwd_kernel); reads add w0 below
    @pl.when(j == 0)
    def _():
        for k in range(_L_CHUNK):
            x8_ref[k] = x_ref[0, pl.ds(k, t8), :]

    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    starts = _row_starts(counts)
    l_pad8 = [-(-l_g // _L_CHUNK) * _L_CHUNK for l_g in lengths]

    for li in range(l_pad // ls):
        l0 = li * ls
        # first group whose (8-padded) tap range still overlaps this subtile
        g_first = next((g for g in range(len(counts)) if l_pad8[g] > l0),
                       None)
        if g_first is None:
            break
        ns = starts[g_first]
        s_tile = [s_ref[ni, pl.ds(l0, ls), :] for ni in range(ns, n)]

        def chunk_body(wi, accs, l0=l0, ns=ns, s_tile=s_tile):
            wb = wi * ck
            gch = g_ref[0, ns:, pl.ds(wb, ck), :]          # (N-ns, ck, C)
            for k in range(ck):
                gk = jnp.where(w0 + wb + k < w_total, gch[:, k], 0.0)
                xs = x8_ref[k, pl.ds(w0 + l0 + wb, ls), :]
                accs = tuple(
                    a + jnp.where(s_tile[i] > xs, gk[i], -gk[i])
                    for i, a in enumerate(accs))
            return accs

        accs = tuple(jnp.zeros((ls, c), jnp.float32) for _ in range(n - ns))
        accs = jax.lax.fori_loop(0, wt // ck, chunk_body, accs)
        out_ref[ns:, pl.ds(l0, ls), :] += jnp.stack(accs)


def _pack_banks(banks):
    """[(n_g, C, L_g)] ascending-L -> (N, L_max, C) channels-last packed."""
    l_max = banks[-1].shape[-1]
    packed = [jnp.pad(jnp.swapaxes(s.astype(jnp.float32), 1, 2),
                      ((0, 0), (0, l_max - s.shape[-1]), (0, 0)))
              for s in banks]
    return jnp.concatenate(packed, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def l1_sliding_distance_grouped(x: jax.Array, banks, interpret: bool = None):
    """x (B, C, T), banks: tuple of (n_g, C, L_g) sorted ascending by L ->
    tuple of d_g (B, n_g, C, W_g) f32. Stride-1 only (the stride>1 regime
    applies only to seq_len >= 3000 where banks are long and unfused)."""
    return _grouped_fwd(x, banks, interpret)


def _grouped_fwd(x, banks, interpret, ws_override=None):
    if interpret is None:
        interpret = _interpret_default()
    b, c, t = x.shape
    counts = tuple(s.shape[0] for s in banks)
    lengths = tuple(s.shape[-1] for s in banks)
    assert list(lengths) == sorted(lengths), "banks must be ascending by L"
    n = sum(counts)
    l_max = lengths[-1]
    w_max = t - lengths[0] + 1
    # wider-than-budget subtile: the fused N shapelets would shrink WS to 8,
    # costing a full s-broadcast per acc update (the round-1 inefficiency);
    # WS=24 trades mild vreg spill for 3x broadcast amortization (measured
    # best in the grouped sweep, scripts/kernel_lab.py)
    ws = ws_override or max(_fwd_ws(n, c), 24 if c <= 128 else 8)
    nws = -(-w_max // ws)
    t8 = nws * ws + l_max + _L_CHUNK
    t_pad = t8 + _L_CHUNK
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    xt = jnp.pad(xt, ((0, 0), (0, t_pad - t), (0, 0)))
    st = _pack_banks(banks)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_grouped, counts=counts,
                          lengths=lengths),
        out_shape=jax.ShapeDtypeStruct((b, n, w_max, c), jnp.float32),
        grid=(b, nws),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l_max, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, ws, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_L_CHUNK, t8, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * c * sum(ng * (t - lg + 1) * lg
                                  for ng, lg in zip(counts, lengths)),
            bytes_accessed=4 * (b * t * c + n * l_max * c + b * n * w_max * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, st)
    outs = []
    starts = _row_starts(counts)
    for g, l_g in enumerate(lengths):
        w_g = t - l_g + 1
        outs.append(jnp.swapaxes(out[:, starts[g]:starts[g + 1], :w_g, :],
                                 2, 3))
    return tuple(outs)


def _grouped_fwd_rule(x, banks, interpret):
    return _grouped_fwd(x, banks, interpret), (x, banks)


def _grouped_bwd_rule(interpret, res, gs):
    x, banks = res
    if interpret is None:
        interpret = _interpret_default()
    b, c, t = x.shape
    counts = tuple(s.shape[0] for s in banks)
    lengths = tuple(s.shape[-1] for s in banks)
    n = sum(counts)
    w_max = t - lengths[0] + 1
    ls, l_pad = _bwd_l_split(n, c, lengths[-1])
    wt = _window_tile(n, c, w_max)
    nwt = -(-w_max // wt)
    xt = _padded_x(x, wt, 1, l_pad)
    st = jnp.pad(_pack_banks(banks), ((0, 0), (0, l_pad - lengths[-1]),
                                      (0, 0)))
    # pack cotangents: (B, n_g, C, W_g) -> (B, N, W_max, C), 1/L_g folded in,
    # zero-padded over the [W_g, W_max) garbage-window region
    gt = jnp.concatenate([
        jnp.pad(jnp.swapaxes(g.astype(jnp.float32), 2, 3) * (1.0 / l_g),
                ((0, 0), (0, 0), (0, w_max - g.shape[-1]), (0, 0)))
        for g, l_g in zip(gs, lengths)], axis=1)
    t_pad = xt.shape[1]
    t8 = nwt * wt + l_pad + _L_CHUNK
    grad_st = pl.pallas_call(
        functools.partial(_bwd_kernel_grouped, w_total=w_max, ls=ls,
                          counts=counts, lengths=lengths),
        out_shape=jax.ShapeDtypeStruct((n, l_pad, c), jnp.float32),
        grid=(b, nwt),
        in_specs=[
            pl.BlockSpec((1, t_pad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, wt, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, l_pad, c), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_L_CHUNK, t8, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * c * sum(ng * (t - lg + 1) * lg
                                  for ng, lg in zip(counts, lengths)),
            bytes_accessed=4 * (b * t * c + n * l_pad * c + b * n * w_max * c),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, st, gt)
    starts = _row_starts(counts)
    grads = tuple(
        jnp.swapaxes(grad_st[starts[g]:starts[g + 1], :lengths[g], :],
                     1, 2).astype(banks[g].dtype)
        for g in range(len(counts)))
    return jnp.zeros_like(x), grads


l1_sliding_distance_grouped.defvjp(_grouped_fwd_rule, _grouped_bwd_rule)
