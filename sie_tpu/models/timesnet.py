"""TimesNet backbone (reference model/TimesNet.py:9-223), classification path.

TPU adaptation of the period-folding trick. The reference computes data-dependent
top-k FFT periods, reshapes the sequence into a (rows, period) image and runs a
2D Inception conv — the reshape has data-dependent shape, which XLA cannot
compile. We use the identity that a KxK 2D conv on the period-fold equals, in
sequence coordinates, a sum of shifted pointwise matmuls:

    y[t] = sum_{dr,dc} W[dr,dc] @ x[t + dr*p + dc]
           masked where the column (t mod p) + dc leaves [0, p) or the shifted
           index leaves the zero-padded canvas [0, ceil(T/p)*p).

All shapes stay static (canvas padded to 2T, a true upper bound of
ceil(T/p)*p for any p >= 1); the period `p` enters only through traced shift
amounts (jnp.roll) and masks. Each tap is a (C_in x C_out) matmul on the MXU —
the same FLOPs as the reference Conv2d, executed as a lax.scan over taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import (DataEmbedding, torch_default_bias_init,
                                   torch_default_kernel_init)





def _inception_taps(num_kernels: int) -> np.ndarray:
    """Static (tap -> kernel_index, dr, dc) table for Inception_Block_V1
    (reference layers/Conv_Blocks.py:5-30: odd kernels 1,3,...,2K-1, padding to
    'same')."""
    rows = []
    for ki in range(num_kernels):
        j = ki  # half-width of kernel 2*ki+1
        for dr in range(-j, j + 1):
            for dc in range(-j, j + 1):
                rows.append((ki, dr, dc))
    return np.asarray(rows, dtype=np.int32)


class InceptionConvSeq(nn.Module):
    """Inception_Block_V1 applied to the period-fold, in sequence coordinates.

    Input: x (B, T2, C_in) on a zero-padded canvas of static length T2 = 2*T;
    `period` and `canvas_len` (= ceil(T/p)*p) are traced scalars.
    Output: (B, T2, C_out) = mean over the num_kernels branches.
    """

    c_in: int
    c_out: int
    num_kernels: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, period, canvas_len):
        taps = _inception_taps(self.num_kernels)
        n_taps = len(taps)
        # One (C_in, C_out) weight matrix per tap; kaiming-normal like the
        # reference Conv2d init (Conv_Blocks.py:18-23).
        w = self.param("tap_weights",
                       nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                       (n_taps, self.c_in, self.c_out))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_kernels, self.c_out))

        t2 = x.shape[1]
        pos = jnp.arange(t2)
        col = jnp.mod(pos, period)                       # traced period OK
        in_canvas = pos < canvas_len
        xdt = x.astype(self.dtype)

        # By linearity, the MEAN over the K Inception branches collapses to
        # ONE (2K-1)x(2K-1) conv whose tap weights are the sum over the
        # branches covering that offset: (1/K) sum_ki sum_{dr,dc<=ki}
        # W_ki[dr,dc] x[..] == (1/K) sum_{dr,dc} W_eff[dr,dc] x[..]. That
        # cuts 286 taps to 121 AND lets the dynamic roll (a gather — the
        # dominant cost: per-tap rolls measured ~1 s/step at width 32) be
        # hoisted to one per ROW offset; the 11 column shifts are static.
        j = self.num_kernels - 1
        grid = 2 * j + 1
        gid = (taps[:, 1] + j) * grid + (taps[:, 2] + j)
        w_eff = jax.ops.segment_sum(w.astype(self.dtype),
                                    jnp.asarray(gid), num_segments=grid * grid)
        w_rows = w_eff.reshape(grid, grid, self.c_in, self.c_out)
        dr_vals = jnp.arange(-j, j + 1)

        def body(acc, row):
            dr, w_row = row                              # w_row (grid, Ci, Co)
            x_dr = jnp.roll(xdt, -dr * period, axis=1)   # ONE dynamic roll
            cols = []
            for dc in range(-j, j + 1):
                shifted = jnp.roll(x_dr, -dc, axis=1)    # static shift
                src = pos + dr * period + dc
                valid = ((col + dc >= 0) & (col + dc < period)
                         & (src >= 0) & (src < canvas_len) & in_canvas)
                cols.append(shifted * valid[None, :, None].astype(xdt.dtype))
            xg = jnp.stack(cols, axis=2)                 # (B, T2, grid, C_in)
            contrib = jnp.einsum("btgc,gcf->btf", xg, w_row,
                                 preferred_element_type=jnp.float32)
            return acc + contrib, None

        acc0 = jnp.zeros((x.shape[0], t2, self.c_out), jnp.float32)
        # remat: without it the scan saves the (B, T2, grid, C_in) residual
        # of every row — ~14 GB at the EEG default width (observed OOM class).
        acc, _ = jax.lax.scan(jax.checkpoint(body), acc0, (dr_vals, w_rows))
        mean_bias = jnp.mean(bias, axis=0)
        return acc / self.num_kernels + mean_bias[None, None, :]


def fft_periods(x: jax.Array, k: int):
    """Top-k dominant periods from the batch-mean FFT amplitude
    (reference TimesNet.py:9-18). x: (B, T, C) -> (periods (k,), weight (B, k))."""
    xf = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
    amp = jnp.abs(xf)
    freq_strength = jnp.mean(jnp.mean(amp, axis=0), axis=-1)
    freq_strength = freq_strength.at[0].set(0.0)
    _, top = jax.lax.top_k(freq_strength, k)
    top = jnp.maximum(top, 1)
    periods = x.shape[1] // top
    weight = jnp.mean(amp, axis=-1)[:, top]              # (B, k)
    return periods, weight


class TimesBlock(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        b, t, c = x.shape
        periods, weight = fft_periods(x, cfg.top_k)

        conv1 = InceptionConvSeq(cfg.d_model, cfg.d_ff, cfg.num_kernels,
                                 dtype=cfg.compute_dtype, name="conv1")
        conv2 = InceptionConvSeq(cfg.d_ff, cfg.d_model, cfg.num_kernels,
                                 dtype=cfg.compute_dtype, name="conv2")

        canvas = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)  # (B, 2T, C)

        # Static python loop over the k period slots (k is static; the period
        # values are traced scalars). conv1/conv2 params are shared across slots.
        outs = []
        for i in range(cfg.top_k):
            p = periods[i]
            rows = (t + p - 1) // p
            canvas_len = rows * p
            h = conv1(canvas, p, canvas_len)
            h = jax.nn.gelu(h)
            h = conv2(h, p, canvas_len)
            outs.append(h[:, :t, :])                     # (B, T, d_model)
        res = jnp.stack(outs, axis=0)                    # (k, B, T, C)
        w = jax.nn.softmax(weight, axis=1)               # (B, k)
        agg = jnp.einsum("kbtc,bk->btc", res, w)
        return agg + x


def _times_blocks(cfg: Config, h, train: bool):
    """Shared TimesBlock stack with ONE LayerNorm applied after every block
    (reference model/TimesNet.py:83-88,118-122). Must be called from inside a
    compact ``__call__`` (it creates submodules in the caller's scope)."""
    norm = nn.LayerNorm(name="layer_norm")
    for i in range(cfg.e_layers):
        h = norm(TimesBlock(cfg, name=f"block_{i}")(h, train=train))
    return h


def ns_norm(x):
    """Non-stationary-Transformer normalization with detached statistics
    (reference model/TimesNet.py:109-115). Returns (normalized, mean, std),
    stats shaped (B, 1, C)."""
    mean = jax.lax.stop_gradient(jnp.mean(x, axis=1, keepdims=True))
    xc = x - mean
    std = jax.lax.stop_gradient(
        jnp.sqrt(jnp.var(xc, axis=1, keepdims=True) + 1e-5))
    return xc / std, mean, std


def masked_ns_norm(x, mask):
    """Imputation-branch normalization over observed points only (reference
    model/TimesNet.py:137-146): masked points are zeroed after centering and
    excluded from the mean/std denominators. The reference computes
    ``sum(x_enc)`` directly because the TSlib imputation protocol pre-masks
    x_enc (``masked_fill(mask==0, 0)`` in the caller); we fold that masking in
    so raw inputs give the same statistics."""
    denom = jnp.sum(mask == 1, axis=1)
    mean = jax.lax.stop_gradient(
        jnp.sum(jnp.where(mask == 0, 0.0, x), axis=1) / denom)[:, None, :]
    xc = jnp.where(mask == 0, 0.0, x - mean)
    std = jax.lax.stop_gradient(
        jnp.sqrt(jnp.sum(xc * xc, axis=1) / denom + 1e-5))[:, None, :]
    return xc / std, mean, std


class TimesNet(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(x.astype(dt), None,
                                                          train=train)
        h = _times_blocks(cfg, h, train)
        h = jax.nn.gelu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        if padding_mask is not None:
            h = h * padding_mask.astype(h.dtype)[..., None]
        h = h.reshape(h.shape[0], -1)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(h.shape[-1]))(h)
        return out.astype(jnp.float32)


class TimesNetForecaster(nn.Module):
    """Forecast branch (reference model/TimesNet.py:107-133 + forward
    :205-207): NS-normalize, embed, predict_linear aligns the temporal dim to
    seq_len + pred_len, TimesBlocks, per-step projection, de-normalize, return
    the last pred_len steps. Unreachable from the reference CLI; provided for
    library-surface parity like the forecast data loaders."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        xz, mean, std = ns_norm(x_enc)
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(
            xz.astype(dt), x_mark_enc, train=train)
        h = jnp.swapaxes(h, 1, 2)
        h = nn.Dense(cfg.seq_len + cfg.pred_len, dtype=dt,
                     kernel_init=torch_default_kernel_init(),
                     bias_init=torch_default_bias_init(cfg.seq_len),
                     name="predict_linear")(h)
        h = jnp.swapaxes(h, 1, 2)
        h = _times_blocks(cfg, h, train)
        out = nn.Dense(cfg.c_out, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(cfg.d_model))(h)
        out = out.astype(jnp.float32) * std + mean
        return out[:, -cfg.pred_len:, :]


class TimesNetImputer(nn.Module):
    """Imputation branch (reference model/TimesNet.py:135-160): masked
    NS-normalization, no predict_linear, per-step projection, de-normalize."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        if mask is None:
            mask = jnp.ones_like(x_enc)
        xz, mean, std = masked_ns_norm(x_enc, mask)
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(
            xz.astype(dt), x_mark_enc, train=train)
        h = _times_blocks(cfg, h, train)
        out = nn.Dense(cfg.c_out, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(cfg.d_model))(h)
        return out.astype(jnp.float32) * std + mean


class TimesNetAnomalyDetector(nn.Module):
    """Anomaly branch (reference model/TimesNet.py:162-183): the imputer's
    network with the forecast branch's unmasked normalization and no marks."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        xz, mean, std = ns_norm(x_enc)
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(
            xz.astype(dt), None, train=train)
        h = _times_blocks(cfg, h, train)
        out = nn.Dense(cfg.c_out, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(cfg.d_model))(h)
        return out.astype(jnp.float32) * std + mean
