"""ETSformer blocks: exponential smoothing attention, growth, Fourier season.

Parity target (dormant in the reference): `layers/ETSformer_EncDec.py` —
`Transform` (train-time augmentation), `conv1d_fft`, `ExponentialSmoothing`,
`Feedforward`, `GrowthLayer`, `FourierLayer`, `LevelLayer`,
`EncoderLayer`/`Encoder`, `DampingLayer`, `DecoderLayer`/`Decoder`.

TPU re-design notes:
- `conv1d_fft` is FFT cross-correlation with a host-static fast length
  (`scipy.fftpack.next_fast_len`), identical math to the reference's
  rfft/conj/irfft/roll/index_select pipeline but expressed as one slice.
- The FourierLayer's per-sample top-k frequency selection uses
  `lax.top_k` + gathers (static k), replacing the reference's meshgrid
  fancy-indexing; the extrapolation is the same amp*cos(2 pi f t + phase)
  synthesis.
- All randomness (Transform augmentation) takes explicit PRNG keys.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.fftpack import next_fast_len

import jax
import jax.numpy as jnp
from flax import linen as nn


def transform_augment(key: jax.Array, x: jax.Array, sigma: float):
    """Scale+shift+jitter augmentation (reference ETSformer_EncDec.py:10-25),
    with explicit rng instead of ambient torch randomness."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = x * (jax.random.normal(k1, x.shape[-1:]) * sigma + 1.0)
    x = x + jax.random.normal(k2, x.shape[-1:]) * sigma
    return x + jax.random.normal(k3, x.shape) * sigma


def conv1d_fft(f: jax.Array, g: jax.Array, dim: int = 1) -> jax.Array:
    """FFT cross-correlation, returning the last N lags (reference
    ETSformer_EncDec.py:28-43). f: (..., N, ...), g broadcastable with M
    entries on `dim`."""
    n = f.shape[dim]
    m = g.shape[dim]
    fast = next_fast_len(n + m - 1)
    ff = jnp.fft.rfft(f, fast, axis=dim)
    fg = jnp.fft.rfft(g, fast, axis=dim)
    out = jnp.fft.irfft(ff * jnp.conj(fg), fast, axis=dim)
    out = jnp.roll(out, -1, axis=dim)
    idx = jnp.arange(fast - n, fast)
    return jnp.take(out, idx, axis=dim)


class ExponentialSmoothing(nn.Module):
    """Exponential-smoothing 'attention' (reference ETSformer_EncDec.py:46-85):
    out_t = alpha^t v0 + sum_s (1-alpha) alpha^(t-s) v_s, computed as one
    FFT correlation against the exponential kernel; alpha = sigmoid(w) per
    head."""

    dim: int
    nhead: int
    dropout: float = 0.1
    aux: bool = False
    prepend_v0: bool = False

    @nn.compact
    def __call__(self, values, aux_values=None, *, train: bool = False):
        sw = self.param("smoothing_weight",
                        nn.initializers.normal(1.0), (self.nhead, 1))
        v0 = self.param("v0", nn.initializers.normal(1.0),
                        (1, 1, self.nhead, self.dim))
        b, t, h, d = values.shape
        alpha = jax.nn.sigmoid(sw)                          # (H, 1)
        powers = jnp.arange(t, dtype=jnp.float32)
        reshape = lambda w: w.T[None, :, :, None]           # (1, T, H, 1)
        weight = reshape((1 - alpha) * alpha ** jnp.flip(powers))
        init_weight = reshape(alpha ** (powers + 1))
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        out = conv1d_fft(drop(values), weight, dim=1)
        out = init_weight * v0 + out
        if aux_values is not None:
            a = alpha.T[None, :, :, None]                   # (1, 1, H, 1)
            aux_weight = weight / (1 - a) * a
            out = out + conv1d_fft(drop(aux_values), aux_weight, dim=1)
        if self.prepend_v0:
            out = jnp.concatenate(
                [jnp.broadcast_to(v0, (b, 1, h, d)), out], axis=1)
        return out


class GrowthLayer(nn.Module):
    """Growth representation: first differences smoothed exponentially
    (reference ETSformer_EncDec.py:103-133). (B, T, D) -> (B, T+1, D)."""

    d_model: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d_head = self.d_model // self.nhead
        b, t, _ = x.shape
        z0 = self.param("z0", nn.initializers.normal(1.0),
                        (self.nhead, d_head))
        v = nn.Dense(d_head * self.nhead, name="in_proj")(x)
        v = v.reshape(b, t, self.nhead, d_head)
        v = jnp.concatenate(
            [jnp.broadcast_to(z0, (b, 1, self.nhead, d_head)), v], axis=1)
        v = v[:, 1:] - v[:, :-1]
        out = ExponentialSmoothing(d_head, self.nhead, self.dropout,
                                   prepend_v0=True, name="es")(v, train=train)
        out = out.reshape(b, t + 1, self.nhead * d_head)
        return nn.Dense(self.d_model, name="out_proj")(out)


class FourierLayer(nn.Module):
    """Seasonality by top-k DFT extrapolation (reference
    ETSformer_EncDec.py:136-181): keep the k strongest non-DC frequencies
    per (sample, channel), synthesize amp*cos(2 pi f t + phase) over
    t + pred_len steps."""

    d_model: int
    pred_len: int
    k: int
    low_freq: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        x_freq = jnp.fft.rfft(x, axis=1)                    # (B, F, D)
        hi = x_freq.shape[1] - 1 if t % 2 == 0 else x_freq.shape[1]
        x_freq = x_freq[:, self.low_freq:hi]
        f_all = jnp.fft.rfftfreq(t)[self.low_freq:hi]

        mag = jnp.abs(x_freq).transpose(0, 2, 1)            # (B, D, F)
        _, idx = jax.lax.top_k(mag, self.k)                 # (B, D, k)
        idx = idx.transpose(0, 2, 1)                        # (B, k, D)
        x_top = jnp.take_along_axis(x_freq, idx, axis=1)    # (B, k, D)
        f_top = f_all[idx]                                  # (B, k, D)

        # extrapolate with the conjugate pair (reference :160-172)
        x_cat = jnp.concatenate([x_top, jnp.conj(x_top)], axis=1)
        f_cat = jnp.concatenate([f_top, -f_top], axis=1)    # (B, 2k, D)
        t_val = jnp.arange(t + self.pred_len, dtype=jnp.float32)
        amp = (jnp.abs(x_cat) / t)[:, :, None, :]           # (B,2k,1,D)
        phase = jnp.angle(x_cat)[:, :, None, :]
        wave = amp * jnp.cos(2 * math.pi * f_cat[:, :, None, :]
                             * t_val[None, None, :, None] + phase)
        return wave.sum(axis=1)                             # (B, T+pred, D)


class LevelLayer(nn.Module):
    """Level update from (level, growth, season) (reference
    ETSformer_EncDec.py:184-203)."""

    d_model: int
    c_out: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, level, growth, season, *, train: bool = False):
        b, t, _ = level.shape
        growth = nn.Dense(self.c_out, name="growth_pred")(growth)
        season = nn.Dense(self.c_out, name="season_pred")(season)
        es = ExponentialSmoothing(1, self.c_out, self.dropout, aux=True,
                                  name="es")
        out = es((level - season).reshape(b, t, self.c_out, 1),
                 growth.reshape(b, t, self.c_out, 1), train=train)
        return out.reshape(b, t, self.c_out)


class ETSEncoderLayer(nn.Module):
    """Season/growth/level extraction (reference ETSformer_EncDec.py:206-247)."""

    d_model: int
    nhead: int
    c_out: int
    seq_len: int
    pred_len: int
    k: int
    dim_feedforward: int = 0
    dropout: float = 0.1
    activation: str = "sigmoid"

    @nn.compact
    def __call__(self, res, level, *, train: bool = False):
        d_ff = self.dim_feedforward or 4 * self.d_model
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        season = drop(FourierLayer(self.d_model, self.pred_len, self.k,
                                   name="seasonal")(res))
        res = res - season[:, : -self.pred_len]
        growth = drop(GrowthLayer(self.d_model, self.nhead, self.dropout,
                                  name="growth")(res, train=train))
        res = nn.LayerNorm(name="norm1")(res - growth[:, 1:])
        act = getattr(jax.nn, self.activation)
        ff = nn.Dense(self.d_model, use_bias=False, name="ff2")(
            drop(act(nn.Dense(d_ff, use_bias=False, name="ff1")(res))))
        res = nn.LayerNorm(name="norm2")(res + drop(ff))
        level = LevelLayer(self.d_model, self.c_out, self.dropout,
                           name="level")(level, growth[:, :-1],
                                         season[:, : -self.pred_len],
                                         train=train)
        return res, level, growth, season


class ETSEncoder(nn.Module):
    """Stack collecting growth/season per layer (reference :250-264)."""

    layers: tuple          # tuple of ETSEncoderLayer kwargs dicts

    @nn.compact
    def __call__(self, res, level, *, train: bool = False):
        growths, seasons = [], []
        for i, kw in enumerate(self.layers):
            res, level, growth, season = ETSEncoderLayer(
                **kw, name=f"layer_{i}")(res, level, train=train)
            growths.append(growth)
            seasons.append(season)
        return level, growths, seasons


class DampingLayer(nn.Module):
    """Damped-trend extrapolation (reference ETSformer_EncDec.py:267-289)."""

    pred_len: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):          # (B, 1, D)
        df = self.param("damping_factor", nn.initializers.normal(1.0),
                        (1, self.nhead))
        b, _, d = x.shape
        x = jnp.broadcast_to(x, (b, self.pred_len, d))
        powers = jnp.arange(1, self.pred_len + 1,
                            dtype=jnp.float32)[:, None]     # (T, 1)
        factors = jnp.cumsum(jax.nn.sigmoid(df) ** powers, axis=0)
        x = x.reshape(b, self.pred_len, self.nhead, -1)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return (x * factors[..., None]).reshape(b, self.pred_len, d)


class ETSDecoderLayer(nn.Module):
    """Growth damping + season horizon slice (reference :292-309)."""

    d_model: int
    nhead: int
    c_out: int
    pred_len: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, growth, season, *, train: bool = False):
        gh = DampingLayer(self.pred_len, self.nhead, self.dropout,
                          name="growth_damping")(growth[:, -1:], train=train)
        gh = nn.Dropout(self.dropout)(gh, deterministic=not train)
        return gh, season[:, -self.pred_len:]


class ETSDecoder(nn.Module):
    """Sums per-layer horizons, projects to c_out (reference :312-335)."""

    d_model: int
    nhead: int
    c_out: int
    pred_len: int
    n_layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, growths, seasons, *, train: bool = False):
        gr, sr = 0.0, 0.0
        for i in range(self.n_layers):
            g, s = ETSDecoderLayer(self.d_model, self.nhead, self.c_out,
                                   self.pred_len, self.dropout,
                                   name=f"layer_{i}")(growths[i], seasons[i],
                                                      train=train)
            gr = gr + g
            sr = sr + s
        pred = nn.Dense(self.c_out, name="pred")
        return pred(gr), pred(sr)
