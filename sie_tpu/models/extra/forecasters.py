"""Full forecast models assembled from the resurrected layer families.

Beyond-reference surface: the reference vendors the Autoformer / FEDformer /
ETSformer / Pyraformer / Crossformer *layer* families but never assembles a
model from them (SURVEY §2.4 dead code; no model/ file imports them). These
modules complete each family to its canonical TSlib forecasting model so the
rebuilt layers are usable end-to-end — they plug into the forecast
experiment registry (`train/tasks.py:build_task_model`) next to the
Transformer/TimesNet/PatchTST branches and share its TSlib window protocol:
``__call__(x_enc, x_mark_enc, x_dec, x_mark_dec) -> (B, pred_len, c_out)``.

Assembly references (architecture definitions, not reference-repo files):
Autoformer (Wu et al. 2021) progressive decomposition; FEDformer
(Zhou et al. 2022) = the same skeleton with frequency-domain attention;
ETSformer (Woo et al. 2022) level/growth/season decomposition; Pyraformer
(Liu et al. 2022) pyramid attention + final-position head; Crossformer
(Zhang & Yan 2023) dimension-segment-wise embedding + two-stage attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.extra.autoformer import (AutoformerDecoder,
                                             AutoformerEncoder,
                                             series_decomp)
from sie_tpu.models.extra.crossformer import (CrossformerDecoder,
                                              CrossformerEncoder)
from sie_tpu.models.extra.etsformer import ETSDecoder, ETSEncoder
from sie_tpu.models.extra.pyraformer import PyraformerEncoder
from sie_tpu.models.layers import DataEmbedding


class AutoformerForecaster(nn.Module):
    """Autoformer forecasting: decompose the lookback, extrapolate the trend
    with the decoder's progressive decomposition, add the seasonal part.
    `attention='auto'` is Autoformer; 'fourier'/'wavelet' give the FEDformer
    variants (same skeleton, spectral attention)."""

    config: Config
    attention: str = "auto"

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, x_dec=None, x_mark_dec=None,
                 train: bool = False):
        cfg = self.config
        b, _, c = x_enc.shape
        seasonal_init, trend_init = series_decomp(x_enc, cfg.moving_avg)
        mean = jnp.broadcast_to(jnp.mean(x_enc, axis=1, keepdims=True),
                                (b, cfg.pred_len, c))
        trend_init = jnp.concatenate(
            [trend_init[:, -cfg.label_len:] if cfg.label_len else
             trend_init[:, :0], mean], axis=1)
        seasonal_init = jnp.concatenate(
            [seasonal_init[:, -cfg.label_len:] if cfg.label_len else
             seasonal_init[:, :0],
             jnp.zeros((b, cfg.pred_len, c), x_enc.dtype)], axis=1)

        enc = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            positional=False, name="enc_embedding")(
            x_enc, x_mark_enc, train=train)
        enc = AutoformerEncoder(
            cfg.d_model, cfg.e_layers, cfg.d_ff, cfg.n_heads, cfg.moving_avg,
            cfg.dropout, cfg.activation, cfg.factor, self.attention,
            name="encoder")(enc, train=train)

        dec = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            positional=False, name="dec_embedding")(
            seasonal_init, x_mark_dec, train=train)
        seasonal_part, trend_part = AutoformerDecoder(
            cfg.d_model, cfg.c_out, max(cfg.d_layers, 1), cfg.d_ff,
            cfg.n_heads, cfg.moving_avg, cfg.dropout, cfg.activation,
            cfg.factor, self.attention, name="decoder")(
                dec, enc, trend_init, train=train)
        out = seasonal_part + trend_part
        return out[:, -cfg.pred_len:, :].astype(jnp.float32)


class FEDformerForecaster(AutoformerForecaster):
    """FEDformer (Fourier version): Autoformer skeleton with FourierBlock
    self-attention and FourierCrossAttention in the decoder."""

    attention: str = "fourier"


class ETSformerForecaster(nn.Module):
    """ETSformer: per-layer season (DFT extrapolation) / growth (exponential
    smoothing) / level extraction, damped-trend decoding; forecast =
    last level + growth horizon + season horizon."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, x_dec=None, x_mark_dec=None,
                 train: bool = False):
        cfg = self.config
        res = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            name="enc_embedding")(x_enc, x_mark_enc,
                                                  train=train)
        layer_kw = dict(d_model=cfg.d_model, nhead=cfg.n_heads,
                        c_out=cfg.c_out, seq_len=x_enc.shape[1],
                        pred_len=cfg.pred_len, k=max(cfg.top_k, 1),
                        dim_feedforward=cfg.d_ff, dropout=cfg.dropout)
        level, growths, seasons = ETSEncoder(
            layers=(layer_kw,) * cfg.e_layers, name="encoder")(
                res, x_enc, train=train)
        growth, season = ETSDecoder(
            d_model=cfg.d_model, nhead=cfg.n_heads, c_out=cfg.c_out,
            pred_len=cfg.pred_len, n_layers=cfg.e_layers,
            dropout=cfg.dropout, name="decoder")(growths, seasons,
                                                 train=train)
        preds = level[:, -1:] + growth + season
        return preds.astype(jnp.float32)


class PyraformerForecaster(nn.Module):
    """Pyraformer: PAM pyramid encoder, multi-scale features of the last
    base position projected to the whole horizon in one shot."""

    config: Config
    inner_size: int = 5

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, x_dec=None, x_mark_dec=None,
                 train: bool = False):
        cfg = self.config
        b, t, _ = x_enc.shape
        # coarsening factor per pyramid level; shallow windows for short
        # lookbacks so every scale keeps >= 2 nodes
        window = (4, 4) if t >= 32 else (2, 2)
        enc = PyraformerEncoder(
            seq_len=t, d_model=cfg.d_model, n_heads=cfg.n_heads,
            d_ff=cfg.d_ff, e_layers=cfg.e_layers, window_size=window,
            inner_size=self.inner_size, dropout=cfg.dropout,
            name="encoder")(x_enc, x_mark_enc, train=train)
        out = nn.Dense(cfg.pred_len * cfg.c_out, name="projection")(
            enc[:, -1])
        return out.reshape(b, cfg.pred_len, cfg.c_out).astype(jnp.float32)


class CrossformerForecaster(nn.Module):
    """Crossformer: dimension-segment-wise embedding, hierarchical two-stage
    attention encoder, learnable-query decoder emitting per-segment
    predictions summed over scales."""

    config: Config
    seg_len: int = 12

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, x_dec=None, x_mark_dec=None,
                 train: bool = False):
        cfg = self.config
        b, t, d = x_enc.shape
        seg_len = min(self.seg_len, t)
        in_seg = -(-t // seg_len)
        pad = in_seg * seg_len - t
        if pad:        # front-pad with the first value (TSlib protocol)
            x_enc = jnp.concatenate(
                [jnp.repeat(x_enc[:, :1], pad, axis=1), x_enc], axis=1)
        pred_seg = -(-cfg.pred_len // seg_len)

        # DSW embedding: (B, T, D) -> (B, D, in_seg, seg_len) -> d_model
        xseg = x_enc.transpose(0, 2, 1).reshape(b, d, in_seg, seg_len)
        xemb = nn.Dense(cfg.d_model, name="value_embedding")(xseg)
        pos = self.param("enc_pos_embedding", nn.initializers.normal(0.02),
                         (1, d, in_seg, cfg.d_model))
        xemb = nn.Dropout(cfg.dropout)(xemb + pos, deterministic=not train)
        xemb = nn.LayerNorm(name="pre_norm")(xemb)

        blocks, seg = [], in_seg
        for i in range(max(cfg.e_layers, 1)):
            if i > 0:
                seg = -(-seg // 2)          # SegMerging ceil-pads odd counts
            blocks.append(dict(
                win_size=1 if i == 0 else 2, d_model=cfg.d_model,
                n_heads=cfg.n_heads, d_ff=cfg.d_ff, depth=1,
                dropout=cfg.dropout, seg_num=seg, factor=max(cfg.factor, 1)))
        scales = CrossformerEncoder(blocks=tuple(blocks), name="encoder")(
            xemb, train=train)

        dec_pos = self.param("dec_pos_embedding",
                             nn.initializers.normal(0.02),
                             (1, d, pred_seg, cfg.d_model))
        dec_in = jnp.broadcast_to(dec_pos, (b, d, pred_seg, cfg.d_model))
        lkw = dict(seg_len=seg_len, d_model=cfg.d_model, n_heads=cfg.n_heads,
                   d_ff=cfg.d_ff, dropout=cfg.dropout, seg_num=pred_seg,
                   factor=max(cfg.factor, 1))
        out = CrossformerDecoder(
            layers=(lkw,) * (max(cfg.e_layers, 1) + 1), name="decoder")(
                dec_in, scales, train=train)
        return out[:, : cfg.pred_len].astype(jnp.float32)
