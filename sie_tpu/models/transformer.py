"""Vanilla Transformer backbone (reference model/Transformer.py:17-125).

Classification path (the one the reference CLI can reach): DataEmbedding ->
Encoder stack -> gelu -> dropout -> multiply by padding mask -> flatten
(B, T*d_model) -> linear head. The forecast / imputation / anomaly task
branches — unreachable from the reference's own CLI (run.py restricts
task_name to classification/regression) — are provided as separate modules
below for library-surface parity, like the forecast/anomaly data loaders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import (DataEmbedding, Decoder, Encoder,
                                   torch_default_bias_init,
                                   torch_default_kernel_init)


class Transformer(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(x.astype(dt), None,
                                                          train=train)
        h = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                    cfg.dropout, cfg.activation, dtype=dt,
                    use_flash=cfg.use_flash_attention,
                    use_fused=cfg.use_fused_attention,
                    fused_max_len=cfg.fused_attention_max_len,
                    fused_min_len=cfg.fused_attention_min_len,
                    variant=cfg.attention_variant,
                    moe_experts=cfg.moe_experts,
                    moe_capacity_factor=cfg.moe_capacity_factor,
                    moe_top_k=cfg.moe_top_k,
                    moe_aux_weight=cfg.moe_aux_weight,
                    name="encoder")(h, train=train)
        h = jax.nn.gelu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        if padding_mask is not None:
            h = h * padding_mask.astype(h.dtype)[..., None]
        h = h.reshape(h.shape[0], -1)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(h.shape[-1]))(h)
        return out.astype(jnp.float32)


class TransformerForecaster(nn.Module):
    """Encoder-decoder forecasting branch (reference Transformer.py:74-78 +
    99: forecast() then `dec_out[:, -pred_len:, :]`). x_dec is the
    label_len-context + zero-padded horizon the TSlib protocol feeds."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, x_dec=None, x_mark_dec=None,
                 train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        enc = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            dtype=dt, name="enc_embedding")(
            x_enc.astype(dt), x_mark_enc, train=train)
        enc = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                      cfg.dropout, cfg.activation, dtype=dt,
                      use_fused=cfg.use_fused_attention,
                      fused_max_len=cfg.fused_attention_max_len,
                      fused_min_len=cfg.fused_attention_min_len,
                      name="encoder")(enc, train=train)
        dec = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                            dtype=dt, name="dec_embedding")(
            x_dec.astype(dt), x_mark_dec, train=train)
        out = Decoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.d_layers,
                      cfg.c_out, cfg.dropout, cfg.activation, dtype=dt,
                      name="decoder")(dec, enc, train=train)
        return out[:, -cfg.pred_len:, :].astype(jnp.float32)


class TransformerImputer(nn.Module):
    """Imputation branch: encoder + per-timestep projection (reference
    Transformer.py:81-88; the anomaly branch at :90-96 is the same network
    called without time marks)."""

    config: Config

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        h = DataEmbedding(cfg.d_model, cfg.embed, cfg.freq, cfg.dropout,
                          dtype=dt, name="enc_embedding")(
            x_enc.astype(dt), x_mark_enc, train=train)
        h = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                    cfg.dropout, cfg.activation, dtype=dt,
                    use_fused=cfg.use_fused_attention,
                    fused_max_len=cfg.fused_attention_max_len,
                    fused_min_len=cfg.fused_attention_min_len,
                    name="encoder")(h, train=train)
        out = nn.Dense(cfg.c_out, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(cfg.d_model))(h)
        return out.astype(jnp.float32)


# anomaly detection is the imputer called with x_mark_enc=None
TransformerAnomalyDetector = TransformerImputer
