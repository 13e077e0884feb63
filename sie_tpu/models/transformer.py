"""Vanilla Transformer backbone, classification path
(reference model/Transformer.py:17-39, 99-110).

DataEmbedding -> Encoder stack -> gelu -> dropout -> multiply by padding mask
-> flatten (B, T*d_model) -> linear head. The reference's dead forecast /
imputation / anomaly branches are omitted (classification/regression only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import DataEmbedding, Encoder


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
                    name="encoder")(h, train=train)
        h = jax.nn.gelu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        if padding_mask is not None:
            h = h * padding_mask.astype(h.dtype)[..., None]
        h = h.reshape(h.shape[0], -1)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection")(h)
        return out.astype(jnp.float32)
