"""PatchTST backbone, classification path (reference model/PatchTST.py:23-77, 181-208).

Channel-independent patching (len 16, stride 8, replication pad 8 at the end),
shared Transformer encoder over patches, flatten head. The classification path
starts with the Non-stationary-Transformer normalization (mean/ddof-0 std over
time, eps 1e-5).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import Encoder, sinusoidal_embedding


class PatchTST(nn.Module):
    config: Config
    patch_len: int = 16
    stride: int = 8

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        b, t, c = x.shape

        # Non-stationary normalization (reference PatchTST.py:181-187)
        mean = jnp.mean(x, axis=1, keepdims=True)
        xz = x - mean
        std = jnp.sqrt(jnp.var(xz, axis=1, keepdims=True) + 1e-5)
        xz = xz / std

        # patching: (B, T, C) -> (B*C, patch_num, patch_len)
        xt = jnp.transpose(xz, (0, 2, 1))                        # (B, C, T)
        pad = jnp.repeat(xt[:, :, -1:], self.stride, axis=-1)    # ReplicationPad1d
        xt = jnp.concatenate([xt, pad], axis=-1)
        patch_num = (t + self.stride - self.patch_len) // self.stride + 1
        idx = (jnp.arange(patch_num)[:, None] * self.stride
               + jnp.arange(self.patch_len)[None, :])
        patches = xt[:, :, idx]                                  # (B, C, P, L)
        patches = patches.reshape(b * c, patch_num, self.patch_len)

        h = nn.Dense(cfg.d_model, use_bias=False, dtype=dt,
                     name="value_embedding")(patches.astype(dt))
        pe = jnp.asarray(sinusoidal_embedding(patch_num, cfg.d_model), dtype=h.dtype)
        h = nn.Dropout(cfg.dropout)(h + pe[None], deterministic=not train)

        h = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                    cfg.dropout, cfg.activation, dtype=dt,
                    use_flash=cfg.use_flash_attention,
                    name="encoder")(h, train=train)

        h = h.reshape(b, c * patch_num * cfg.d_model)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection")(h)
        return out.astype(jnp.float32)
