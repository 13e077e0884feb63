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


class _EncoderChunk(nn.Module):
    """Scan body: applies the shared encoder to one chunk of channel rows.
    (carry is unused; nn.scan requires the (carry, x) -> (carry, y) shape.)
    use_remat=False gives the identical param tree without recompute — used
    for the single-chunk path where memory never was the problem."""

    config: Config
    train: bool
    use_remat: bool = True

    @nn.compact
    def __call__(self, carry, x):
        cfg = self.config
        enc_cls = (nn.remat(Encoder, static_argnums=(2,)) if self.use_remat
                   else Encoder)
        enc = enc_cls(
            cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
            cfg.dropout, cfg.activation, dtype=cfg.compute_dtype,
            use_flash=cfg.use_flash_attention,
            use_fused=cfg.use_fused_attention, name="encoder")
        return carry, enc(x, self.train)


_CHUNK_ROWS = 2048  # max channel-rows per encoder scan step


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

        # Channel independence multiplies the effective batch by C (B*C=7808
        # rows at EEG width); even single FFN intermediates are then
        # (7808, 105, 2048) bf16 = 3.1 GB and the step needs ~20 GB (observed
        # OOM on v5e). TPU-first fix: lax.scan the shared encoder over
        # channel-row chunks (sequential => peak activations / n_chunks, same
        # flops) with remat inside each chunk. Params are broadcast, so the
        # checkpoint tree is chunk-count independent.
        rows = b * c
        n_chunks = max(1, -(-rows // _CHUNK_ROWS))
        if n_chunks == 1:
            # small enough for one pass: same param tree, no remat recompute
            _, h = _EncoderChunk(cfg, train, use_remat=False,
                                 name="enc_scan")(None, h)
        else:
            chunk = -(-rows // n_chunks)
            pad_rows = n_chunks * chunk - rows
            hp = jnp.pad(h, ((0, pad_rows), (0, 0), (0, 0)))
            hp = hp.reshape(n_chunks, chunk, patch_num, cfg.d_model)
            scan = nn.scan(_EncoderChunk, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=0, out_axes=0)
            _, hs = scan(cfg, train, name="enc_scan")(None, hp)
            h = hs.reshape(n_chunks * chunk, patch_num, cfg.d_model)[:rows]

        h = h.reshape(b, c * patch_num * cfg.d_model)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection")(h)
        return out.astype(jnp.float32)
