"""PatchTST backbone (reference model/PatchTST.py:23-227).

Channel-independent patching (len 16, stride 8, replication pad 8 at the end),
shared Transformer encoder over patches. The classification path (the one the
reference CLI can reach) uses a flatten-all head; the forecast / imputation /
anomaly branches (reference :79-179, unreachable from the reference CLI) use
the per-channel FlattenHead and NS-denormalization.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import (Encoder, sinusoidal_embedding,
                                   torch_default_bias_init,
                                   torch_default_kernel_init)
from sie_tpu.models.timesnet import masked_ns_norm, ns_norm


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
            use_fused=cfg.use_fused_attention,
            fused_max_len=cfg.fused_attention_max_len,
            fused_min_len=cfg.fused_attention_min_len, name="encoder")
        return carry, enc(x, self.train)


_CHUNK_ROWS = 2048  # max channel-rows per encoder scan step


class _PatchBase(nn.Module):
    """Shared patch->embed->encoder pipeline. Subclasses call ``_encode`` from
    their compact ``__call__`` (submodules land in the subclass scope, so the
    classification param tree is unchanged by this refactor)."""

    config: Config
    patch_len: int = 16
    stride: int = 8

    def _encode(self, xz, train: bool):
        """(B, T, C) normalized input -> (B, C, patch_num, d_model)."""
        cfg = self.config
        dt = cfg.compute_dtype
        b, t, c = xz.shape

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
                     kernel_init=torch_default_kernel_init(),
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
        # cfg.patch_chunk_rows overrides the chunk size (perf tuning,
        # scripts/patchtst_lab.py); 0 keeps the default.
        rows = b * c
        chunk_rows = cfg.patch_chunk_rows or _CHUNK_ROWS
        n_chunks = max(1, -(-rows // chunk_rows))
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
            _, hs = scan(cfg, train, use_remat=cfg.patch_remat,
                         name="enc_scan")(None, hp)
            h = hs.reshape(n_chunks * chunk, patch_num, cfg.d_model)[:rows]
        return h.reshape(b, c, patch_num, cfg.d_model)

    def _flatten_head(self, h, target_window: int, train: bool):
        """FlattenHead (reference PatchTST.py:13-26): flatten the trailing
        (d_model, patch_num) — reference layout — then linear + dropout.
        h: (B, C, P, D) -> (B, target_window, C)."""
        cfg = self.config
        b, c, p, d = h.shape
        hf = jnp.swapaxes(h, 2, 3).reshape(b, c, d * p)
        out = nn.Dense(target_window, dtype=cfg.compute_dtype, name="head",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(d * p))(hf)
        out = nn.Dropout(cfg.dropout)(out, deterministic=not train)
        return jnp.transpose(out, (0, 2, 1)).astype(jnp.float32)


class PatchTST(_PatchBase):
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

        h = self._encode(xz, train)
        # flatten in the reference's (C, D, P) feature order (PatchTST.py:
        # 199-205 permutes (B,C,P,D)->(B,C,D,P) before flattening) so
        # imported/exported projection weights line up index-for-index
        h = jnp.swapaxes(h, 2, 3).reshape(b, -1)
        h = nn.Dropout(cfg.dropout)(h, deterministic=not train)
        out = nn.Dense(cfg.num_class, dtype=dt, name="projection",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(h.shape[-1]))(h)
        return out.astype(jnp.float32)


class PatchTSTForecaster(_PatchBase):
    """Forecast branch (reference PatchTST.py:79-110 + forward :210-212):
    detached NS-normalization, channel-independent encoder, FlattenHead to
    pred_len, de-normalize. Unreachable from the reference CLI; provided for
    library-surface parity."""

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, train: bool = False):
        cfg = self.config
        xz, mean, std = ns_norm(x_enc)
        h = self._encode(xz, train)
        out = self._flatten_head(h, cfg.pred_len, train)
        return out * std + mean


class PatchTSTImputer(_PatchBase):
    """Imputation branch (reference PatchTST.py:112-147): masked
    NS-normalization, FlattenHead back to seq_len, de-normalize."""

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, mask=None, train: bool = False):
        if mask is None:
            mask = jnp.ones_like(x_enc)
        xz, mean, std = masked_ns_norm(x_enc, mask)
        h = self._encode(xz, train)
        out = self._flatten_head(h, x_enc.shape[1], train)
        return out * std + mean


class PatchTSTAnomalyDetector(_PatchBase):
    """Anomaly branch (reference PatchTST.py:149-179): the imputer's network
    with unmasked normalization."""

    @nn.compact
    def __call__(self, x_enc, train: bool = False):
        xz, mean, std = ns_norm(x_enc)
        h = self._encode(xz, train)
        out = self._flatten_head(h, x_enc.shape[1], train)
        return out * std + mean
