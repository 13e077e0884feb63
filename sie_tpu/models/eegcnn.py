"""EEGNet-style CNN (+ optional Transformer encoder) baseline
(reference model/eegcnn.py:30-247).

Architecture (intended semantics — the reference feeds the CNN a transposed
tensor by accident; see SURVEY.md SS2.3 'EEGCNN' and the adapter bug note):

  (B, T, C) -> (B, C, T) -> temporal Conv2d (1 x k1, 'same') -> BN
  -> depthwise spatial conv over all channels (C x 1, groups=F1) -> BN -> ELU
  -> AvgPool (1 x P1) -> Dropout
  -> separable conv: depthwise (1 x k2, 'same') + pointwise 1x1 -> BN -> ELU
  -> AvgPool (1 x P2) -> Dropout
  -> optional torch-style TransformerEncoder with sinusoidal positions
  -> pooling (None/mean/sum/top) -> linear classifier.

Depthwise convs map to `feature_group_count` XLA convolutions (MXU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.info import ModelInfo
from sie_tpu.models.layers import (
    BatchNorm,
    TorchTransformerEncoderLayer,
    sinusoidal_embedding,
    torch_default_bias_init,
    torch_default_kernel_init,
)


class EEGcnn(nn.Module):
    """Feature extractor (reference model/eegcnn.py:30-108)."""

    config: Config

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        f1, d = cfg.eegcnn_cnn_f1, cfg.eegcnn_cnn_f2
        f2 = f1 * d
        chans = cfg.enc_in

        # x: (B, C, T) -> NHWC image (B, H=C, W=T, 1)
        h = x[..., None].astype(dt)
        ki = dict(kernel_init=torch_default_kernel_init())
        h = nn.Conv(f1, (1, cfg.eegcnn_kernel1), padding="SAME", use_bias=False,
                    dtype=dt, name="block1_conv1", **ki)(h)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="block1_bn1")(h)
        h = nn.Conv(d * f1, (chans, 1), padding="VALID", feature_group_count=f1,
                    use_bias=False, dtype=dt, name="block1_depthwise", **ki)(h)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="block1_bn2")(h)
        h = jax.nn.elu(h)
        h = nn.avg_pool(h, (1, cfg.eegcnn_pool1), strides=(1, cfg.eegcnn_pool1))
        h = nn.Dropout(cfg.eegcnn_dropout1)(h, deterministic=not train)

        h = nn.Conv(d * f1, (1, cfg.eegcnn_kernel2), padding="SAME",
                    feature_group_count=d * f1, use_bias=False, dtype=dt,
                    name="block2_conv1", **ki)(h)
        h = nn.Conv(f2, (1, 1), use_bias=False, dtype=dt, name="block2_conv2",
                    **ki)(h)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="block2_bn")(h)
        h = jax.nn.elu(h)
        h = nn.avg_pool(h, (1, cfg.eegcnn_pool2), strides=(1, cfg.eegcnn_pool2))
        h = nn.Dropout(cfg.eegcnn_dropout1)(h, deterministic=not train)
        return h[:, 0]  # (B, T_reduced, F2)


class EEGCNNTransformer(nn.Module):
    """Classifier head (reference model/eegcnn.py:111-247).

    d_model semantics (reference :147,211-213,230-236): with encoder layers,
    the model width is `configs.d_model` (512 on real configs) and the CNN
    output (F2=F1*D=64) is projected up via `cnn_projection`; without encoder
    layers the width stays at the CNN output.

    padding-mask semantics (reference :257-297): the (B, T) mask is pooled
    down to the CNN's reduced length, complements into
    `src_key_padding_mask`, and weights the mean/sum poolings. The reference
    pools with `avg_pool1d(kernel=5, stride=2)` annotated "rough estimate"
    (:262) — that yields length ~T/2, mismatching the CNN's T/(P1*P2)
    reduction, so any real mask crashes upstream. We implement the intended
    semantics: pool by the CNN's actual reduction (P1 then P2), threshold at
    0.5 (documented in README "Reference parity notes").
    """

    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False,
                 gating_value=None):
        cfg = self.config
        dt = cfg.compute_dtype
        h = EEGcnn(cfg, name="eegcnn")(jnp.transpose(x, (0, 2, 1)), train=train)
        b, t_red, f2 = h.shape

        if padding_mask is not None:
            m = padding_mask.astype(jnp.float32)[..., None]  # (B, T, 1)
            m = nn.avg_pool(m, (cfg.eegcnn_pool1,), strides=(cfg.eegcnn_pool1,))
            m = nn.avg_pool(m, (cfg.eegcnn_pool2,), strides=(cfg.eegcnn_pool2,))
            mask = m[:, :t_red, 0] > 0.5  # (B, t_red)
        else:
            mask = jnp.ones((b, t_red), bool)

        if cfg.eegcnn_layers > 0:
            d_model = f2 if cfg.d_model is None else cfg.d_model
            if d_model != f2:
                h = nn.Dense(d_model, dtype=dt, name="cnn_projection",
                             kernel_init=torch_default_kernel_init(),
                             bias_init=torch_default_bias_init(f2))(h)
            pe = jnp.asarray(sinusoidal_embedding(t_red, d_model), dtype=h.dtype)
            h = nn.Dropout(cfg.eegcnn_dropout2)(h + pe[None],
                                                deterministic=not train)
            for i in range(cfg.eegcnn_layers):
                h = TorchTransformerEncoderLayer(
                    d_model, cfg.eegcnn_n_heads, cfg.eegcnn_d_ff,
                    cfg.eegcnn_dropout2, dtype=dt,
                    name=f"encoder_{i}")(h, mask, train=train)

        pool = cfg.eegcnn_pooling
        mf = mask.astype(h.dtype)[..., None]  # (B, t_red, 1)
        if pool is None or pool == "none":
            h = h.reshape(b, -1)
        elif pool == "mean":
            h = jnp.sum(h * mf, axis=1) / jnp.maximum(jnp.sum(mf, axis=1), 1)
        elif pool == "sum":
            h = jnp.sum(h * mf, axis=1)
        elif pool == "top":
            h = h[:, 0, :]
        else:
            raise ValueError(f"unsupported pooling {pool!r}")

        logits = nn.Dense(cfg.num_class, dtype=dt, name="classifier",
                          kernel_init=torch_default_kernel_init(),
                          bias_init=torch_default_bias_init(h.shape[-1]))(h)
        logits = logits.astype(jnp.float32)
        return logits, ModelInfo(preds=logits, loss=jnp.zeros((1,), jnp.float32))
