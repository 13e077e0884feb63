"""Fully Convolutional Network backbone (reference model/FullyConvNet.py:7-59).

Three Conv1d(k=8/5/3; or 3/3/2 when seq_len<=10) + BN + ReLU blocks over time,
global average pool, linear head. VALID padding like torch's default Conv1d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import (BatchNorm, torch_default_bias_init,
                                   torch_default_kernel_init)


class FullyConvNetwork(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        kernels = (3, 3, 2) if cfg.seq_len <= 10 else (8, 5, 3)
        feats = (128, 256, 128)
        h = x.astype(dt)  # (B, T, C): conv over time, channels last
        for i, (k, f) in enumerate(zip(kernels, feats)):
            h = nn.Conv(f, (k,), padding="VALID", dtype=dt, name=f"conv{i+1}",
                        kernel_init=torch_default_kernel_init(),
                        bias_init=torch_default_bias_init(k * h.shape[-1]))(h)
            h = BatchNorm(use_running_average=not train, dtype=dt,
                          name=f"bn{i+1}")(h)
            h = jax.nn.relu(h)
        h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1)
        out = nn.Dense(cfg.num_class, dtype=dt, name="fc",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(h.shape[-1]))(h)
        return out.astype(jnp.float32)
