"""1D ResNet backbone (reference model/ResNet.py:43-83).

Stem conv7/stride2 + maxpool, three BasicBlocks (64/128/128, all stride 1),
global average pool, linear head. The reference's `rearrange('b c t -> b t c')`
on a (B, T, C) input is a label swap that lands channels on dim 1 — i.e. it
convolves over time with the EEG channels as conv channels; we do the same with
channels-last layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.layers import (BatchNorm, torch_default_bias_init,
                                   torch_default_kernel_init)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        identity = x
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1,), strides=(self.stride,),
                               use_bias=False, dtype=dt, name="short_conv",
                               kernel_init=torch_default_kernel_init())(x)
            identity = BatchNorm(use_running_average=not train, dtype=dt,
                                 name="short_bn")(identity)
        h = nn.Conv(self.features, (3,), strides=(self.stride,), padding="SAME",
                    use_bias=False, dtype=dt, name="conv1",
                    kernel_init=torch_default_kernel_init())(x)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3,), padding="SAME", use_bias=False,
                    dtype=dt, name="conv2",
                    kernel_init=torch_default_kernel_init())(h)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="bn2")(h)
        return jax.nn.relu(h + identity)


class ResNet(nn.Module):
    config: Config

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        cfg = self.config
        dt = cfg.compute_dtype
        h = x.astype(dt)  # (B, T, C)
        # explicit (3,3)/(1,1) pads = torch's padding=3 / padding=1 window
        # alignment (reference ResNet.py:48,51); SAME keeps the same output
        # length but shifts the stride-2 windows by one at even lengths
        h = nn.Conv(64, (7,), strides=(2,), padding=((3, 3),), use_bias=False,
                    dtype=dt, name="conv1",
                    kernel_init=torch_default_kernel_init())(h)
        h = BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(h, (3,), strides=(2,), padding=((1, 1),))
        for i, f in enumerate((64, 128, 128)):
            h = BasicBlock(f, 1, dt, name=f"layer{i+1}")(h, train=train)
        h = jnp.mean(h, axis=1)
        out = nn.Dense(cfg.num_class, dtype=dt, name="fc",
                       kernel_init=torch_default_kernel_init(),
                       bias_init=torch_default_bias_init(h.shape[-1]))(h)
        return out.astype(jnp.float32)
