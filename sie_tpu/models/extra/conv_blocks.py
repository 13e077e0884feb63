"""Standalone 2D Inception blocks (library-surface parity).

Parity target: `layers/Conv_Blocks.py:5-60`. `Inception_Block_V1` is the
block TimesNet uses — inside this rebuild it lives as the fused
`InceptionConvSeq` (models/timesnet.py) specialized for the traced
period-fold; the standalone modules here are the generic 2D library
surface, including the otherwise-unused `Inception_Block_V2`
(separable 1xk / kx1 kernel pairs + a 1x1, mean-aggregated).

Channel-last layout (B, H, W, C) per JAX convention; the mean over
branches is taken after stacking, exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class InceptionBlockV1(nn.Module):
    """Parallel odd square kernels 1,3,...,2K-1, same-padded, averaged
    (reference Conv_Blocks.py:5-30)."""

    out_channels: int
    num_kernels: int = 6

    @nn.compact
    def __call__(self, x):
        res = [nn.Conv(self.out_channels, (2 * i + 1, 2 * i + 1),
                       padding="SAME", kernel_init=_KAIMING,
                       name=f"kernel_{i}")(x)
               for i in range(self.num_kernels)]
        return jnp.stack(res, axis=-1).mean(axis=-1)


class InceptionBlockV2(nn.Module):
    """Separable variant: pairs of (1, 2i+3) and (2i+3, 1) kernels plus a
    final 1x1, averaged (reference Conv_Blocks.py:33-60)."""

    out_channels: int
    num_kernels: int = 6

    @nn.compact
    def __call__(self, x):
        res = []
        for i in range(self.num_kernels // 2):
            k = 2 * i + 3
            res.append(nn.Conv(self.out_channels, (1, k), padding="SAME",
                               kernel_init=_KAIMING,
                               name=f"kernel_{2 * i}")(x))
            res.append(nn.Conv(self.out_channels, (k, 1), padding="SAME",
                               kernel_init=_KAIMING,
                               name=f"kernel_{2 * i + 1}")(x))
        res.append(nn.Conv(self.out_channels, (1, 1), kernel_init=_KAIMING,
                           name=f"kernel_{2 * (self.num_kernels // 2)}")(x))
        return jnp.stack(res, axis=-1).mean(axis=-1)
