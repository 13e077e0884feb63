"""Pyraformer: pyramidal attention encoder (PAM-Naive).

Parity target (dormant in the reference): `layers/Pyraformer_EncDec.py` —
`get_mask`/`refer_points` (pyramid graph construction), `RegularMask`,
`EncoderLayer`, `Encoder`, `ConvLayer`, `Bottleneck_Construct`,
`PositionwiseFeedForward`.

TPU re-design notes:
- The pyramid's intra/inter-scale adjacency mask and the per-position
  gather indexes are built host-side in numpy from static (seq_len,
  window_size, inner_size) and enter the jit as constants — there is no
  data-dependent structure.
- Attention is a plain masked softmax attention (additive -inf mask);
  the pyramid total length (sum of all scales) stays static.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.models.layers import BatchNorm, DataEmbedding


@lru_cache(maxsize=None)
def pyramid_sizes(input_size: int, window_size: tuple) -> tuple:
    sizes = [input_size]
    for w in window_size:
        sizes.append(int(math.floor(sizes[-1] / w)))
    return tuple(sizes)


@lru_cache(maxsize=None)
def get_mask(input_size: int, window_size: tuple, inner_size: int):
    """Boolean adjacency (True = KEEP, inverted vs the reference which
    returns True = masked) of the PAM-Naive graph
    (reference Pyraformer_EncDec.py:10-47)."""
    all_size = pyramid_sizes(input_size, window_size)
    seq_len = sum(all_size)
    mask = np.zeros((seq_len, seq_len), dtype=bool)

    inner = inner_size // 2
    for layer_idx, size in enumerate(all_size):
        start = sum(all_size[:layer_idx])
        for i in range(start, start + size):
            left = max(i - inner, start)
            right = min(i + inner + 1, start + size)
            mask[i, left:right] = True

    for layer_idx in range(1, len(all_size)):
        start = sum(all_size[:layer_idx])
        prev = all_size[layer_idx - 1]
        for i in range(start, start + all_size[layer_idx]):
            left = (start - prev) + (i - start) * window_size[layer_idx - 1]
            if i == start + all_size[layer_idx] - 1:
                right = start
            else:
                right = (start - prev) + (i - start + 1) \
                    * window_size[layer_idx - 1]
            mask[i, left:right] = True
            mask[left:right, i] = True
    return mask, all_size


@lru_cache(maxsize=None)
def refer_points(all_sizes: tuple, window_size: tuple) -> np.ndarray:
    """For each base position, the index of its ancestor at every scale
    (reference Pyraformer_EncDec.py:50-67). Shape (input_size, n_scales)."""
    input_size = all_sizes[0]
    indexes = np.zeros((input_size, len(all_sizes)), dtype=np.int64)
    for i in range(input_size):
        indexes[i, 0] = i
        former = i
        for j in range(1, len(all_sizes)):
            start = sum(all_sizes[:j])
            inner_idx = former - (start - all_sizes[j - 1])
            former = start + min(inner_idx // window_size[j - 1],
                                 all_sizes[j] - 1)
            indexes[i, j] = former
    return indexes


class PositionwiseFeedForward(nn.Module):
    """Two-layer GELU FFN, pre- or post-norm (reference
    Pyraformer_EncDec.py:190-218)."""

    d_in: int
    d_hid: int
    dropout: float = 0.1
    normalize_before: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        residual = x
        norm = nn.LayerNorm(epsilon=1e-6, name="layer_norm")
        if self.normalize_before:
            x = norm(x)
        x = drop(jax.nn.gelu(nn.Dense(self.d_hid, name="w_1")(x)))
        x = drop(nn.Dense(self.d_in, name="w_2")(x))
        x = x + residual
        if not self.normalize_before:
            x = norm(x)
        return x


class PyraformerEncoderLayer(nn.Module):
    """Masked full attention + FFN (reference Pyraformer_EncDec.py:78-96)."""

    d_model: int
    d_inner: int
    n_heads: int
    dropout: float = 0.1
    normalize_before: bool = False

    @nn.compact
    def __call__(self, x, keep_mask, *, train: bool = False):
        h = self.n_heads
        dk = self.d_model // h
        dense = lambda name: nn.Dense(dk * h, name=name)
        q = dense("query")(x).reshape(*x.shape[:2], h, dk)
        k = dense("key")(x).reshape(*x.shape[:2], h, dk)
        v = dense("value")(x).reshape(*x.shape[:2], h, dk)
        scores = jnp.einsum("blhe,bshe->bhls", q, k,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(keep_mask[None, None], scores, -1e9)
        a = jax.nn.softmax(scores / math.sqrt(dk), axis=-1)
        a = nn.Dropout(self.dropout)(a, deterministic=not train)
        out = jnp.einsum("bhls,bshd->blhd", a, v)
        out = nn.Dense(self.d_model, name="out")(
            out.reshape(*x.shape[:2], h * dk))
        return PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout,
            self.normalize_before, name="pos_ffn")(out, train=train)


class PyraformerConvLayer(nn.Module):
    """Stride-w downsampling conv + BN + ELU (reference
    Pyraformer_EncDec.py:138-152). Channel-last (B, T, C)."""

    c_in: int
    window_size: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.c_in, (self.window_size,),
                    strides=(self.window_size,), padding="VALID",
                    name="downConv")(x)
        h = BatchNorm(use_running_average=not train, name="norm")(h)
        return jax.nn.elu(h)


class BottleneckConstruct(nn.Module):
    """Bottleneck CSCM: down-project, build the coarser scales by strided
    convs, up-project, concat all scales, LayerNorm (reference
    Pyraformer_EncDec.py:155-187)."""

    d_model: int
    window_size: tuple
    d_inner: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):          # (B, T, D)
        tmp = nn.Dense(self.d_inner, name="down")(x)
        scales = []
        for i, w in enumerate(self.window_size):
            tmp = PyraformerConvLayer(self.d_inner, w,
                                      name=f"conv_{i}")(tmp, train=train)
            scales.append(tmp)
        up = nn.Dense(self.d_model, name="up")(
            jnp.concatenate(scales, axis=1))
        return nn.LayerNorm(name="norm")(
            jnp.concatenate([x, up], axis=1))


class PyraformerEncoder(nn.Module):
    """Full PAM-Naive encoder (reference Pyraformer_EncDec.py:99-135):
    embed -> bottleneck pyramid -> masked attention layers -> gather each
    base position's ancestors across scales and concat features."""

    seq_len: int
    d_model: int
    n_heads: int
    d_ff: int
    e_layers: int = 2
    window_size: tuple = (4, 4)
    inner_size: int = 5
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x_enc, x_mark_enc=None, *, train: bool = False):
        keep_mask, all_size = get_mask(self.seq_len, tuple(self.window_size),
                                       self.inner_size)
        indexes = refer_points(tuple(all_size), tuple(self.window_size))
        keep_mask = jnp.asarray(keep_mask)
        idx = jnp.asarray(indexes)                          # (T, n_scales)

        seq = DataEmbedding(self.d_model, dropout=self.dropout,
                            name="enc_embedding")(x_enc, x_mark_enc,
                                                  train=train)
        seq = BottleneckConstruct(self.d_model, tuple(self.window_size),
                                  self.d_model // 4,
                                  name="conv_layers")(seq, train=train)
        for i in range(self.e_layers):
            seq = PyraformerEncoderLayer(
                self.d_model, self.d_ff, self.n_heads, self.dropout,
                normalize_before=False, name=f"layer_{i}")(
                    seq, keep_mask, train=train)
        # (B, T, n_scales, D) gather -> concat scales on features
        gathered = seq[:, idx.reshape(-1), :].reshape(
            seq.shape[0], idx.shape[0], idx.shape[1], self.d_model)
        return gathered.reshape(seq.shape[0], idx.shape[0],
                                idx.shape[1] * self.d_model)
