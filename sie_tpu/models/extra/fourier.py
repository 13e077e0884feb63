"""FEDformer frequency-domain blocks (Fourier-enhanced attention).

Parity targets (dormant in the reference): `layers/FourierCorrelation.py`
(`get_frequency_modes`, `FourierBlock`, `FourierCrossAttention`) and the
weightless `FourierCrossAttentionW` inside `layers/MultiWaveletCorrelation.py:
397-456`.

TPU re-design notes:
- Mode selection is host-side and static; the per-mode Python loops with
  scatter into a zeros buffer (`FourierCorrelation.py:70-76,130-141`) become
  one gather + one complex einsum + one `.at[].set` scatter on the frequency
  axis — XLA sees three fused ops, no loop.
- 'random' mode selection uses an explicit seed (default 0) instead of the
  reference's global `np.random.shuffle`, so runs are reproducible.
- Complex math uses native complex64 (jnp.fft/rfft), not the reference's
  manual real/imag einsum pairs — identical arithmetic, half the code.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_frequency_modes(seq_len: int, modes: int = 64,
                        mode_select_method: str = "random",
                        seed: int = 0):
    """Select `modes` rfft bins of a length-`seq_len` signal (reference
    FourierCorrelation.py:10-24). 'random' samples without replacement
    (seeded); anything else takes the lowest bins."""
    modes = min(modes, seq_len // 2)
    if mode_select_method == "random":
        index = list(np.random.default_rng(seed).permutation(seq_len // 2)
                     [:modes])
    else:
        index = list(range(modes))
    index.sort()
    return [int(i) for i in index]


def _complex_weight(layer: nn.Module, name: str, shape, scale: float):
    """Real/imag pair stored as two real params (reference keeps weights1/2
    real and builds the complex tensor at use time)."""
    init = lambda key, shp: scale * jax.random.uniform(key, shp, jnp.float32)
    wr = layer.param(f"{name}_real", init, shape)
    wi = layer.param(f"{name}_imag", init, shape)
    return jax.lax.complex(wr, wi)


class FourierBlock(nn.Module):
    """Frequency-domain representation learning: rfft -> per-mode complex
    linear map -> irfft (reference FourierCorrelation.py:28-79). Acts as a
    drop-in self-attention: (q, k, v) in (B, L, H, E), only q is used."""

    in_channels: int
    out_channels: int
    seq_len: int
    modes: int = 0
    mode_select_method: str = "random"
    n_heads: int = 8
    seed: int = 0

    @nn.compact
    def __call__(self, q, k=None, v=None, *, train: bool = False):
        b, l, h, e = q.shape
        index = get_frequency_modes(self.seq_len, self.modes,
                                    self.mode_select_method, self.seed)
        scale = 1.0 / (self.in_channels * self.out_channels)
        w = _complex_weight(
            self, "weights",
            (self.n_heads, self.in_channels // self.n_heads,
             self.out_channels // self.n_heads, len(index)), scale)

        x = q.transpose(0, 2, 3, 1).astype(jnp.float32)     # (B, H, E, L)
        x_ft = jnp.fft.rfft(x)                              # (B, H, E, F)
        keep = [wi for wi, i in enumerate(index) if i < x_ft.shape[-1]]
        idx = jnp.asarray([index[wi] for wi in keep], jnp.int32)
        sel = x_ft[..., idx]                                # (B, H, E, M)
        out_sel = jnp.einsum("bhim,hiom->bhom", sel, w[..., jnp.asarray(keep)])
        out_ft = jnp.zeros((b, h, e, l // 2 + 1), jnp.complex64)
        out_ft = out_ft.at[..., idx].set(out_sel)
        out = jnp.fft.irfft(out_ft, n=l)                    # (B, H, E, L)
        return out.transpose(0, 3, 1, 2).astype(q.dtype), None


class FourierCrossAttention(nn.Module):
    """Frequency-domain cross attention with learned output weights
    (reference FourierCorrelation.py:82-171): gather q/k modes, attention
    score q_ft k_ft^H with tanh or softmax activation, apply to k_ft,
    per-mode complex linear map, scatter back, irfft."""

    in_channels: int
    out_channels: int
    seq_len_q: int
    seq_len_kv: int
    modes: int = 64
    mode_select_method: str = "random"
    activation: str = "tanh"
    n_heads: int = 8
    seed: int = 0

    @nn.compact
    def __call__(self, q, k, v=None, *, train: bool = False):
        b, l, h, e = q.shape
        index_q = get_frequency_modes(self.seq_len_q, self.modes,
                                      self.mode_select_method, self.seed)
        index_kv = get_frequency_modes(self.seq_len_kv, self.modes,
                                       self.mode_select_method, self.seed + 1)
        scale = 1.0 / (self.in_channels * self.out_channels)
        w = _complex_weight(
            self, "weights",
            (self.n_heads, self.in_channels // self.n_heads,
             self.out_channels // self.n_heads, len(index_q)), scale)

        xq = q.transpose(0, 2, 3, 1).astype(jnp.float32)    # (B, H, E, L)
        xk = k.transpose(0, 2, 3, 1).astype(jnp.float32)
        xq_ft = jnp.fft.rfft(xq)
        xk_ft = jnp.fft.rfft(xk)
        keep_q = [wi for wi, i in enumerate(index_q) if i < xq_ft.shape[-1]]
        iq = jnp.asarray([index_q[wi] for wi in keep_q], jnp.int32)
        ikv = jnp.asarray([i for i in index_kv if i < xk_ft.shape[-1]],
                          jnp.int32)
        xq_sel = xq_ft[..., iq]
        xk_sel = xk_ft[..., ikv]

        # NB (parity quirk kept): the reference's compl_mul1d does NOT
        # conjugate k — the frequency "score" is q_ft * k_ft, not the
        # Hermitian inner product (FourierCorrelation.py:146).
        xqk = jnp.einsum("bhex,bhey->bhxy", xq_sel, xk_sel)
        if self.activation == "tanh":
            xqk = jax.lax.complex(jnp.tanh(xqk.real), jnp.tanh(xqk.imag))
        elif self.activation == "softmax":
            xqk = jax.nn.softmax(jnp.abs(xqk), axis=-1).astype(jnp.complex64)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        xqkv = jnp.einsum("bhxy,bhey->bhex", xqk, xk_sel)
        xqkvw = jnp.einsum("bhex,heox->bhox", xqkv,
                           w[..., jnp.asarray(keep_q, jnp.int32)])
        out_ft = jnp.zeros((b, h, e, l // 2 + 1), jnp.complex64)
        out_ft = out_ft.at[..., iq].set(xqkvw)
        out = jnp.fft.irfft(
            out_ft / self.in_channels / self.out_channels, n=l)
        return out.transpose(0, 3, 1, 2).astype(q.dtype), None


class FourierCrossAttentionW(nn.Module):
    """Weightless frequency-domain cross attention used inside the
    multiwavelet cross block (reference MultiWaveletCorrelation.py:397-456).
    Operates on (B, L, E, H) and always keeps the lowest modes."""

    in_channels: int
    out_channels: int
    modes: int = 16
    activation: str = "tanh"

    @nn.compact
    def __call__(self, q, k, v=None, *, train: bool = False):
        b, l, e, h = q.shape
        lkv = k.shape[1]
        mq = min(l // 2, self.modes)
        mkv = min(lkv // 2, self.modes)

        xq = q.transpose(0, 3, 2, 1).astype(jnp.float32)    # (B, H, E, L)
        xk = k.transpose(0, 3, 2, 1).astype(jnp.float32)
        xq_sel = jnp.fft.rfft(xq)[..., :mq]
        xk_sel = jnp.fft.rfft(xk)[..., :mkv]

        xqk = jnp.einsum("bhex,bhey->bhxy", xq_sel, xk_sel)
        if self.activation == "tanh":
            xqk = jax.lax.complex(jnp.tanh(xqk.real), jnp.tanh(xqk.imag))
        elif self.activation == "softmax":
            xqk = jax.nn.softmax(jnp.abs(xqk), axis=-1).astype(jnp.complex64)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        xqkv = jnp.einsum("bhxy,bhey->bhex", xqk, xk_sel)
        out_ft = jnp.zeros((b, h, e, l // 2 + 1), jnp.complex64)
        out_ft = out_ft.at[..., :mq].set(xqkv)
        out = jnp.fft.irfft(
            out_ft / self.in_channels / self.out_channels, n=l)
        return out.transpose(0, 3, 2, 1).astype(q.dtype), None
