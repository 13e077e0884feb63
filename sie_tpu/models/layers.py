"""Primitive NN layers: embeddings, attention, encoder stacks.

TPU re-implementations of the reference layer library (`layers/Embed.py`,
`layers/SelfAttention_Family.py:48-213`, `layers/Transformer_EncDec.py:27-80`)
as flax modules. Only the layers actually used by the model zoo are built; the
reference's dead TSlib leftovers (Autoformer/ETSformer/Pyraformer/Crossformer/
FEDformer blocks) are intentionally omitted (SURVEY.md SS2.4).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_embedding(length: int, d_model: int) -> np.ndarray:
    """Classic sin/cos table (reference layers/Embed.py:8-27)."""
    pe = np.zeros((length, d_model), dtype=np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: pe[:, 1::2].shape[1]])
    return pe


class TokenEmbedding(nn.Module):
    """Circular Conv1d token embedding (reference layers/Embed.py:29-42)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        # circular padding of 1 on each side of time, then VALID k=3 conv
        xp = jnp.concatenate([x[:, -1:, :], x, x[:, :1, :]], axis=1)
        return nn.Conv(self.d_model, (3,), padding="VALID", use_bias=False,
                       kernel_init=nn.initializers.variance_scaling(
                           2.0 / (1 + 0.01 ** 2), "fan_in", "normal"),
                       dtype=self.dtype, name="tokenConv")(xp)


class DataEmbedding(nn.Module):
    """token + positional (+ time-feature) embedding (reference Embed.py:109-126).

    Classification call sites always pass x_mark=None, so the temporal branch is
    only exercised when marks are supplied.
    """

    d_model: int
    embed_type: str = "timeF"
    freq: str = "h"
    dropout: float = 0.1
    positional: bool = True   # False = the reference's DataEmbedding_wo_pos
    # (Embed.py:129-146), used by the Autoformer/FEDformer family whose
    # auto-correlation is position-aware by construction
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mark=None, *, train: bool = False):
        v = TokenEmbedding(self.d_model, dtype=self.dtype)(x)
        out = v
        if self.positional:
            pe = jnp.asarray(sinusoidal_embedding(x.shape[1], self.d_model),
                             dtype=v.dtype)
            out = out + pe[None]
        if x_mark is not None:
            freq_map = {"h": 4, "t": 5, "s": 6, "m": 1, "a": 1, "w": 2, "d": 3, "b": 3}
            mark = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                            kernel_init=torch_default_kernel_init(),
                            name="temporal_embedding")(x_mark[..., :freq_map[self.freq]])
            out = out + mark
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class FullAttentionLayer(nn.Module):
    """QKV projections + scaled-dot-product full attention
    (reference SelfAttention_Family.py:48-75 + 179-213, mask_flag=False path).

    Default compute path on TPU is the FUSED full-row Pallas kernel
    (`ops/pallas/attention_pallas.py`, use_fused): exact one-pass softmax per
    q-block against the whole VMEM-resident K/V, recompute backward,
    in-kernel attention dropout. At T<=2k it removes the (B, H, L, S)
    score/prob HBM round-trips that cap the XLA path at ~23% MFU
    (docs/BENCH_NOTES.md r2) without flash's streaming bookkeeping.

    Optional stock flash path (use_flash, TPU + bf16 + no attention dropout)
    kept for the long-sequence regime: at CHISCO length (845) it measured 3x
    SLOWER than XLA naive (45 vs 15 ms fwd+bwd, batch 64) — opt-in only.
    """

    d_model: int
    n_heads: int
    attention_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused: bool = False
    fused_max_len: int = 4096   # T above this falls back to XLA attention.
    # 0 = unlimited: the kernel then dispatches T > 4096 to its kv-blocked
    # online-softmax variant (same op, same dropout hash — no sequence-
    # length cliff). Gated by default until the blocked variant's COMPILED
    # path is certified on a real chip (interpret-certified only so far —
    # NEXT_STEPS r3), and because in interpret mode (the CPU fallback) a
    # T>4096 blocked grid is far slower than one fused XLA einsum.
    fused_min_len: int = 256    # T BELOW this also falls back to XLA: the
    # kernel grid is one program per (batch*head) row-block, so short-T /
    # huge-BH shapes degenerate into tens of thousands of tiny launches.
    # Measured r4 (PatchTST channel-independent step, BH=16384, T=105):
    # fused 955.8 ms vs XLA 659.0 ms — while at the flagship shape (BH=512,
    # T=845) the kernel wins 9.8 vs 21 ms (docs/BENCH_NOTES.md).
    causal: bool = False        # TriangularCausalMask (mask_flag=True path,
    # reference SelfAttention_Family.py:63-67 + utils/masking.py:4-13)

    def _flash(self, q, k, v, dk):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
        b, l = q.shape[0], q.shape[1]
        l_pad = -(-l // 128) * 128
        pad = l_pad - l
        qt, kt, vt = (jnp.transpose(z, (0, 2, 1, 3)) for z in (q, k, v))
        if pad:
            qt, kt, vt = (jnp.pad(z, ((0, 0), (0, 0), (0, pad), (0, 0)))
                          for z in (qt, kt, vt))
        seg = jnp.zeros((b, l_pad), jnp.int32)
        if pad:
            seg = seg.at[:, l:].set(1)
        out = flash_attention(qt, kt, vt, segment_ids=SegmentIds(seg, seg),
                              sm_scale=1.0 / math.sqrt(dk))
        return jnp.transpose(out[:, :, :l, :], (0, 2, 1, 3))

    @nn.compact
    def __call__(self, q_in, k_in, v_in, *, train: bool = False):
        h = self.n_heads
        dk = self.d_model // h
        # reference AttentionLayer projections are plain nn.Linear
        # (SelfAttention_Family.py:185-191) -> torch default init
        tl = dict(kernel_init=torch_default_kernel_init(),
                  bias_init=torch_default_bias_init(self.d_model))
        dense = lambda name: nn.Dense(dk * h, dtype=self.dtype, name=name,
                                      **tl)
        q = dense("query")(q_in).reshape(*q_in.shape[:2], h, dk)
        k = dense("key")(k_in).reshape(*k_in.shape[:2], h, dk)
        v = dense("value")(v_in).reshape(*v_in.shape[:2], h, dk)

        use_flash = (self.use_flash and not self.causal
                     and self.dtype == jnp.bfloat16
                     and (self.attention_dropout == 0.0 or not train)
                     and q_in.shape[1] == k_in.shape[1]
                     and dk in (64, 128, 256)
                     and jax.default_backend() == "tpu")
        use_fused = (self.use_fused and not use_flash and not self.causal
                     and q_in.shape[1] == k_in.shape[1]
                     and (self.fused_max_len == 0
                          or q_in.shape[1] <= self.fused_max_len)
                     and q_in.shape[1] >= self.fused_min_len
                     and dk <= 128)
        if use_flash:
            out = self._flash(q, k, v, dk)
        elif use_fused:
            from sie_tpu.ops.pallas.attention_pallas import fused_attention
            b, l = q.shape[0], q.shape[1]
            rate = self.attention_dropout if train else 0.0
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            fold = lambda z: jnp.transpose(z, (0, 2, 1, 3)).reshape(
                b * h, l, dk)
            o = fused_attention(fold(q), fold(k), fold(v), seed,
                                1.0 / math.sqrt(dk), rate)
            out = jnp.transpose(o.reshape(b, h, l, dk), (0, 2, 1, 3))
        else:
            if self.dtype == jnp.bfloat16:
                # torch-autocast parity: the score matrix is STORED bf16
                # (MXU still accumulates f32); softmax reads it upcast.
                # Perf-neutral on v5e (measured 58.1 vs 57.5 ms DNN step) —
                # kept for numerics parity with the reference's autocast bmm.
                scores = jnp.einsum("blhe,bshe->bhls", q, k)
            else:
                scores = jnp.einsum("blhe,bshe->bhls", q, k,
                                    preferred_element_type=jnp.float32)
            scores = scores.astype(jnp.float32)
            if self.causal:
                li = jax.lax.broadcasted_iota(jnp.int32, scores.shape[-2:], 0)
                si = jax.lax.broadcasted_iota(jnp.int32, scores.shape[-2:], 1)
                scores = jnp.where(si > li, -jnp.inf, scores)
            a = jax.nn.softmax(scores / math.sqrt(dk), axis=-1)
            a = nn.Dropout(self.attention_dropout)(a, deterministic=not train)
            out = jnp.einsum("bhls,bshd->blhd", a.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(*q_in.shape[:2], h * dk).astype(self.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out",
                        kernel_init=torch_default_kernel_init(),
                        bias_init=torch_default_bias_init(h * dk))(out)


class EncoderLayer(nn.Module):
    """Post-norm attention + pointwise-conv FFN (reference Transformer_EncDec.py:27-51)."""

    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused: bool = False
    fused_max_len: int = 4096   # threaded to FullAttentionLayer
    fused_min_len: int = 256    # threaded to FullAttentionLayer
    variant: str = "full"   # full | ds | prob | lsh — swaps the inner
    # attention for a sie_tpu.models.extra variant (beyond-reference
    # wiring: the reference defines these layers but never reaches them)
    moe_experts: int = 0    # >0 replaces the dense FFN with a Switch-style
    # mixture of `moe_experts` expert FFNs (models/moe.py) whose stacked
    # params shard over an 'expert' mesh axis — beyond-reference ep surface
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1
    moe_aux_weight: float = 0.01

    def _attention(self):
        kw = dict(d_model=self.d_model, n_heads=self.n_heads,
                  attention_dropout=self.dropout, dtype=self.dtype)
        if self.variant == "ds":
            from sie_tpu.models.extra.attention_variants import \
                DSAttentionLayer
            return DSAttentionLayer(**kw)
        if self.variant == "prob":
            from sie_tpu.models.extra.attention_variants import \
                ProbAttentionLayer
            return ProbAttentionLayer(**kw)
        if self.variant == "lsh":
            from sie_tpu.models.extra.attention_variants import \
                LSHAttentionLayer
            return LSHAttentionLayer(**kw)
        return FullAttentionLayer(use_flash=self.use_flash,
                                  use_fused=self.use_fused,
                                  fused_max_len=self.fused_max_len,
                                  fused_min_len=self.fused_min_len, **kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        inner = self._attention()
        if self.variant == "lsh":
            attn = inner(x, train=train)        # shared-QK self-attention
        else:
            attn = inner(x, x, x, train=train)
        x = x + drop(attn)
        x = y = nn.LayerNorm(name="norm1")(x)
        if self.moe_experts > 0:
            from sie_tpu.models.moe import MoEFFN
            y = MoEFFN(self.d_model, self.d_ff, self.moe_experts,
                       self.moe_capacity_factor, self.moe_top_k,
                       self.dropout, self.activation,
                       self.moe_aux_weight, dtype=self.dtype,
                       name="moe_ffn")(y, train=train)
            y = drop(y)
        else:
            act = jax.nn.relu if self.activation == "relu" else jax.nn.gelu
            # reference FFN is Conv1d(k=1) pairs (Transformer_EncDec.py:31-32)
            # -> torch Conv1d default init, fan_in = in_channels
            y = drop(act(nn.Dense(
                self.d_ff, dtype=self.dtype, name="conv1",
                kernel_init=torch_default_kernel_init(),
                bias_init=torch_default_bias_init(self.d_model))(y)))
            y = drop(nn.Dense(
                self.d_model, dtype=self.dtype, name="conv2",
                kernel_init=torch_default_kernel_init(),
                bias_init=torch_default_bias_init(self.d_ff))(y))
        return nn.LayerNorm(name="norm2")(x + y)


class Encoder(nn.Module):
    """Stack of EncoderLayers + final LayerNorm (reference Transformer_EncDec.py:54-80)."""

    d_model: int
    d_ff: int
    n_heads: int
    e_layers: int
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused: bool = False
    fused_max_len: int = 4096
    fused_min_len: int = 256
    variant: str = "full"
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1
    moe_aux_weight: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` is positional-or-keyword so nn.remat(static_argnums=(2,))
        # can mark it static (PatchTST remats this encoder).
        for i in range(self.e_layers):
            x = EncoderLayer(self.d_model, self.d_ff, self.n_heads,
                             self.dropout, self.activation, self.dtype,
                             self.use_flash, self.use_fused,
                             self.fused_max_len, self.fused_min_len,
                             self.variant,
                             self.moe_experts, self.moe_capacity_factor,
                             self.moe_top_k, self.moe_aux_weight,
                             name=f"layer_{i}")(x, train=train)
        return nn.LayerNorm(name="norm")(x)


class ConvLayer(nn.Module):
    """Distil downsampling between encoder layers (reference
    Transformer_EncDec.py:6-24): circular conv1d k=3 pad=2 -> BN -> ELU ->
    maxpool k=3 s=2 p=1. Unused by the vanilla-Transformer config (the
    reference builds its Encoder with conv_layers=None) — library surface."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):   # (B, T, D)
        # torch circular padding=2 both sides, then VALID k=3 -> T+2 steps
        xp = jnp.concatenate([x[:, -2:, :], x, x[:, :2, :]], axis=1)
        h = nn.Conv(self.d_model, (3,), padding="VALID", dtype=self.dtype,
                    kernel_init=torch_default_kernel_init(),
                    bias_init=torch_default_bias_init(3 * self.d_model),
                    name="downConv")(xp)
        h = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="norm")(h)
        h = jax.nn.elu(h)
        # maxpool k=3 s=2 p=1 over time (torch default: -inf padding)
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        return nn.max_pool(hp, window_shape=(3,), strides=(2,),
                           padding="VALID")


class DecoderLayer(nn.Module):
    """Causal self-attention + cross-attention + conv1d FFN, post-norm
    (reference Transformer_EncDec.py:83-112)."""

    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cross, *, train: bool = False):
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        self_attn = FullAttentionLayer(
            self.d_model, self.n_heads, attention_dropout=self.dropout,
            dtype=self.dtype, causal=True, name="self_attention")
        x = nn.LayerNorm(name="norm1")(x + drop(self_attn(x, x, x,
                                                          train=train)))
        cross_attn = FullAttentionLayer(
            self.d_model, self.n_heads, attention_dropout=self.dropout,
            dtype=self.dtype, name="cross_attention")
        x = y = nn.LayerNorm(name="norm2")(
            x + drop(cross_attn(x, cross, cross, train=train)))
        act = jax.nn.relu if self.activation == "relu" else jax.nn.gelu
        y = drop(act(nn.Dense(
            self.d_ff, dtype=self.dtype, name="conv1",
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(self.d_model))(y)))
        y = drop(nn.Dense(
            self.d_model, dtype=self.dtype, name="conv2",
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(self.d_ff))(y))
        return nn.LayerNorm(name="norm3")(x + y)


class Decoder(nn.Module):
    """Decoder stack + final LayerNorm + projection (reference
    Transformer_EncDec.py:115-135)."""

    d_model: int
    d_ff: int
    n_heads: int
    d_layers: int
    c_out: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cross, *, train: bool = False):
        for i in range(self.d_layers):
            x = DecoderLayer(self.d_model, self.d_ff, self.n_heads,
                             self.dropout, self.activation, self.dtype,
                             name=f"layer_{i}")(x, cross, train=train)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.c_out, dtype=self.dtype, name="projection",
                        kernel_init=torch_default_kernel_init(),
                        bias_init=torch_default_bias_init(self.d_model))(x)


def torch_default_kernel_init():
    """torch nn.Linear / nn.Conv*d default weight init: kaiming_uniform(a=sqrt(5))
    = U(-1/sqrt(fan_in), 1/sqrt(fan_in)), variance 1/(3*fan_in). flax's
    lecun_normal default has 3x the variance; the difference is a measurable
    convergence-dynamics gap on BN-less layers (docs/PARITY_DESAT.md r5)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    """torch nn.Linear / nn.Conv*d default bias init: U(-1/sqrt(fan_in), ...)."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchTransformerEncoderLayer(nn.Module):
    """Parity with torch.nn.TransformerEncoderLayer defaults (post-norm, ReLU FFN)
    for the EEGCNN head (reference model/eegcnn.py:219-228).

    Init parity (torch MultiheadAttention._reset_parameters + Linear defaults):
    q/k/v = xavier_uniform with zero bias; out_proj weight = Linear default
    with zero bias; linear1/linear2 = Linear defaults incl. the uniform bias."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        h = self.n_heads
        dk = self.d_model // h
        qkv = dict(kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype)
        lin = lambda fan: dict(kernel_init=torch_default_kernel_init(),
                               bias_init=torch_default_bias_init(fan),
                               dtype=self.dtype)
        q = nn.Dense(self.d_model, name="q", **qkv)(x)
        k = nn.Dense(self.d_model, name="k", **qkv)(x)
        v = nn.Dense(self.d_model, name="v", **qkv)(x)
        split = lambda z: z.reshape(*z.shape[:2], h, dk)
        scores = jnp.einsum("blhe,bshe->bhls", split(q), split(k),
                            preferred_element_type=jnp.float32) / math.sqrt(dk)
        if mask is not None:  # mask: (B, S) True=keep
            # Finite fill (not -inf): keeps fully-masked query rows at a
            # uniform softmax instead of NaN, so masked pooling stays clean.
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        a = nn.Dropout(self.dropout)(jax.nn.softmax(scores, axis=-1),
                                     deterministic=not train)
        out = jnp.einsum("bhls,bshd->blhd", a.astype(v.dtype), split(v),
                         preferred_element_type=jnp.float32)
        out = out.reshape(x.shape).astype(self.dtype)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj",
                       kernel_init=torch_default_kernel_init())(out)
        x = nn.LayerNorm(name="norm1")(x + drop(out))
        y = nn.Dense(self.d_ff, name="linear1", **lin(self.d_model))(x)
        y = drop(jax.nn.relu(y))
        y = nn.Dense(self.d_model, name="linear2", **lin(self.d_ff))(y)
        return nn.LayerNorm(name="norm2")(x + drop(y))


class BatchNorm(nn.BatchNorm):
    """torch-default BatchNorm (momentum 0.1 torch-style, eps 1e-5)."""

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
