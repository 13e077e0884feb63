"""Switch-style Mixture-of-Experts FFN with expert parallelism.

Reference parity: none to match — the reference's encoder FFN is dense
(`layers/Transformer_EncDec.py:40-50`, two pointwise convs) and its only
parallelism is nn.DataParallel. This module is the TPU-native scaling
surface for wide models (SURVEY §2.7 scopes anything beyond dp as rebuild
extras): it sparsely activates `n_experts` independent FFNs whose stacked
parameters shard over an 'expert' mesh axis, completing the framework's
parallelism matrix (dp/tp/sp/pp/ep).

Design — the GSPMD-compositional formulation (grouped einsum dispatch, as
in Switch Transformer / Mesh-TF / t5x-style routers):

- Routing is computed per GROUP (= one sequence): each group dispatches at
  most `capacity = ceil(cf * T * k / E)` tokens to each expert, so every
  tensor shape is STATIC — no data-dependent shapes under jit.
- dispatch/combine are (B, T, E, C) one-hot masks; tokens enter experts via
  `einsum('btec,btd->ebcd')` and return via the transpose einsum. Both are
  MXU-friendly batched matmuls, and GSPMD partitions them from the operand
  shardings alone: groups ride the 'data' axis, expert stacks ride the
  'expert' axis, and XLA inserts the all-to-all at exactly these two
  einsums. No hand-written collectives.
- The router runs in f32 (softmax numerics), experts in the bf16 policy.
- Tokens over capacity are dropped: they bypass the FFN (residual still
  carries them) — standard Switch semantics.
- Padded timesteps are routed like real ones and can consume capacity.
  This mirrors the encoder's existing semantics — the reference's
  FullAttention runs unmasked on this path too (its padding mask is applied
  only at the post-encoder pooling, Transformer.py:105-108), and the
  CHISCO/EEG batcher emits all-ones masks (SURVEY §2.5-7). For heavily
  padded inputs, raise capacity_factor to absorb the padded load.
- Load-balance aux loss (E * Σ_e f_e · P_e) and an optional router z-loss
  are `sow`n into the 'losses' collection; the Trainer adds every sown leaf
  to the objective (train/trainer.py:make_loss_fn).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class MoEFFN(nn.Module):
    """Drop-in FFN replacement: (B, T, d_model) -> (B, T, d_model)."""

    d_model: int
    d_ff: int
    n_experts: int
    capacity_factor: float = 1.25
    top_k: int = 1
    dropout: float = 0.0
    activation: str = "gelu"
    aux_weight: float = 0.01
    zloss_weight: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        B, T, d = x.shape
        E, k = self.n_experts, self.top_k
        if not 1 <= k <= E:
            raise ValueError(f"top_k={k} must be in [1, {E}]")
        cap = min(T * k, max(1, math.ceil(self.capacity_factor * T * k / E)))

        logits = nn.Dense(E, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))                       # (B, T, E)
        probs = jax.nn.softmax(logits, axis=-1)

        # Iterative top-k: pass i routes every token to its i-th-choice
        # expert; slot positions accumulate across passes so a token's k
        # choices never collide in an expert's capacity buffer.
        avail = jnp.ones_like(probs)
        counts = jnp.zeros((B, 1, E), jnp.float32)       # slots used so far
        dispatch = jnp.zeros((B, T, E, cap), jnp.float32)
        combine = jnp.zeros((B, T, E, cap), jnp.float32)
        gate_sum = jnp.zeros((B, T), jnp.float32)
        for _ in range(k):
            masked = probs * avail
            choice = jnp.argmax(masked, axis=-1)          # (B, T)
            onehot = jax.nn.one_hot(choice, E, dtype=jnp.float32)
            gate = jnp.sum(probs * onehot, axis=-1)       # (B, T)
            pos = jnp.cumsum(onehot, axis=1) - onehot + counts
            counts = counts + jnp.sum(onehot, axis=1, keepdims=True)
            slot = jnp.sum(pos * onehot, axis=-1)         # (B, T)
            keep = (slot < cap).astype(jnp.float32)
            sel = onehot[..., None] * jax.nn.one_hot(
                jnp.minimum(slot, cap - 1).astype(jnp.int32), cap,
                dtype=jnp.float32)[..., None, :] * keep[..., None, None]
            dispatch = dispatch + sel
            combine = combine + sel * gate[..., None, None]
            gate_sum = gate_sum + gate * keep
            avail = avail * (1.0 - onehot)
        if k > 1:
            # normalize the k surviving gates to sum to 1 per token
            combine = combine / jnp.maximum(gate_sum, 1e-9)[..., None, None]

        # ---- aux losses (sown; Trainer adds them to the objective) -------
        # Switch load balance: routed fraction x mean router prob, both
        # measured on the FIRST choice (the quantity the router controls).
        first = jax.nn.one_hot(jnp.argmax(probs, -1), E, dtype=jnp.float32)
        f_e = jnp.mean(first, axis=(0, 1))                # (E,)
        p_e = jnp.mean(probs, axis=(0, 1))
        if train:
            aux = self.aux_weight * E * jnp.sum(f_e * p_e)
            if self.zloss_weight > 0.0:
                z = jax.scipy.special.logsumexp(logits, axis=-1)
                aux = aux + self.zloss_weight * jnp.mean(z ** 2)
            self.sow("losses", "moe_aux", aux,
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=lambda acc, v: acc + v)

        # ---- expert computation ------------------------------------------
        dt = self.dtype
        init = nn.initializers.lecun_normal()
        wi = self.param("expert_wi", init, (E, d, self.d_ff), jnp.float32)
        bi = self.param("expert_bi", nn.initializers.zeros,
                        (E, self.d_ff), jnp.float32)
        wo = self.param("expert_wo", init, (E, self.d_ff, d), jnp.float32)
        bo = self.param("expert_bo", nn.initializers.zeros,
                        (E, d), jnp.float32)
        act = jax.nn.relu if self.activation == "relu" else jax.nn.gelu

        xin = jnp.einsum("btec,btd->ebcd", dispatch.astype(dt), x.astype(dt))
        h = jnp.einsum("ebcd,edf->ebcf", xin, wi.astype(dt))
        h = act(h + bi.astype(dt)[:, None, None, :])
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        y = jnp.einsum("ebcf,efd->ebcd", h, wo.astype(dt))
        y = y + bo.astype(dt)[:, None, None, :]
        out = jnp.einsum("btec,ebcd->btd", combine.astype(dt), y)
        return out.astype(dt)
