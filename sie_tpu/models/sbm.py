"""Shapelet Bottleneck Model (SBM) and the distance-threshold variant (LTS).

Re-design of the reference `model/Shapelet.py:134-263` as flax modules over the
TPU shapelet ops in `sie_tpu.ops.shapelet`:

- per length-fraction bank i:  L_i = max(3, ceil(frac_i * seq_len))
  (reference Shapelet.py:153), stride 1 below 3000 steps else log2(L)
  (Shapelet.py:162);
- input is per-channel instance-normalized with the unbiased std + 1e-8
  (Shapelet.py:186-187);
- predicates p = RBF(eps * d) reduced by a straight-through max over windows;
- classifier over the concatenated (B, sum_i n_i*C) predicate vector:
  'linear' (no bias), 'bilinear' (linear + bilinear form), or 'attention'
  (per-predicate scalar attention with learned positional embedding,
  Shapelet.py:117-131);
- model loss = lambda_reg * mean|W| + lambda_div * sum_banks diversity
  (Shapelet.py:217-230).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.info import ModelInfo
from sie_tpu.ops.shapelet import (
    diversity_loss,
    instance_norm,
    rbf,
    shapelet_stride,
    sliding_distance,
    ste_max,
    ste_min,
)


def torch_linear_init(in_features: int):
    """U(-1/sqrt(in), 1/sqrt(in)) — matches torch nn.Linear default init."""
    bound = 1.0 / math.sqrt(in_features)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def bank_lengths(cfg: Config) -> Tuple[int, ...]:
    return tuple(max(3, int(math.ceil(f * cfg.seq_len))) for f in cfg.shapelet_lengths)


class PredicateAttention(nn.Module):
    """Scalar self-attention over the predicate vector (reference SelfAttention,
    Shapelet.py:117-131): Q/K are 1->dim_attn projections + positional embedding,
    V is the raw predicate scalar.

    The reference materializes the full (B, F, F) score matrix — at the EEG
    predicate width (F=7320, B=64) that is ~13.7 GB f32, beyond a v5e's HBM.
    Above `chunk_threshold` features we scan over query chunks instead: peak
    score memory drops to B*chunk*F (~240 MB at EEG scale) with identical
    math (softmax is over keys only, so chunking queries is exact)."""

    dim_feature: int
    dim_attn: int = 16
    dtype: jnp.dtype = jnp.float32
    chunk: int = 128
    chunk_threshold: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # x: (B, F)
        b, f = x.shape
        xe = x[..., None].astype(self.dtype)                      # (B, F, 1)
        pos = self.param("pos_embed", nn.initializers.normal(1.0),
                         (self.dim_feature, self.dim_attn))
        # torch nn.Linear(1, dim_attn) parity: fan_in=1 -> kernel AND bias
        # ~ U(-1, 1) (flax defaults would give lecun kernel + zero bias,
        # materially different initial scores for near-zero predicates)
        lin1 = dict(kernel_init=torch_linear_init(1),
                    bias_init=torch_linear_init(1))
        q = nn.Dense(self.dim_attn, dtype=self.dtype, name="q_proj",
                     **lin1)(xe) + pos
        k = nn.Dense(self.dim_attn, dtype=self.dtype, name="k_proj",
                     **lin1)(xe) + pos
        xv = x.astype(self.dtype)
        scale = 1.0 / math.sqrt(self.dim_attn)

        if f <= self.chunk_threshold:
            scores = jnp.einsum("bfa,bga->bfg", q, k,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(scores * scale, axis=-1)
            return jnp.einsum("bfg,bg->bf", attn.astype(self.dtype), xv)

        blk = self.chunk
        f_pad = -(-f // blk) * blk
        qp = jnp.pad(q, ((0, 0), (0, f_pad - f), (0, 0)))
        qc = jnp.transpose(qp.reshape(b, f_pad // blk, blk, self.dim_attn),
                           (1, 0, 2, 3))                          # (nc,B,blk,A)

        def body(_, qi):
            s = jnp.einsum("bfa,bga->bfg", qi, k,
                           preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1)  # keys are all real; no mask needed
            return None, jnp.einsum("bfg,bg->bf", a.astype(self.dtype), xv)

        _, outs = jax.lax.scan(body, None, qc)                    # (nc, B, blk)
        return jnp.transpose(outs, (1, 0, 2)).reshape(b, f_pad)[:, :f]


class ShapeBottleneckModel(nn.Module):
    """variant='sbm' -> RBF-probability predicates (reference ShapeBottleneckModel);
    variant='lts' -> distance-threshold predicates (reference DistThresholdSBM)."""

    config: Config
    variant: str = "sbm"

    def setup(self):
        cfg = self.config
        c = cfg.enc_in
        self.lengths = bank_lengths(cfg)
        self.strides = tuple(shapelet_stride(cfg.seq_len, l) for l in self.lengths)
        nums = cfg.num_shapelets_per_bank
        self.banks = [
            self.param(f"shapelets_{i}", nn.initializers.normal(1.0), (nums[i], c, l))
            for i, l in enumerate(self.lengths)
        ]
        if self.variant == "lts":
            # |U[0,1)| threshold per (shapelet, channel) — reference Shapelet.py:94
            self.thresholds = [
                self.param(f"threshold_{i}",
                           lambda key, shape: jnp.abs(jax.random.uniform(key, shape)),
                           (nums[i], c))
                for i in range(len(self.lengths))
            ]
        self.total = sum(n * c for n in nums)

        cls_init = torch_linear_init(self.total)
        self.output_layer = nn.Dense(cfg.num_class, use_bias=False,
                                     kernel_init=cls_init, dtype=cfg.compute_dtype,
                                     name="output_layer")
        if cfg.sbm_cls == "bilinear":
            self.output_bilinear = self.param(
                "bilinear_w", torch_linear_init(self.total),
                (cfg.num_class, self.total, self.total))
        elif cfg.sbm_cls == "attention":
            self.attention = PredicateAttention(self.total, 16, dtype=cfg.compute_dtype)
        self.drop = nn.Dropout(cfg.dropout)

    def _bank_distances(self, xn):
        """Per-bank (B, n, C, W) distances; optionally fuses the eligible
        stride-1 euclidean banks into one grouped Pallas launch
        (cfg.fuse_short_banks — opt-in, see Config)."""
        cfg = self.config
        # Reference DistThresholdShapelet (Shapelet.py:96-104) has no
        # cosine/pearson branch — but DOES honor the memory-efficient
        # (sqeuclidean) path, so LTS keeps sqeuclidean and folds the other
        # metrics back to the mean-|diff| default.
        metric = cfg.distance_func
        if self.variant != "sbm" and metric not in ("euclidean",
                                                    "sqeuclidean"):
            metric = "euclidean"
        per_bank = {}
        fuse_idx = []
        if (cfg.fuse_short_banks and metric == "euclidean" and cfg.use_pallas):
            from sie_tpu.ops.shapelet import _pallas_available
            if _pallas_available():
                fuse_idx = [i for i in range(len(self.banks))
                            if self.strides[i] == 1]
                fuse_idx.sort(key=lambda i: self.lengths[i])
        if len(fuse_idx) >= 2:
            from sie_tpu.ops.pallas.shapelet_pallas import (
                l1_sliding_distance_grouped)
            outs = l1_sliding_distance_grouped(
                xn, tuple(self.banks[i] for i in fuse_idx))
            per_bank.update(zip(fuse_idx, outs))
        # No mesh plumbing needed: the Pallas op carries custom_partitioning
        # rules (shapelet_pallas.py), so GSPMD shards it over batch ('data')
        # and shapelet ('model') axes like any other op — the round-2
        # Trainer-owned contextvar + shard_map seam is gone.
        for i, bank in enumerate(self.banks):
            if i not in per_bank:
                per_bank[i] = sliding_distance(
                    xn, bank, self.strides[i], metric,
                    use_pallas=cfg.use_pallas)
        return [per_bank[i] for i in range(len(self.banks))]

    def predicates(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: (B, T, C) -> (p, d): each (B, total) in f32."""
        cfg = self.config
        xn = instance_norm(jnp.transpose(x, (0, 2, 1)).astype(jnp.float32))
        ps, ds = [], []
        for i, d_full in enumerate(self._bank_distances(xn)):   # (B,n,C,W)
            b = d_full.shape[0]
            if self.variant == "sbm":
                p_full = rbf(d_full, cfg.epsilon)
                p = ste_max(p_full, axis=-1)
            else:
                min_d = ste_min(d_full, axis=-1)
                p = jax.nn.sigmoid(self.thresholds[i][None] - min_d)
            d_min = jnp.min(d_full, axis=-1)
            ps.append(p.reshape(b, -1))
            ds.append(d_min.reshape(b, -1))
        return jnp.concatenate(ps, axis=-1), jnp.concatenate(ds, axis=-1)

    def classify(self, p: jax.Array, train: bool) -> jax.Array:
        cfg = self.config
        pc = p.astype(cfg.compute_dtype)
        if cfg.sbm_cls == "linear":
            out = self.output_layer(self.drop(pc, deterministic=not train))
        elif cfg.sbm_cls == "bilinear":
            # three INDEPENDENT dropout masks, like the reference's three
            # dropout(p) calls (Shapelet.py:204) — reusing one mask would
            # correlate the bilinear arguments (p_i^2 terms survive)
            drop = lambda: self.drop(pc, deterministic=not train)
            lin = self.output_layer(drop())
            bil = jnp.einsum("bi,kij,bj->bk", drop(),
                             self.output_bilinear.astype(cfg.compute_dtype),
                             drop(), preferred_element_type=jnp.float32)
            out = lin + bil
        elif cfg.sbm_cls == "attention":
            att = self.attention(pc)
            out = self.output_layer(self.drop(att, deterministic=not train))
        else:
            raise ValueError(f"unknown sbm_cls {cfg.sbm_cls!r}")
        return out.astype(jnp.float32)

    def model_loss(self) -> jax.Array:
        cfg = self.config
        w = self.output_layer.variables["params"]["kernel"]
        loss = cfg.lambda_reg * jnp.mean(jnp.abs(w))
        if cfg.lambda_div > 0.0:
            div = sum(diversity_loss(b) for b in self.banks)
            loss = loss + cfg.lambda_div * div
        return loss

    def __call__(self, x, padding_mask=None, train: bool = False,
                 gating_value=None):
        p, d = self.predicates(x)
        out = self.classify(p, train)
        loss = self.model_loss()
        return out, ModelInfo(d=d, p=p, shapelet_preds=out, preds=out,
                              loss=loss[None])


def clamp_sbm_weights(params):
    """Project the SBM classifier weights to be non-negative after an optimizer
    step — the `--pos_weight` behavior (reference Shapelet.py:212-215). Works on
    any params pytree containing an `output_layer/kernel` leaf."""
    import flax.traverse_util as tu
    flat = tu.flatten_dict(params)
    for path in list(flat.keys()):
        if len(path) >= 2 and path[-2] == "output_layer" and path[-1] == "kernel":
            flat[path] = jnp.maximum(flat[path], 0.0)
    return tu.unflatten_dict(flat)
