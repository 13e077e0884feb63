"""vmap over the custom_partitioning-wrapped Pallas ops (seq_vmap.py).

Regression for the ensemble-seed-axis failure found by the r3 on-chip
cert: JAX has no batching rule for the custom_partitioning primitive, so
`EnsembleTrainer.train_step` (a vmap over seeds) crashed on any config
that binds the TPU kernel paths — the CPU suite never noticed because the
CPU model paths route to the XLA fallbacks. These tests bind the cp ops
directly (interpret mode) under vmap and check against a per-element
Python loop, forward and grad, matching how the ensemble uses them
(vmap of value_and_grad). Reference analogue: sequential per-seed runs,
reference run.py:490-692.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sie_tpu.ops.pallas.attention_pallas import fused_attention
from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance


def test_vmap_shapelet_distance_matches_loop(rng):
    n_seeds = 3
    x = jnp.asarray(rng.normal(size=(n_seeds, 2, 3, 40)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n_seeds, 4, 3, 7)).astype(np.float32))

    got = jax.vmap(lambda xi, si: l1_sliding_distance(xi, si, 1, True))(x, s)
    want = jnp.stack([l1_sliding_distance(x[i], s[i], 1, True)
                      for i in range(n_seeds)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=0)

    # unbatched x (shared data, per-seed shapelets) — the broadcast branch
    got2 = jax.vmap(lambda si: l1_sliding_distance(x[0], si, 1, True))(s)
    want2 = jnp.stack([l1_sliding_distance(x[0], s[i], 1, True)
                       for i in range(n_seeds)])
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=0)


def test_vmap_shapelet_grad_matches_loop(rng):
    n_seeds = 3
    x = jnp.asarray(rng.normal(size=(n_seeds, 2, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n_seeds, 3, 2, 5)).astype(np.float32))

    def loss(xi, si):
        return jnp.sum(jnp.sin(l1_sliding_distance(xi, si, 1, True)))

    got = jax.vmap(jax.grad(loss, argnums=1))(x, s)
    want = jnp.stack([jax.grad(loss, argnums=1)(x[i], s[i])
                      for i in range(n_seeds)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("rate,block_kv", [(0.0, None), (0.2, None),
                                           (0.2, 64)])
def test_vmap_fused_attention_matches_loop(rng, rate, block_kv):
    n_seeds, bh, t, dk = 3, 2, 72, 16
    q, k, v = (jnp.asarray(rng.normal(size=(n_seeds, bh, t, dk)),
                           jnp.float32) for _ in range(3))
    seeds = jnp.arange(n_seeds, dtype=jnp.int32)[:, None]  # (N, 1) per-seed

    def attn(qi, ki, vi, sd):
        return fused_attention(qi, ki, vi, sd, 0.25, rate, True,
                               block_kv=block_kv)

    got = jax.vmap(attn)(q, k, v, seeds)
    want = jnp.stack([attn(q[i], k[i], v[i], seeds[i])
                      for i in range(n_seeds)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    def loss(qi, ki, vi, sd):
        return jnp.sum(attn(qi, ki, vi, sd) ** 2)

    got_g = jax.vmap(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v, seeds)
    want_g = [jax.grad(loss, argnums=(0, 1, 2))(q[i], k[i], v[i], seeds[i])
              for i in range(n_seeds)]
    for ax in range(3):
        w = jnp.stack([wg[ax] for wg in want_g])
        np.testing.assert_allclose(np.asarray(got_g[ax]), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)
