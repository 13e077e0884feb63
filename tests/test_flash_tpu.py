"""Flash-attention path vs naive attention — runs only on a real TPU backend
(the CPU test suite always exercises the naive fallback). Run manually:

    SIE_TPU_TEST_TPU=1 python -m pytest tests/test_flash_tpu.py --no-header -q

(conftest.py forces the CPU backend unless SIE_TPU_TEST_TPU=1 is set.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="flash path only engages on TPU")


def test_flash_matches_naive_attention(rng):
    from sie_tpu.models.layers import FullAttentionLayer

    b, l, d, h = 4, 200, 64, 4  # l not a 128 multiple -> exercises padding
    x = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))

    flash_layer = FullAttentionLayer(d, h, dtype=jnp.bfloat16, use_flash=True)
    naive_layer = FullAttentionLayer(d, h, dtype=jnp.float32)
    variables = flash_layer.init(jax.random.key(0), x, x, x)

    out_flash = flash_layer.apply(variables, x.astype(jnp.bfloat16),
                                  x.astype(jnp.bfloat16),
                                  x.astype(jnp.bfloat16))
    out_naive = naive_layer.apply(variables, x, x, x)
    np.testing.assert_allclose(np.asarray(out_flash, np.float32),
                               np.asarray(out_naive), rtol=0.1, atol=0.05)


def test_fused_kernel_compiled_matches_interpret(rng):
    """Compiled fused attention == interpret reference on-chip (fwd + grads),
    incl. the dropout path (hash masks are backend-invariant by design)."""
    from sie_tpu.ops.pallas.attention_pallas import fused_attention

    bh, t, dk = 8, 150, 64
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    seed = jnp.array([42], jnp.int32)
    for rate in (0.0, 0.2):
        out_c = fused_attention(q, k, v, seed, 0.125, rate, interpret=False)
        out_i = fused_attention(q, k, v, seed, 0.125, rate, interpret=True)
        # tolerance: TPU exp/FMA differ slightly from the interpreter's host
        # math (observed max 9e-5 abs on 0.04% of elements)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_i),
                                   atol=5e-4, rtol=1e-2)
        loss = lambda interp: (lambda q, k, v: jnp.sum(
            fused_attention(q, k, v, seed, 0.125, rate, interp) ** 2))
        gc = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
        gi = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gi):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-2)


def test_blocked_kernel_compiled_matches_interpret(rng):
    """Compiled kv-blocked variant == interpret reference on-chip. Regression
    for the (blk, 1) LSE-block Mosaic rejection caught by the r3 on-chip cert
    (fixed with the (BH, T_pad, 128) broadcast-lane LSE layout + in-kernel
    delta recompute). block_kv=256 forces the blocked path at a small T so
    the test compiles in seconds, with T not a block multiple (padding)."""
    from sie_tpu.ops.pallas.attention_pallas import fused_attention

    bh, t, dk = 4, 300, 64
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    seed = jnp.array([7], jnp.int32)
    for rate in (0.0, 0.2):
        out_c = fused_attention(q, k, v, seed, 0.125, rate, interpret=False,
                                block_kv=256)
        out_i = fused_attention(q, k, v, seed, 0.125, rate, interpret=True,
                                block_kv=256)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_i),
                                   atol=5e-4, rtol=1e-2)
        loss = lambda interp: (lambda q, k, v: jnp.sum(fused_attention(
            q, k, v, seed, 0.125, rate, interp, block_kv=256) ** 2))
        gc = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
        gi = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gi):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-2)
