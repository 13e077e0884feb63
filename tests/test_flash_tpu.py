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
