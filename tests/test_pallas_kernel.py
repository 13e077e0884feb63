"""Pallas L1 shapelet-distance kernel vs the scan reference (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance
from sie_tpu.ops.shapelet import _l1_distance


@pytest.mark.parametrize("stride", [1, 2])
def test_pallas_forward_matches_scan(rng, stride):
    x = jnp.asarray(rng.normal(size=(2, 3, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    got = l1_sliding_distance(x, s, stride, True)
    want = _l1_distance(x, s, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_backward_matches_scan(rng):
    x = jnp.asarray(rng.normal(size=(2, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 5)).astype(np.float32))

    def loss_pl(sv):
        return jnp.sum(jnp.sin(l1_sliding_distance(x, sv, 1, True)))

    def loss_scan(sv):
        return jnp.sum(jnp.sin(_l1_distance(x, sv, 1)))

    g_pl = jax.grad(loss_pl)(s)
    g_scan = jax.grad(loss_scan)(s)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_scan),
                               rtol=1e-4, atol=1e-6)


def test_pallas_grad_x_is_zero(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 2, 4)).astype(np.float32))
    gx = jax.grad(lambda xv: jnp.sum(l1_sliding_distance(xv, s, 1, True)))(x)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


@pytest.mark.parametrize("stride", [2, 3, 7])
def test_polyphase_strided_matches_scan(rng, stride):
    """Stride-k distance as k stride-1 polyphase kernels (interpret mode)."""
    import functools
    from sie_tpu.ops.shapelet import _l1_polyphase

    x = jnp.asarray(rng.normal(size=(2, 3, 60)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 3, 9)).astype(np.float32))
    fn = functools.partial(l1_sliding_distance, interpret=True)
    got = _l1_polyphase(x, s, stride, fn)
    want = _l1_distance(x, s, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_polyphase_strided_grad_matches(rng):
    import functools
    from sie_tpu.ops.shapelet import _l1_polyphase

    x = jnp.asarray(rng.normal(size=(2, 2, 50)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 8)).astype(np.float32))
    fn = functools.partial(l1_sliding_distance, interpret=True)
    g1 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_polyphase(x, sv, 3, fn))))(s)
    g2 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_distance(x, sv, 3))))(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)
