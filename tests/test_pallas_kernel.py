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


@pytest.mark.parametrize("stride", [2, 7])
def test_polyphase_strided_matches_scan(rng, stride):
    """Stride-k distance as k stride-1 polyphase kernels (interpret mode)."""
    import functools
    from sie_tpu.ops.shapelet import _l1_polyphase

    x = jnp.asarray(rng.normal(size=(2, 3, 46)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 3, 9)).astype(np.float32))
    fn = functools.partial(l1_sliding_distance, interpret=True)
    got = _l1_polyphase(x, s, stride, fn)
    want = _l1_distance(x, s, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_polyphase_strided_grad_matches(rng):
    import functools
    from sie_tpu.ops.shapelet import _l1_polyphase

    x = jnp.asarray(rng.normal(size=(2, 2, 38)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 2, 8)).astype(np.float32))
    fn = functools.partial(l1_sliding_distance, interpret=True)
    g1 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_polyphase(x, sv, 3, fn))))(s)
    g2 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_distance(x, sv, 3))))(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_pallas_many_shapelets_budget_path(rng):
    """n*lane-tiles above the vreg budget drives the register-budget formula
    to WS/LS=8 (the guard that keeps non-default num_shapelet / wide-C
    configs from spilling 3x the vregs). n=16 with C=129 (2 lane tiles)
    crosses the budget just like num_shapelet=32 would."""
    from sie_tpu.ops.pallas.shapelet_pallas import _fwd_ws
    assert _fwd_ws(32, 3) == 8 and _fwd_ws(16, 129) == 8
    x = jnp.asarray(rng.normal(size=(2, 129, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(16, 129, 7)).astype(np.float32))
    got = l1_sliding_distance(x, s, 1, True)
    want = _l1_distance(x, s, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda sv: jnp.sum(jnp.sin(l1_sliding_distance(x, sv, 1, True))))(s)
    g2 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_distance(x, sv, 1))))(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_pallas_balanced_l_split(rng):
    """L just above the subtile cap exercises the balanced backward split
    (l_pad spread over subtiles instead of one full-pad tail)."""
    from sie_tpu.ops.pallas.shapelet_pallas import _bwd_l_split, _bwd_ls_max
    n, c, l = 3, 2, 50
    assert l > _bwd_ls_max(n, c) // 2  # multi-subtile at these sizes
    ls, l_pad = _bwd_l_split(n, c, l)
    assert l_pad % ls == 0 and l_pad >= l and ls % 8 == 0
    assert l_pad - l < ls  # balanced: waste below one subtile
    x = jnp.asarray(rng.normal(size=(2, c, 90)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n, c, l)).astype(np.float32))
    g1 = jax.grad(lambda sv: jnp.sum(jnp.sin(l1_sliding_distance(x, sv, 1, True))))(s)
    g2 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_distance(x, sv, 1))))(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_pallas_random_shape_sweep(rng):
    """Seeded randomized shape sweep: fwd + VJP vs the scan reference across
    odd C / L / T / n combinations (guards the index/padding arithmetic of
    the register-tiled kernels)."""
    shapes = [(1, 1, 17, 3), (2, 5, 21, 9), (2, 3, 41, 25)]
    for b, n, t, l in shapes:
        c = int(rng.integers(1, 7))
        x = jnp.asarray(rng.normal(size=(b, c, t)).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(n, c, l)).astype(np.float32))
        got = l1_sliding_distance(x, s, 1, True)
        want = _l1_distance(x, s, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"fwd {(b, n, c, t, l)}")
        g1 = jax.grad(lambda sv: jnp.sum(jnp.cos(
            l1_sliding_distance(x, sv, 1, True))))(s)
        g2 = jax.grad(lambda sv: jnp.sum(jnp.cos(_l1_distance(x, sv, 1))))(s)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"bwd {(b, n, c, t, l)}")
