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


def test_grouped_bank_launch_matches_per_bank():
    """l1_sliding_distance_grouped (one fused launch) is bit-identical to
    per-bank l1_sliding_distance calls, fwd and grad (VERDICT r2 item 3 —
    kept opt-in: measured slower at CHISCO shapes, docs/BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp
    from sie_tpu.ops.pallas.shapelet_pallas import (
        l1_sliding_distance, l1_sliding_distance_grouped)

    rng = np.random.default_rng(11)
    B, C, T = 3, 7, 60
    banks = tuple(jnp.asarray(rng.normal(size=(n, C, L)), jnp.float32)
                  for n, L in ((4, 5), (3, 11), (2, 23)))
    x = jnp.asarray(rng.normal(size=(B, C, T)), jnp.float32)
    outs = l1_sliding_distance_grouped(x, banks)
    for o, s in zip(outs, banks):
        ref = l1_sliding_distance(x, s, 1)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref))
    gg = jax.grad(lambda bs: sum(jnp.sum(jnp.sin(d))
                                 for d in l1_sliding_distance_grouped(x, bs)))(banks)
    gr = jax.grad(lambda bs: sum(jnp.sum(jnp.sin(l1_sliding_distance(x, s, 1)))
                                 for s in bs))(banks)
    for a, b in zip(gg, gr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fuse_short_banks_model_path():
    """SBM with cfg.fuse_short_banks=True (grouped launch) matches the
    default per-bank path end to end through predicates."""
    import jax
    import jax.numpy as jnp
    from sie_tpu.config import Config
    from sie_tpu.models.sbm import ShapeBottleneckModel

    rng = np.random.default_rng(12)
    kw = dict(data="UEA", dataset="toy", model="SBM", seq_len=40, enc_in=5,
              num_class=2, num_shapelet=2, shapelet_lengths=(0.1, 0.3),
              amp=False, use_pallas=True, seed=0)
    x = jnp.asarray(rng.normal(size=(4, 40, 5)), jnp.float32)
    import os
    os.environ["SIE_TPU_PALLAS_INTERPRET"] = "1"
    try:
        m0 = ShapeBottleneckModel(Config(**kw))
        m1 = ShapeBottleneckModel(Config(fuse_short_banks=True, **kw))
        v = m0.init(jax.random.key(0), x)
        out0, info0 = m0.apply(v, x)
        out1, info1 = m1.apply(v, x)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
        np.testing.assert_array_equal(np.asarray(info0.d), np.asarray(info1.d))
    finally:
        os.environ.pop("SIE_TPU_PALLAS_INTERPRET", None)
