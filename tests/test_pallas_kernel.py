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


# --------------------------------------------------------------------------
# sqeuclidean metric (round 5): same kernel, diff^2 tap — parity with the
# reference memory-efficient semantics (Shapelet.py:27-28) and with the MXU
# conv decomposition it replaces as the default sq path.
# --------------------------------------------------------------------------

def _naive_sq(x, s, stride):
    """Direct (B, n, C, W) mean-squared sliding distance, autodiff-able."""
    b, c, t = x.shape
    n, _, l = s.shape
    w = (t - l) // stride + 1
    wins = jnp.stack([x[:, :, i * stride:i * stride + l]
                      for i in range(w)], axis=-2)          # (B, C, W, L)
    diff = wins[:, None] - s[None, :, :, None]              # (B, n, C, W, L)
    return jnp.mean(jnp.square(diff), axis=-1)


@pytest.mark.parametrize("stride", [1])
def test_pallas_sq_forward_matches_naive(rng, stride):
    x = jnp.asarray(rng.normal(size=(2, 3, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    got = l1_sliding_distance(x, s, stride, True, "sqeuclidean")
    want = _naive_sq(x, s, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_sq_backward_matches_naive(rng):
    x = jnp.asarray(rng.normal(size=(2, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 5)).astype(np.float32))

    def loss_pl(sv):
        return jnp.sum(jnp.sin(
            l1_sliding_distance(x, sv, 1, True, "sqeuclidean")))

    def loss_naive(sv):
        return jnp.sum(jnp.sin(_naive_sq(x, sv, 1)))

    g_pl = jax.grad(loss_pl)(s)
    g_naive = jax.grad(loss_naive)(s)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_naive),
                               rtol=1e-4, atol=1e-6)


def test_pallas_sq_grad_x_is_zero(rng):
    """Zero x-grad contract (reference ShapeletDistanceFunc.backward returns
    zeros for x, Shapelet.py:40) holds for the sq metric too."""
    x = jnp.asarray(rng.normal(size=(1, 2, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 2, 4)).astype(np.float32))
    gx = jax.grad(lambda xv: jnp.sum(
        l1_sliding_distance(xv, s, 1, True, "sqeuclidean")))(x)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


@pytest.mark.parametrize("stride", [1, 3])
def test_sq_dispatch_pallas_matches_conv_decomposition(rng, stride):
    """sliding_distance(metric='sqeuclidean', use_pallas=True) — incl. the
    stride>1 polyphase route — agrees with the conv decomposition fallback."""
    import os
    from sie_tpu.ops.shapelet import sliding_distance

    x = jnp.asarray(rng.normal(size=(2, 3, 46)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 3, 9)).astype(np.float32))
    want = sliding_distance(x, s, stride, "sqeuclidean", use_pallas=False)
    os.environ["SIE_TPU_PALLAS_INTERPRET"] = "1"
    try:
        got = sliding_distance(x, s, stride, "sqeuclidean", use_pallas=True)
    finally:
        os.environ.pop("SIE_TPU_PALLAS_INTERPRET", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_lts_variant_honors_sqeuclidean(rng):
    """Reference DistThresholdShapelet honors the memory-efficient metric
    (Shapelet.py:100-102): LTS distances must differ between euclidean and
    sqeuclidean configs, and sqeuclidean LTS must equal the sq distances."""
    from sie_tpu.config import Config
    from sie_tpu.models.sbm import ShapeBottleneckModel

    kw = dict(data="UEA", dataset="toy", model="SBM", seq_len=40, enc_in=3,
              num_class=2, num_shapelet=2, shapelet_lengths=(0.2,),
              amp=False, use_pallas=False, seed=0)
    x = jnp.asarray(rng.normal(size=(2, 40, 3)), jnp.float32)
    m_eu = ShapeBottleneckModel(Config(**kw), variant="lts")
    m_sq = ShapeBottleneckModel(Config(distance_func="sqeuclidean", **kw),
                                variant="lts")
    v = m_eu.init(jax.random.key(0), x)
    _, info_eu = m_eu.apply(v, x)
    _, info_sq = m_sq.apply(v, x)
    assert not np.allclose(np.asarray(info_eu.d), np.asarray(info_sq.d))
