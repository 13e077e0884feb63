"""Property tests for the shapelet ops against naive numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sie_tpu.ops.shapelet import (
    diversity_loss, instance_norm, rbf, sliding_distance, ste_max, ste_min,
)


def naive_distance(x, s, stride=1, metric="euclidean"):
    """O(B W n C L) reference: d[b,n,c,w]."""
    b, c, t = x.shape
    n, _, l = s.shape
    w = (t - l) // stride + 1
    out = np.zeros((b, n, c, w), np.float64)
    for bi in range(b):
        for ni in range(n):
            for ci in range(c):
                for wi in range(w):
                    xw = x[bi, ci, wi * stride: wi * stride + l].astype(np.float64)
                    sv = s[ni, ci].astype(np.float64)
                    if metric == "euclidean":
                        out[bi, ni, ci, wi] = np.abs(xw - sv).mean()
                    elif metric == "sqeuclidean":
                        out[bi, ni, ci, wi] = ((xw - sv) ** 2).mean()
                    elif metric == "cosine":
                        denom = max(np.linalg.norm(xw) * np.linalg.norm(sv), 1e-8)
                        out[bi, ni, ci, wi] = 1 - xw @ sv / denom
                    elif metric == "pearson":
                        xc = xw - xw.mean()
                        sc = sv - sv.mean()
                        denom = np.sqrt((xc ** 2).sum() * (sc ** 2).sum()) + 1e-8
                        out[bi, ni, ci, wi] = 1 - xc @ sc / denom
    return out


@pytest.mark.parametrize("metric", ["euclidean", "sqeuclidean", "cosine", "pearson"])
@pytest.mark.parametrize("stride", [1, 3])
def test_sliding_distance_matches_naive(rng, metric, stride):
    x = rng.normal(size=(2, 3, 40)).astype(np.float32)
    s = rng.normal(size=(4, 3, 7)).astype(np.float32)
    got = np.asarray(sliding_distance(jnp.asarray(x), jnp.asarray(s),
                                      stride, metric, use_pallas=False))
    want = naive_distance(x, s, stride, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_l1_distance_grad_s(rng):
    """Custom-VJP gradient wrt s must equal the autodiff gradient of the naive
    formula (subgradient 0 at ties, like torch.sign)."""
    x = rng.normal(size=(2, 2, 20)).astype(np.float32)
    s = rng.normal(size=(3, 2, 5)).astype(np.float32)

    def loss_custom(sv):
        return jnp.sum(jnp.sin(sliding_distance(jnp.asarray(x), sv, 1,
                                                "euclidean", use_pallas=False)))

    def loss_naive(sv):
        b, c, t = x.shape
        n, _, l = sv.shape
        w = t - l + 1
        wins = jnp.stack([jnp.asarray(x)[:, :, i:i + l] for i in range(w)], axis=1)
        d = jnp.mean(jnp.abs(wins[:, :, None] - sv[None, None]), axis=-1)
        d = jnp.transpose(d, (0, 2, 3, 1))
        return jnp.sum(jnp.sin(d))

    g_custom = jax.grad(loss_custom)(jnp.asarray(s))
    g_naive = jax.grad(loss_naive)(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_naive),
                               rtol=1e-4, atol=1e-5)


def test_ste_max_value_and_grad():
    p = jnp.asarray([[0.1, 0.9, 0.3], [0.5, 0.2, 0.4]])
    v = ste_max(p)
    np.testing.assert_allclose(np.asarray(v), [0.9, 0.5], rtol=1e-6)
    # gradient = hard one-hot + softmax Jacobian applied to p
    g = jax.grad(lambda q: ste_max(q).sum())(p)
    soft = jax.nn.softmax(p, axis=-1)
    jac = soft * (p - jnp.sum(soft * p, axis=-1, keepdims=True))
    hard = jax.nn.one_hot(jnp.argmax(p, -1), 3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(hard + jac), rtol=1e-5)


def test_ste_min_value():
    d = jnp.asarray([[0.7, 0.2, 0.5]])
    np.testing.assert_allclose(np.asarray(ste_min(d)), [0.2], rtol=1e-6)


def test_instance_norm_unbiased(rng):
    x = rng.normal(size=(2, 3, 50)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = (x - x.mean(-1, keepdims=True)) / (x.std(-1, ddof=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rbf():
    d = jnp.asarray([0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(rbf(d, 0.5)),
                               np.exp(-(0.5 * np.asarray(d)) ** 2), rtol=1e-6)


def test_diversity_loss_matches_naive(rng):
    bank = rng.normal(size=(4, 3, 6)).astype(np.float32)
    got = float(diversity_loss(jnp.asarray(bank)))
    sh = np.transpose(bank, (1, 0, 2))
    diff = sh[:, :, None, :] - sh[:, None, :, :] + 1e-6
    dist = np.sqrt((diff ** 2).sum(-1))
    mask = 1 - np.eye(4)
    want = float((np.exp(-dist) * mask[None]).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
