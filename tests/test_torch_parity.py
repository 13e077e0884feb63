"""Golden parity tests against an independent torch implementation of the
reference semantics (torch-cpu is available in this image; the reference stack
is torch, so agreeing with a torch transcription of the published equations is
the strongest parity evidence — SURVEY.md SS6 'numeric parity').

The torch code below is written from the behavioral contract in SURVEY.md
SS3.3 (instance norm -> unfold -> mean-abs distance -> RBF -> straight-through
max), not copied from the reference.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sie_tpu.ops.shapelet import instance_norm, rbf, sliding_distance, ste_max  # noqa: E402


def torch_sbm_predicates(x_np, s_np, eps):
    """(B, T, C) input -> (max_p (B, n, C), d (B, W, n, C)) torch graph."""
    x = torch.tensor(x_np, requires_grad=False)
    s = torch.tensor(s_np, requires_grad=True)
    xt = x.transpose(1, 2)                                    # (B, C, T)
    xt = (xt - xt.mean(-1, keepdim=True)) / (xt.std(-1, keepdim=True) + 1e-8)
    L = s.shape[-1]
    win = xt.unfold(2, L, 1)                                  # (B, C, W, L)
    # d[b, w, n, c] = mean_l |x_win - s|
    d = (win.permute(0, 2, 1, 3).unsqueeze(2)                 # (B, W, 1, C, L)
         - s.unsqueeze(0).unsqueeze(0)).abs().mean(-1)        # (B, W, n, C)
    p = torch.exp(-(eps * d) ** 2)
    hard = torch.zeros_like(p).scatter_(1, p.argmax(dim=1, keepdim=True), 1.0)
    soft = torch.softmax(p, dim=1)
    onehot = hard + soft - soft.detach()
    max_p = (onehot * p).sum(dim=1)                           # (B, n, C)
    return s, max_p, d


def jax_sbm_predicates(x_np, s_np, eps):
    def f(s):
        xn = instance_norm(jnp.transpose(jnp.asarray(x_np), (0, 2, 1)))
        d = sliding_distance(xn, s, 1, "euclidean", use_pallas=False)
        p = rbf(d, eps)
        return ste_max(p, axis=-1)                            # (B, n, C)
    return f


def test_forward_parity(rng):
    x = rng.normal(size=(3, 30, 4)).astype(np.float32)
    s = rng.normal(size=(5, 4, 7)).astype(np.float32)
    eps = 1.3
    _, max_p_t, d_t = torch_sbm_predicates(x, s, eps)
    max_p_j = jax_sbm_predicates(x, s, eps)(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(max_p_j),
                               max_p_t.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_gradient_parity(rng):
    """Straight-through-max gradient wrt the shapelet bank must match torch."""
    x = rng.normal(size=(2, 24, 3)).astype(np.float32)
    s = rng.normal(size=(4, 3, 6)).astype(np.float32)
    eps = 0.8

    s_t, max_p_t, _ = torch_sbm_predicates(x, s, eps)
    (max_p_t ** 2).sum().backward()
    grad_t = s_t.grad.numpy()

    f = jax_sbm_predicates(x, s, eps)
    grad_j = jax.grad(lambda sv: jnp.sum(f(sv) ** 2))(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(grad_j), grad_t, rtol=2e-3, atol=1e-4)


def test_gini_gate_parity(rng):
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    p_t = torch.softmax(torch.tensor(logits), dim=-1)
    gini_t = p_t.pow(2).sum(-1, keepdim=True)
    eta_t = (5 * gini_t - 1) / 4

    p_j = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    eta_j = (5 * jnp.sum(p_j ** 2, -1, keepdims=True) - 1) / 4
    np.testing.assert_allclose(np.asarray(eta_j), eta_t.numpy(), rtol=1e-5)


def test_diversity_loss_parity(rng):
    from sie_tpu.ops.shapelet import diversity_loss
    bank = rng.normal(size=(5, 3, 8)).astype(np.float32)
    sh = torch.tensor(bank).permute(1, 0, 2)
    dist = torch.nn.PairwiseDistance(p=2)(sh.unsqueeze(1), sh.unsqueeze(2))
    mask = torch.ones_like(dist) - torch.eye(5).unsqueeze(0)
    want = (torch.exp(-dist) * mask).mean().item()
    got = float(diversity_loss(jnp.asarray(bank)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cosine_distance_parity(rng):
    x = rng.normal(size=(2, 3, 25)).astype(np.float32)
    s = rng.normal(size=(4, 3, 6)).astype(np.float32)
    # torch: cosine_similarity over the window axis
    win = torch.tensor(x).unfold(2, 6, 1)                     # (B, C, W, L)
    win = win.permute(0, 2, 1, 3).unsqueeze(2)                # (B, W, 1, C, L)
    cos = torch.nn.functional.cosine_similarity(
        win, torch.tensor(s), dim=-1)                         # (B, W, n, C)
    want = (1 - cos).numpy()
    got = np.asarray(sliding_distance(jnp.asarray(x), jnp.asarray(s), 1,
                                      "cosine", use_pallas=False))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=2e-4, atol=2e-5)


def test_pearson_distance_parity(rng):
    x = rng.normal(size=(2, 3, 25)).astype(np.float32)
    s = rng.normal(size=(4, 3, 6)).astype(np.float32)
    win = torch.tensor(x).unfold(2, 6, 1).permute(0, 2, 1, 3).unsqueeze(2)
    st = torch.tensor(s)
    xc = win - win.mean(dim=-1, keepdim=True)
    yc = st - st.mean(dim=-1, keepdim=True)
    num = (xc * yc).sum(-1)
    den = torch.sqrt((xc ** 2).sum(-1) * (yc ** 2).sum(-1)) + 1e-8
    want = (1 - num / den).numpy()                            # (B, W, n, C)
    got = np.asarray(sliding_distance(jnp.asarray(x), jnp.asarray(s), 1,
                                      "pearson", use_pallas=False))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=2e-3, atol=2e-4)
