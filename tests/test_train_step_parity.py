"""End-to-end single-step numerical parity against torch.

Initializes a torch transcription of the SBM (written from the SURVEY.md
behavioral contract, not copied) with OUR parameters, computes the full
training loss (CE + L1 weight reg + diversity) on the same batch, applies one
Adam step in both frameworks, and compares every updated parameter. This
exercises instance-norm, the L1 sliding distance, RBF, the straight-through
max, the linear head, both regularizers, cross-entropy, and the optimizer in
one shot."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sie_tpu.config import Config  # noqa: E402
from sie_tpu.models import build_model  # noqa: E402


LR = 5e-3
LAM_REG, LAM_DIV, EPS_RBF = 0.1, 0.1, 1.0


def make_batch(rng, b=6, t=30, c=3, k=2):
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    y = rng.integers(0, k, b).astype(np.int64)
    return x, y


def torch_step(x_np, y_np, banks_np, kernel_np):
    banks = [torch.nn.Parameter(torch.tensor(bk)) for bk in banks_np]
    # jax Dense kernel is (F, num_class); torch linear weight is (num_class, F)
    lin = torch.nn.Linear(kernel_np.shape[0], kernel_np.shape[1], bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(kernel_np.T))
    params = banks + list(lin.parameters())
    opt = torch.optim.Adam(params, lr=LR)

    x = torch.tensor(x_np)
    xt = x.transpose(1, 2)
    xt = (xt - xt.mean(-1, keepdim=True)) / (xt.std(-1, keepdim=True) + 1e-8)
    ps = []
    div_loss = 0.0
    for bank in banks:
        L = bank.shape[-1]
        win = xt.unfold(2, L, 1).permute(0, 2, 1, 3).unsqueeze(2)  # (B,W,1,C,L)
        d = (win - bank.unsqueeze(0).unsqueeze(0)).abs().mean(-1)  # (B,W,n,C)
        p = torch.exp(-(EPS_RBF * d) ** 2)
        hard = torch.zeros_like(p).scatter_(1, p.argmax(1, keepdim=True), 1.0)
        soft = torch.softmax(p, dim=1)
        max_p = ((hard + soft - soft.detach()) * p).sum(1)          # (B,n,C)
        ps.append(max_p.flatten(1))
        sh = bank.permute(1, 0, 2)
        dist = torch.nn.PairwiseDistance(p=2)(sh.unsqueeze(1), sh.unsqueeze(2))
        mask = torch.ones_like(dist) - torch.eye(sh.shape[1]).unsqueeze(0)
        div_loss = div_loss + (torch.exp(-dist) * mask).mean()
    logits = lin(torch.cat(ps, -1))
    loss = (torch.nn.functional.cross_entropy(logits, torch.tensor(y_np))
            + LAM_REG * lin.weight.abs().mean() + LAM_DIV * div_loss)
    loss.backward()
    opt.step()
    return (float(loss), [bk.detach().numpy() for bk in banks],
            lin.weight.detach().numpy().T)


@pytest.mark.slow
def test_one_adam_step_matches_torch(rng):
    cfg = Config(data="UEA", model="SBM", seq_len=30, enc_in=3, num_class=2,
                 num_shapelet=2, shapelet_lengths=(0.1, 0.3), dropout=0.0,
                 lambda_reg=LAM_REG, lambda_div=LAM_DIV, epsilon=EPS_RBF,
                 amp=False, use_pallas=False, seed=0)
    model = build_model(cfg)
    x_np, y_np = make_batch(rng)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np), None,
                           train=False)
    params = variables["params"]
    banks_np = [np.asarray(params["shapelets_0"]),
                np.asarray(params["shapelets_1"])]
    kernel_np = np.asarray(params["output_layer"]["kernel"])

    def loss_fn(p):
        logits, info = model.apply({"params": p}, jnp.asarray(x_np), None,
                                   train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y_np.astype(np.int32))).mean()
        return ce + info.loss.sum()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    tx = optax.adam(LR)
    updates, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)

    t_loss, t_banks, t_kernel = torch_step(x_np, y_np, banks_np, kernel_np)

    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-4)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(new_params[f"shapelets_{i}"]), t_banks[i],
            rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["output_layer"]["kernel"]), t_kernel,
        rtol=2e-3, atol=2e-5)
