"""TimesNet period-fold correctness: the shifted-matmul InceptionConvSeq must
equal a literal fold -> 2D conv -> unfold computed with torch Conv2d."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sie_tpu.models.timesnet import InceptionConvSeq, _inception_taps  # noqa: E402


@pytest.mark.parametrize("period", [3, 5, 7])
def test_inception_fold_matches_conv2d(rng, period):
    t, c_in, c_out, num_k = 20, 4, 6, 3
    b = 2
    x = rng.normal(size=(b, t, c_in)).astype(np.float32)

    mod = InceptionConvSeq(c_in, c_out, num_k)
    canvas = jnp.concatenate([jnp.asarray(x), jnp.zeros_like(x)], axis=1)
    rows = -(-t // period)
    canvas_len = rows * period
    variables = mod.init(jax.random.key(0), canvas, period, canvas_len)
    got = np.asarray(mod.apply(variables, canvas, period, canvas_len))[:, :t]

    # literal reference: fold to (rows, period) image, per-kernel Conv2d, mean
    taps = _inception_taps(num_k)
    w = np.asarray(variables["params"]["tap_weights"])   # (taps, c_in, c_out)
    bias = np.asarray(variables["params"]["bias"])       # (num_k, c_out)
    pad_len = canvas_len - t
    xp = np.concatenate([x, np.zeros((b, pad_len, c_in), np.float32)], axis=1)
    img = xp.reshape(b, rows, period, c_in).transpose(0, 3, 1, 2)  # (B,Cin,R,P)

    out_img = np.zeros((b, c_out, rows, period), np.float32)
    for ki in range(num_k):
        k_size = 2 * ki + 1
        conv = torch.nn.Conv2d(c_in, c_out, k_size, padding=ki)
        # fill weights from the tap table
        wt = np.zeros((c_out, c_in, k_size, k_size), np.float32)
        for tap_idx, (kk, dr, dc) in enumerate(taps):
            if kk != ki:
                continue
            wt[:, :, dr + ki, dc + ki] = w[tap_idx].T
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(wt))
            conv.bias.copy_(torch.tensor(bias[ki]))
        out_img += conv(torch.tensor(img)).detach().numpy()
    out_img /= num_k
    want = out_img.transpose(0, 2, 3, 1).reshape(b, canvas_len, c_out)[:, :t]

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
