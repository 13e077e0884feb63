"""Decoder stack + forecast/imputation/anomaly Transformer branches
(reference Transformer_EncDec.py:6-135, Transformer.py:74-96 — unreachable
from the reference CLI; library-surface parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.models.layers import ConvLayer, Decoder, DecoderLayer


def small_cfg(**kw):
    base = dict(data="UEA", dataset="toy", model="DNN", dnn_type="Transformer",
                seq_len=24, enc_in=3, dec_in=3, c_out=3, num_class=2,
                d_model=16, d_ff=32, n_heads=2, e_layers=1, d_layers=1,
                label_len=6, pred_len=8, dropout=0.0, amp=False,
                use_pallas=False, seed=0)
    base.update(kw)
    return Config(**base)


def test_conv_layer_matches_torch():
    """Distil ConvLayer vs the reference's torch layer: same weights ->
    same output (incl. circular padding + maxpool length semantics)."""
    import torch
    import torch.nn as tnn

    b, t, d = 2, 20, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    tconv = tnn.Conv1d(d, d, kernel_size=3, padding=2, padding_mode="circular")
    tnorm = tnn.BatchNorm1d(d)
    tnorm.eval()
    with torch.no_grad():
        h = tconv(torch.from_numpy(x).permute(0, 2, 1))
        h = tnn.functional.elu(tnorm(h))
        want = tnn.functional.max_pool1d(h, 3, stride=2, padding=1)
        want = want.transpose(1, 2).numpy()

    layer = ConvLayer(d)
    v = layer.init(jax.random.key(0), jnp.asarray(x))
    # graft the torch weights (torch conv weight (out, in, k) -> flax (k, in, out))
    v = jax.tree_util.tree_map(lambda z: z, v)
    params = {"downConv": {"kernel": jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy())},
        "norm": {"scale": jnp.asarray(tnorm.weight.detach().numpy()),
                 "bias": jnp.asarray(tnorm.bias.detach().numpy())}}
    stats = {"norm": {"mean": jnp.asarray(tnorm.running_mean.numpy()),
                      "var": jnp.asarray(tnorm.running_var.numpy())}}
    got = layer.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_decoder_self_attention_is_causal():
    """Output at decoder position t must not depend on dec inputs > t."""
    cfg = small_cfg()
    dec = Decoder(cfg.d_model, cfg.d_ff, cfg.n_heads, 1, cfg.c_out)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 10, cfg.d_model)), jnp.float32)
    cross = jnp.asarray(rng.normal(size=(1, 24, cfg.d_model)), jnp.float32)
    v = dec.init(jax.random.key(0), x, cross)
    base = dec.apply(v, x, cross)
    x2 = x.at[:, 7:, :].add(100.0)          # perturb the future
    out2 = dec.apply(v, x2, cross)
    np.testing.assert_allclose(np.asarray(base[:, :7]),
                               np.asarray(out2[:, :7]), atol=1e-5)
    assert np.abs(np.asarray(base[:, 7:]) - np.asarray(out2[:, 7:])).max() > 1e-3


def test_forecaster_shapes_and_grads():
    from sie_tpu.models.transformer import TransformerForecaster

    cfg = small_cfg()
    model = TransformerForecaster(cfg)
    rng = np.random.default_rng(2)
    x_enc = jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)),
                        jnp.float32)
    x_dec = jnp.asarray(rng.normal(
        size=(2, cfg.label_len + cfg.pred_len, cfg.dec_in)), jnp.float32)
    v = model.init(jax.random.key(0), x_enc, None, x_dec, None)
    out = model.apply(v, x_enc, None, x_dec, None)
    assert out.shape == (2, cfg.pred_len, cfg.c_out)
    g = jax.grad(lambda p: jnp.sum(model.apply(
        p, x_enc, None, x_dec, None) ** 2))(v)
    finite = jax.tree.map(lambda z: bool(jnp.isfinite(z).all()), g)
    assert all(jax.tree.leaves(finite))


def test_imputer_and_anomaly_shapes():
    from sie_tpu.models.transformer import (TransformerAnomalyDetector,
                                            TransformerImputer)

    cfg = small_cfg()
    model = TransformerImputer(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)), jnp.float32)
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x)
    assert out.shape == (2, cfg.seq_len, cfg.c_out)
    assert TransformerAnomalyDetector is TransformerImputer
