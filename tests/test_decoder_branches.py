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


def _backbone_branch_cases():
    from sie_tpu.models.patchtst import (PatchTSTAnomalyDetector,
                                         PatchTSTForecaster, PatchTSTImputer)
    from sie_tpu.models.timesnet import (TimesNetAnomalyDetector,
                                         TimesNetForecaster, TimesNetImputer)
    return [("TimesNet", TimesNetForecaster, TimesNetImputer,
             TimesNetAnomalyDetector),
            ("PatchTST", PatchTSTForecaster, PatchTSTImputer,
             PatchTSTAnomalyDetector)]


@pytest.mark.parametrize("name,fc_cls,im_cls,an_cls",
                         _backbone_branch_cases(),
                         ids=["TimesNet", "PatchTST"])
def test_backbone_branch_shapes_and_denorm(name, fc_cls, im_cls, an_cls):
    """Forecast/imputation/anomaly branches of the TSlib backbones (reference
    TimesNet.py:107-183, PatchTST.py:79-179): output shapes, and the
    NS-norm/de-norm sandwich makes every branch exactly affine-equivariant —
    f(a*x + b) == a*f(x) + b for per-channel affine maps."""
    cfg = small_cfg(dnn_type=name, top_k=2, num_kernels=2, d_ff=16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)), jnp.float32)
    a = jnp.asarray([1.7, 0.4, 3.0])[None, None, :]
    b = jnp.asarray([-2.0, 5.0, 0.3])[None, None, :]

    fc = fc_cls(cfg)
    v = fc.init(jax.random.key(0), x)
    out = fc.apply(v, x)
    assert out.shape == (2, cfg.pred_len, cfg.c_out)
    out2 = fc.apply(v, a * x + b)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(a * out + b),
                               rtol=2e-4, atol=2e-4)

    an = an_cls(cfg)
    v = an.init(jax.random.key(1), x)
    out = an.apply(v, x)
    assert out.shape == (2, cfg.seq_len, cfg.c_out)
    out2 = an.apply(v, a * x + b)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(a * out + b),
                               rtol=2e-4, atol=2e-4)

    im = im_cls(cfg)
    mask = jnp.ones_like(x).at[:, ::3, :].set(0.0)
    v = im.init(jax.random.key(2), x, None, mask)
    out = im.apply(v, x, None, mask)
    assert out.shape == (2, cfg.seq_len, cfg.c_out)
    # masked stats: zeroing an OBSERVED point changes the output; zeroing an
    # already-masked point does not (its value never enters the network)
    x_masked_edit = x.at[:, 0, :].set(0.0)        # t=0 is masked (0 % 3 == 0)
    np.testing.assert_allclose(np.asarray(im.apply(v, x_masked_edit, None, mask)),
                               np.asarray(out), rtol=1e-6, atol=1e-6)
    x_obs_edit = x.at[:, 1, :].add(10.0)          # t=1 is observed
    assert np.abs(np.asarray(im.apply(v, x_obs_edit, None, mask))
                  - np.asarray(out)).max() > 1e-3


@pytest.mark.parametrize("name,fc_cls,im_cls,an_cls",
                         _backbone_branch_cases(),
                         ids=["TimesNet", "PatchTST"])
def test_backbone_branch_grads_finite(name, fc_cls, im_cls, an_cls):
    cfg = small_cfg(dnn_type=name, top_k=2, num_kernels=2, d_ff=16)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)), jnp.float32)
    fc = fc_cls(cfg)
    v = fc.init(jax.random.key(0), x)
    g = jax.grad(lambda p: jnp.sum(fc.apply(p, x) ** 2))(v)
    assert all(jax.tree.leaves(
        jax.tree.map(lambda z: bool(jnp.isfinite(z).all()), g)))


def test_patchtst_classification_tree_unchanged_by_refactor():
    """The _PatchBase refactor must not move the classification params."""
    from sie_tpu.models.patchtst import PatchTST
    cfg = small_cfg(dnn_type="PatchTST")
    x = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    v = PatchTST(cfg).init(jax.random.key(0), x)
    top = set(v["params"].keys())
    assert top == {"value_embedding", "enc_scan", "projection"}


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
