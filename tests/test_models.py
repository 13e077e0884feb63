"""Init/forward smoke tests + behavioral checks for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.models import build_model


def tiny_cfg(**kw):
    base = dict(seq_len=32, enc_in=3, num_class=4, num_shapelet=2,
                d_model=16, d_ff=32, n_heads=2, e_layers=1, top_k=2,
                num_kernels=2, dropout=0.1, amp=False, use_pallas=False,
                eegcnn_kernel1=9, eegcnn_kernel2=5, eegcnn_layers=1,
                eegcnn_d_ff=16, eegcnn_n_heads=2)
    base.update(kw)
    return Config(**base)


def init_and_apply(cfg, train=False, gating_value=None):
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(0), (2, cfg.seq_len, cfg.enc_in))
    mask = jnp.ones((2, cfg.seq_len))
    variables = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                           x, mask, train=False)
    out, updates = model.apply(
        variables, x, mask, train=train, gating_value=gating_value,
        rngs={"dropout": jax.random.key(3)} if train else None,
        mutable=["batch_stats"] if train else [])
    return out


@pytest.mark.parametrize("name", ["SBM", "LTS", "EEGCNN"])
def test_basic_models_forward(name):
    logits, info = init_and_apply(tiny_cfg(model=name))
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()
    assert info.loss.shape == (1,)


@pytest.mark.parametrize("dnn", ["FCN", "Transformer", "ResNet", "PatchTST", "TimesNet"])
def test_dnn_backbones_forward(dnn):
    logits, info = init_and_apply(tiny_cfg(model="DNN", dnn_type=dnn))
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("dnn", ["FCN", "Transformer"])
def test_interpgn_forward(dnn):
    logits, info = init_and_apply(tiny_cfg(model="InterpGN", dnn_type=dnn))
    assert logits.shape == (2, 4)
    assert info.eta.shape == (2, 1)
    assert info.shapelet_preds.shape == (2, 4)
    assert info.dnn_preds.shape == (2, 4)
    # blended output really is the eta-mixture
    blend = info.eta * info.shapelet_preds + (1 - info.eta) * info.dnn_preds
    np.testing.assert_allclose(np.asarray(logits), np.asarray(blend), rtol=1e-5)


def test_interpgn_hard_gating():
    """With gating_value=-1 every sample exceeds the threshold -> eta==1 -> pure SBM."""
    logits, info = init_and_apply(tiny_cfg(model="InterpGN", dnn_type="FCN"),
                                  gating_value=-1.0)
    np.testing.assert_allclose(np.asarray(info.eta), 1.0)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(info.shapelet_preds), rtol=1e-6)


@pytest.mark.parametrize("cls", ["linear", "bilinear", "attention"])
def test_sbm_classifier_variants(cls):
    logits, info = init_and_apply(tiny_cfg(model="SBM", sbm_cls=cls))
    assert logits.shape == (2, 4)


def test_sbm_predicate_width():
    cfg = tiny_cfg(model="SBM")
    _, info = init_and_apply(cfg)
    total = len(cfg.shapelet_lengths) * cfg.num_shapelet * cfg.enc_in
    assert info.p.shape == (2, total)
    assert info.d.shape == (2, total)
    # RBF probabilities live in (0, 1]
    p = np.asarray(info.p)
    assert (p > 0).all() and (p <= 1 + 1e-6).all()


def test_train_mode_with_dropout_and_bn():
    logits, info = init_and_apply(tiny_cfg(model="InterpGN", dnn_type="FCN"),
                                  train=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_gradients_flow_to_shapelets():
    cfg = tiny_cfg(model="SBM", dropout=0.0)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(0), (2, cfg.seq_len, cfg.enc_in))
    variables = model.init(jax.random.key(1), x, None, train=False)

    def loss_fn(params):
        logits, info = model.apply({"params": params}, x, None, train=False)
        return jnp.sum(logits ** 2) + info.loss.sum()

    grads = jax.grad(loss_fn)(variables["params"])
    g0 = np.asarray(grads["shapelets_0"])
    assert np.isfinite(g0).all()
    assert np.abs(g0).max() > 0
