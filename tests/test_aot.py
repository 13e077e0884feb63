"""Ahead-of-time StableHLO serving artifacts (serve.py:export_stablehlo +
CompiledPredictor): weights baked in as constants, bucket padding/chunking
parity with the live Predictor, platform binding, quantized-bundle export."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config
from sie_tpu.serve import CompiledPredictor, Predictor


@pytest.fixture(scope="module")
def pred():
    from sie_tpu.models import build_model
    cfg = Config(model="InterpGN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, num_shapelet=2, d_model=16, d_ff=32,
                 n_heads=2, e_layers=1, dropout=0.0, amp=False,
                 use_pallas=False, seed=0)
    model = build_model(cfg)
    x0 = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, cfg.seq_len)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    return Predictor(cfg, v)


def test_export_load_and_bucket_parity(pred, tmp_path):
    d = str(tmp_path / "aot")
    pred.export_stablehlo(d, batch_sizes=(4, 8))
    files = sorted(os.listdir(d))
    assert "manifest.json" in files
    assert "bucket_4.stablehlo" in files and "bucket_8.stablehlo" in files

    cp = CompiledPredictor(d)
    rng = np.random.default_rng(0)
    for b in (3, 4, 10):     # pad-to-4, exact, chunk 8 + pad 2->4
        x = rng.normal(size=(b, pred.cfg.seq_len, pred.cfg.enc_in)
                       ).astype(np.float32)
        out = cp.predict(x)
        live = pred.predict(x)
        np.testing.assert_allclose(out.logits, live.logits, atol=1e-5)
        assert out.classes.tolist() == live.classes.tolist()
        assert out.eta is not None       # InterpGN aux outputs exported


def test_platform_binding(pred, tmp_path):
    d = str(tmp_path / "aot")
    pred.export_stablehlo(d, batch_sizes=(1,))
    mf = json.load(open(os.path.join(d, "manifest.json")))
    assert mf["platform"] == jax.default_backend()
    mf["platform"] = "not_a_platform"
    json.dump(mf, open(os.path.join(d, "manifest.json"), "w"))
    with pytest.raises(RuntimeError, match="exported for"):
        CompiledPredictor(d)


def test_bad_shape_rejected(pred, tmp_path):
    d = str(tmp_path / "aot")
    pred.export_stablehlo(d, batch_sizes=(1,))
    cp = CompiledPredictor(d)
    with pytest.raises(ValueError, match="x must be"):
        cp.predict(np.zeros((1, 5, 5), np.float32))


def test_quantized_weights_bake_in(pred, tmp_path):
    """Export from an int8-quantized bundle: the dequant lives in the graph
    and the artifact still reproduces the f32 predictor closely."""
    qdir = str(tmp_path / "qbundle")
    pred.save_bundle(qdir, quantize=True, min_size=256)
    qpred = Predictor.load_bundle(qdir)
    d = str(tmp_path / "aot_q")
    qpred.export_stablehlo(d, batch_sizes=(4,))
    cp = CompiledPredictor(d)
    x = np.random.default_rng(1).normal(
        size=(4, pred.cfg.seq_len, pred.cfg.enc_in)).astype(np.float32)
    np.testing.assert_allclose(cp.predict(x).logits,
                               qpred.predict(x).logits, atol=1e-5)


def test_temperature_travels_into_artifact(pred, tmp_path):
    pred.temperature = 3.0
    try:
        d = str(tmp_path / "aot_t")
        pred.export_stablehlo(d, batch_sizes=(4,))
        cp = CompiledPredictor(d)
        assert cp.manifest["temperature"] == 3.0
        x = np.random.default_rng(2).normal(
            size=(4, pred.cfg.seq_len, pred.cfg.enc_in)).astype(np.float32)
        np.testing.assert_allclose(cp.predict(x).probs,
                                   pred.predict(x).probs, atol=1e-5)
        np.testing.assert_allclose(cp.predict(x).logits,
                                   pred.predict(x).logits, atol=1e-5)
    finally:
        pred.temperature = 1.0
