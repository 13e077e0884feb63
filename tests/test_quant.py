"""int8 weight-only quantization for serving (sie_tpu/quant.py + the
Predictor's quantized-bundle path in sie_tpu/serve.py).

Beyond-reference deployment feature (the reference serves in f32 by
re-running the torch Experiment, exp/experiment_classification.py:828)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu import quant
from sie_tpu.config import Config
from sie_tpu.serve import Predictor


def test_tensor_roundtrip_error_bound():
    """Symmetric per-channel int8: |w - dq(q(w))| <= scale/2 everywhere."""
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(64, 96)) * rng.uniform(0.01, 10, size=96)
         ).astype(np.float32)
    t = quant.quantize_tensor(w)
    assert t.q.dtype == np.int8 and t.scale.shape == (1, 96)
    err = np.abs(w - np.asarray(quant.dequantize_tensor(t)))
    assert (err <= np.asarray(t.scale) / 2 + 1e-7).all()


def test_zero_channel_safe():
    w = np.zeros((16, 8), np.float32)
    t = quant.quantize_tensor(w)
    np.testing.assert_array_equal(np.asarray(quant.dequantize_tensor(t)), w)


def test_size_and_exclude_gates():
    params = {"big": np.ones((64, 64), np.float32),
              "small": np.ones((4, 4), np.float32),
              "bias": np.ones((4096,), np.float32),
              "keep": {"kernel": np.ones((64, 64), np.float32)}}
    q = quant.quantize_params(params, min_size=1024, exclude=("keep",))
    assert isinstance(q["big"], quant.QTensor)
    assert isinstance(q["small"], np.ndarray)       # below min_size
    assert isinstance(q["bias"], np.ndarray)        # ndim < 2
    assert isinstance(q["keep"]["kernel"], np.ndarray)  # excluded
    assert quant.has_quantized(q) and not quant.has_quantized(params)


def test_npz_tree_roundtrip(tmp_path):
    """Flat .npz round-trip rebuilds the exact tree — including a module
    genuinely named 'q' (the EEGCNN attention Dense), which must NOT be
    mistaken for a QTensor container."""
    variables = {
        "params": {"enc": {"q": {"kernel": np.ones((64, 64), np.float32),
                                 "bias": np.zeros((64,), np.float32)},
                           "scale": np.full((8, 256), 2.0, np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros((3,), np.float32)}},
    }
    p = str(tmp_path / "w.npz")
    quant.save_quantized(p, variables, min_size=1024)
    back = quant.load_quantized(p)
    assert isinstance(back["params"]["enc"]["q"]["kernel"], quant.QTensor)
    assert isinstance(back["params"]["enc"]["scale"], quant.QTensor)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize_tensor(back["params"]["enc"]["scale"])),
        variables["params"]["enc"]["scale"])
    np.testing.assert_array_equal(back["params"]["enc"]["q"]["bias"],
                                  variables["params"]["enc"]["q"]["bias"])
    np.testing.assert_array_equal(back["batch_stats"]["bn"]["mean"],
                                  variables["batch_stats"]["bn"]["mean"])


def _toy_predictor(tmp_path, **cfg_kw):
    from sie_tpu.models import build_model
    cfg = Config(model="InterpGN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, num_shapelet=2, d_model=16, d_ff=32, n_heads=2,
                 e_layers=1, dropout=0.0, amp=False, use_pallas=False,
                 seed=0, **cfg_kw)
    model = build_model(cfg)
    x = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    mask = jnp.ones((2, cfg.seq_len), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, x, mask,
                           train=False)
    variables = jax.device_get(variables)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    return cfg, Predictor(cfg, v)


def test_quantized_bundle_serves_close_to_f32(tmp_path):
    cfg, pred = _toy_predictor(tmp_path)
    f32_dir = str(tmp_path / "f32")
    q_dir = str(tmp_path / "q")
    pred.save_bundle(f32_dir)
    pred.save_bundle(q_dir, quantize=True, min_size=256)
    assert os.path.exists(os.path.join(q_dir, "weights_q.npz"))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    out_f = Predictor.load_bundle(f32_dir).predict(x)
    qpred = Predictor.load_bundle(q_dir)
    assert quant.has_quantized(qpred.variables["params"])
    out_q = qpred.predict(x)
    # int8 weights: logits close, softmax probs close
    np.testing.assert_allclose(out_q.logits, out_f.logits,
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(out_q.probs, out_f.probs, atol=0.02)


@pytest.mark.slow
def test_cli_quantized_bundle_accuracy(tmp_path):
    """Train via CLI with --export_bundle --quantize_bundle; the int8 bundle
    must reproduce the Experiment's test accuracy on a separable set, and be
    smaller than the f32 msgpack bundle."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import run as run_cli
    from sie_tpu.data.provider import data_provider
    from sie_tpu.data.synthetic import write_synthetic_uea

    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12, n_dims=2,
                        length=30, n_classes=2, seed=1)
    bundle = str(tmp_path / "bundle")
    common = ["--data", "UEA", "--data_root", str(tmp_path), "--dataset",
              "Toy", "--model", "InterpGN", "--dnn_type", "FCN",
              "--num_shapelet", "2", "--batch_size", "8", "--train_epochs",
              "2", "--patience", "3", "--seed", "0", "--no-amp",
              "--no_pallas", "--checkpoint_dir", str(tmp_path / "ckpt"),
              "--result_dir", str(tmp_path / "result"),
              "--cache_dir", str(tmp_path / "cache")]
    results = run_cli.main(common + ["--export_bundle", bundle,
                                     "--quantize_bundle"])
    _seed, _loss, metrics = results[0]

    pred = Predictor.load_bundle(bundle)
    assert quant.has_quantized(pred.variables["params"])
    test_data, _ = data_provider(pred.cfg, "test")
    out = pred.predict(test_data.x)
    acc = 100.0 * float((out.classes == test_data.y).mean())
    assert abs(acc - metrics["accuracy"]) < 1e-6

    qsize = os.path.getsize(os.path.join(bundle, "weights_q.npz"))
    # the f32 equivalent of the quantized leaves alone is > 2x the npz
    n_quant_bytes = sum(
        4 * l.q.size for l in jax.tree.leaves(
            pred.variables["params"], is_leaf=quant._is_q)
        if isinstance(l, quant.QTensor))
    assert qsize < n_quant_bytes / 2


def test_bundle_reexport_switches_format(tmp_path):
    """Re-exporting a bundle in-place must not leave the other weight
    format behind (load prefers weights_q.npz)."""
    cfg, pred = _toy_predictor(tmp_path)
    d = str(tmp_path / "b")
    pred.save_bundle(d, quantize=True, min_size=256)
    assert os.path.exists(os.path.join(d, "weights_q.npz"))
    pred.save_bundle(d)                       # back to f32 in-place
    assert not os.path.exists(os.path.join(d, "weights_q.npz"))
    assert not quant.has_quantized(
        Predictor.load_bundle(d).variables["params"])
    pred.save_bundle(d, quantize=True, min_size=256)
    assert not os.path.exists(os.path.join(d, "checkpoint.msgpack"))
    assert quant.has_quantized(
        Predictor.load_bundle(d).variables["params"])


def test_stale_calibration_cleared_on_resave(tmp_path):
    cfg, pred = _toy_predictor(tmp_path)
    d = str(tmp_path / "b2")
    pred.temperature = 2.5
    pred.save_bundle(d)
    assert Predictor.load_bundle(d).temperature == 2.5
    pred.temperature = 1.0
    pred.save_bundle(d)                       # re-export uncalibrated
    assert Predictor.load_bundle(d).temperature == 1.0
