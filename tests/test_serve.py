"""Serving surface (sie_tpu/serve.py): checkpoint loading, bucket padding
correctness (padded rows never change real rows), chunking, bundle
round-trip, mesh data-parallel serving, gating semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config
from sie_tpu.serve import Predictor, config_from_json, config_to_json
from sie_tpu.train import checkpoint as ckpt


def _cfg(**kw):
    base = dict(model="InterpGN", dnn_type="FCN", seq_len=24, enc_in=3,
                num_class=4, num_shapelet=2, d_model=16, d_ff=32, n_heads=2,
                e_layers=1, dropout=0.0, amp=False, use_pallas=False, seed=0)
    base.update(kw)
    return Config(**base)


def _save_random_ckpt(cfg, path, seed=0):
    """Init a model and save its (random) params like the Experiment does."""
    from sie_tpu.models import build_model
    model = build_model(cfg)
    x = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    mask = jnp.ones((2, cfg.seq_len), jnp.float32)
    variables = model.init({"params": jax.random.key(seed),
                            "dropout": jax.random.key(seed + 1)},
                           x, mask, train=False)
    ckpt.save_checkpoint(path, jax.device_get(variables["params"]),
                         jax.device_get(variables.get("batch_stats", {})))
    return model, variables


def _direct_logits(model, variables, x, gating_value=None):
    mask = jnp.ones(x.shape[:2], jnp.float32)
    logits, _ = model.apply(variables, jnp.asarray(x), mask, train=False,
                            gating_value=gating_value)
    return np.asarray(jax.device_get(logits), np.float32)


@pytest.fixture
def toy(tmp_path):
    cfg = _cfg(checkpoint_dir=str(tmp_path))
    model, variables = _save_random_ckpt(cfg, str(tmp_path / "ck"))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    return cfg, model, variables, x, str(tmp_path / "ck")


def test_bucket_padding_matches_unpadded(toy):
    """Batch 5 pads to bucket 8; outputs must equal direct unpadded apply."""
    cfg, model, variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    out = pred.predict(x)
    assert out.logits.shape == (5, cfg.num_class)
    np.testing.assert_allclose(out.logits, _direct_logits(model, variables, x),
                               rtol=1e-5, atol=1e-5)
    assert out.eta.shape == (5, 1)
    assert out.p is not None and out.p.shape[0] == 5
    np.testing.assert_allclose(out.probs.sum(-1), 1.0, rtol=1e-5)
    assert (out.classes == np.argmax(out.logits, -1)).all()


def test_bucket_reuse_no_recompile(toy):
    cfg, _model, _variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    pred.predict(x[:5])     # bucket 8
    pred.predict(x[:3])     # bucket 4
    pred.predict(x[:4])     # bucket 4 again — same program
    assert sorted(b for b, _ in pred._compiled) == [4, 8]


def test_chunking_large_batch(toy):
    cfg, model, variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck, max_batch=4)
    big = np.concatenate([x, x])                       # 10 rows, chunks 4+4+2
    out = pred.predict(big)
    assert out.logits.shape == (10, cfg.num_class)
    np.testing.assert_allclose(
        out.logits, _direct_logits(model, variables, big),
        rtol=1e-5, atol=1e-5)


def test_empty_batch(toy):
    cfg, _model, _variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    out = pred.predict(x[:0])
    assert out.logits.shape == (0, cfg.num_class)
    assert out.classes.shape == (0,)


def test_bundle_roundtrip(toy, tmp_path):
    cfg, model, variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    bundle = str(tmp_path / "bundle")
    pred.save_bundle(bundle)
    pred2 = Predictor.load_bundle(bundle)
    np.testing.assert_allclose(pred.predict(x).logits,
                               pred2.predict(x).logits, rtol=1e-6)
    # config survives the JSON round trip with tuple fields intact
    cfg2 = config_from_json(config_to_json(cfg))
    assert cfg2 == cfg
    assert isinstance(cfg2.shapelet_lengths, tuple)


def test_gating_value_override(toy):
    """gating_value flows to the model (reference InterpGN.py:48-50): a
    threshold of 0 hard-gates every sample to the SBM branch."""
    cfg, _model, _variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    gated = pred.predict(x, gating_value=0.0)
    np.testing.assert_allclose(gated.logits, gated.shapelet_preds,
                               rtol=1e-5, atol=1e-5)
    assert np.allclose(gated.eta, 1.0)
    ungated = pred.predict(x, gating_value=None)
    assert not np.allclose(ungated.logits, ungated.shapelet_preds)


def test_mesh_data_parallel_serving(toy):
    cfg, model, variables, x, ck = toy
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck, mesh=mesh)
    assert pred._bucket(5) == 8    # buckets respect the data-axis size
    out = pred.predict(x)
    np.testing.assert_allclose(out.logits, _direct_logits(model, variables, x),
                               rtol=1e-5, atol=1e-5)


def test_dnn_model_no_interpretability(tmp_path):
    cfg = _cfg(model="DNN", checkpoint_dir=str(tmp_path))
    _model, _variables = _save_random_ckpt(cfg, str(tmp_path / "ck"))
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=str(tmp_path / "ck"))
    out = pred.predict(np.zeros((2, cfg.seq_len, cfg.enc_in), np.float32))
    assert out.logits.shape == (2, cfg.num_class)
    assert out.eta is None and out.p is None


def test_missing_checkpoint_raises(tmp_path):
    cfg = _cfg(checkpoint_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError):
        Predictor.from_checkpoint(cfg, ckpt_dir=str(tmp_path / "nope"))


def test_warmup_compiles_buckets(toy):
    cfg, _model, _variables, _x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck, max_batch=8)
    pred.warmup(batch_sizes=(3, 20))
    assert sorted(b for b, _ in pred._compiled) == [4, 8]


@pytest.mark.slow
def test_cli_export_bundle_and_serve(tmp_path):
    """Full train -> --export_bundle -> Predictor.load_bundle flow; the
    served predictions must reproduce the Experiment's test accuracy."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import run as run_cli
    from sie_tpu.data.synthetic import write_synthetic_uea

    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12, n_dims=2,
                        length=30, n_classes=2, seed=1)
    bundle = str(tmp_path / "bundle")
    results = run_cli.main([
        "--data", "UEA", "--data_root", str(tmp_path), "--dataset", "Toy",
        "--model", "InterpGN", "--dnn_type", "FCN", "--num_shapelet", "2",
        "--batch_size", "8", "--train_epochs", "2", "--patience", "3",
        "--seed", "0", "--no-amp", "--no_pallas",
        "--export_bundle", bundle,
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--result_dir", str(tmp_path / "result"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    _seed, _loss, metrics = results[0]

    pred = Predictor.load_bundle(bundle)
    from sie_tpu.data.provider import data_provider
    test_data, _ = data_provider(pred.cfg, "test")
    out = pred.predict(test_data.x)
    acc = 100.0 * float((out.classes == test_data.y).mean())
    assert abs(acc - metrics["accuracy"]) < 1e-6


def test_temperature_calibration(toy, tmp_path):
    """calibrate() fits T minimizing NLL on held-out data: calibrated NLL
    <= raw NLL, classes unchanged, T persists through bundle round-trip."""
    cfg, model, variables, x, ck = toy
    pred = Predictor.from_checkpoint(cfg, ckpt_dir=ck)
    rng = np.random.default_rng(1)
    xv = rng.normal(size=(16, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    yv = rng.integers(0, cfg.num_class, 16)

    raw = pred.predict(xv)
    t = pred.calibrate(xv, yv)
    assert 0.05 <= t <= 20.0
    cal = pred.predict(xv)
    np.testing.assert_array_equal(cal.classes, raw.classes)
    np.testing.assert_allclose(cal.logits, raw.logits, atol=1e-6)

    def nll(probs):
        return -np.mean(np.log(probs[np.arange(len(yv)), yv] + 1e-12))

    assert nll(cal.probs) <= nll(raw.probs) + 1e-9

    bundle = str(tmp_path / "calb")
    pred.save_bundle(bundle)
    back = Predictor.load_bundle(bundle)
    assert back.temperature == pytest.approx(t, rel=1e-6)
    np.testing.assert_allclose(back.predict(xv).probs, cal.probs, atol=1e-5)
