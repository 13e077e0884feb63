"""Forecast models assembled from the resurrected layer families
(sie_tpu/models/extra/forecasters.py): forward shapes, one grad step each,
and an end-to-end ForecastExperiment run through the registry."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config

FAMILIES = ["Autoformer", "FEDformer", "ETSformer", "Pyraformer",
            "Crossformer"]


def _cfg(**kw):
    base = dict(model="DNN", seq_len=24, label_len=8, pred_len=8,
                enc_in=3, dec_in=3, c_out=3, d_model=16, d_ff=32, n_heads=2,
                e_layers=2, d_layers=1, moving_avg=5, factor=1, top_k=2,
                dropout=0.1, amp=False, use_pallas=False)
    base.update(kw)
    return Config(**base)


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, cfg.seq_len, cfg.enc_in)),
                    jnp.float32)
    dec = jnp.asarray(
        rng.normal(size=(2, cfg.label_len + cfg.pred_len, cfg.dec_in)),
        jnp.float32)
    return x, dec


@pytest.mark.parametrize("name", FAMILIES)
def test_forecaster_forward_and_grad(name):
    from sie_tpu.train.tasks import build_task_model
    cfg = _cfg(dnn_type=name)
    model = build_task_model(cfg, "forecast")
    x, dec = _batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, None, dec,
                        None)
    out = model.apply(params, x, None, dec, None)
    assert out.shape == (2, cfg.pred_len, cfg.c_out)
    assert bool(jnp.isfinite(out).all())

    def loss_fn(p):
        # Pyraformer's bottleneck convs carry BatchNorm running stats
        y, _ = model.apply({**params, "params": p}, x, None, dec, None,
                           train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params["params"])
    assert bool(jnp.isfinite(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0.0


def test_fedformer_wavelet_variant():
    """attention='wavelet' routes through the multiwavelet self/cross
    blocks (the FEDformer-Wavelets configuration)."""
    from sie_tpu.models.extra.forecasters import AutoformerForecaster
    cfg = _cfg(dnn_type="FEDformer", e_layers=1, seq_len=16, label_len=8,
               pred_len=8, n_heads=2, d_model=16)
    model = AutoformerForecaster(cfg, attention="wavelet")
    x, dec = _batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, None, dec,
                        None)
    out = model.apply(params, x, None, dec, None)
    assert out.shape == (2, cfg.pred_len, cfg.c_out)
    assert bool(jnp.isfinite(out).all())


def test_autoformer_ignores_dec_values_but_uses_shape_protocol():
    """The Autoformer family builds its decoder input from x_enc's
    decomposition; the x_dec VALUES must not affect the output (only the
    marks would). Guards against accidentally wiring x_dec in."""
    from sie_tpu.models.extra.forecasters import AutoformerForecaster
    cfg = _cfg(dnn_type="Autoformer", dropout=0.0)
    model = AutoformerForecaster(cfg)
    x, dec = _batch(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, None, dec,
                        None)
    a = model.apply(params, x, None, dec, None)
    b = model.apply(params, x, None, dec + 100.0, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _write_sine_csv(path, n=320, c=3, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    dates = pd.date_range("2021-01-01", periods=n, freq="h")
    df = pd.DataFrame({"date": dates})
    for i in range(c - 1):
        df[f"f{i}"] = np.sin(2 * np.pi * t / (10 + 3 * i)) \
            + 0.05 * rng.normal(size=n)
    df["OT"] = np.sin(2 * np.pi * t / 16) + 0.05 * rng.normal(size=n)
    df.to_csv(path, index=False)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["Autoformer", "ETSformer", "Crossformer"])
def test_forecast_experiment_extra_families_e2e(tmp_path, name):
    from sie_tpu.train.tasks import ForecastExperiment
    _write_sine_csv(tmp_path / "sines.csv")
    cfg = _cfg(dnn_type=name, data="custom", data_root=str(tmp_path),
               dataset="sines", dropout=0.0, batch_size=16, train_epochs=4,
               patience=4, lr=5e-3, seed=0)
    exp = ForecastExperiment(cfg)
    init = exp.init_params(0)
    base = exp.evaluate(init, exp.val_data)
    params = exp.train(seed=0)
    trained = exp.evaluate(params, exp.val_data)
    assert np.isfinite(trained)
    assert trained < base, (trained, base)
    m = exp.test(params)
    assert all(np.isfinite(v) for v in m.values())
