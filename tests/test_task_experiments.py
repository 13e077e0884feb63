"""Forecast / imputation / anomaly experiment loops (train/tasks.py) —
end-to-end on synthetic data. These complete the reference's TSlib-lineage
library surface (loaders + backbone branches) with runnable experiments."""

import numpy as np
import pandas as pd
import pytest

from sie_tpu.config import Config


def _cfg(**kw):
    base = dict(model="DNN", dnn_type="Transformer", seq_len=24, label_len=8,
                pred_len=8, d_model=16, d_ff=32, n_heads=2, e_layers=1,
                d_layers=1, dropout=0.0, amp=False, use_pallas=False,
                batch_size=16, train_epochs=8, patience=8, lr=5e-3,
                seed=0)
    base.update(kw)
    return Config(**base)


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


def test_forecast_experiment_trains_and_tests(tmp_path):
    from sie_tpu.train.tasks import ForecastExperiment
    _write_sine_csv(tmp_path / "sines.csv")
    cfg = _cfg(data="custom", data_root=str(tmp_path), dataset="sines")
    exp = ForecastExperiment(cfg)
    init = exp.init_params(0)
    base = exp.evaluate(init, exp.val_data)
    params = exp.train(seed=0)
    trained = exp.evaluate(params, exp.val_data)
    assert np.isfinite(trained)
    assert trained < base, (trained, base)
    m = exp.test(params)
    assert set(m) == {"mse", "mae", "rmse", "mape", "mspe"}
    assert all(np.isfinite(v) for v in m.values())
    # a sine is very predictable: beat the trivial variance baseline (~0.5)
    assert m["mse"] < 0.45


def test_forecast_experiment_ms_mode(tmp_path):
    from sie_tpu.train.tasks import ForecastExperiment
    _write_sine_csv(tmp_path / "sines.csv")
    cfg = _cfg(data="custom", data_root=str(tmp_path), dataset="sines",
               features="MS", train_epochs=1)
    exp = ForecastExperiment(cfg)
    params = exp.train(seed=0)
    m = exp.test(params)
    assert np.isfinite(m["mse"])


@pytest.mark.slow
def test_forecast_experiment_m4_timesnet(tmp_path):
    from sie_tpu.train.tasks import ForecastExperiment
    rng = np.random.default_rng(1)
    rows_tr = {"V1": [f"Y{i}" for i in range(8)]}
    rows_te = {"V1": rows_tr["V1"]}
    for j in range(40):
        rows_tr[f"c{j}"] = 10 + rng.uniform(size=8)
    for j in range(6):
        rows_te[f"c{j}"] = 10 + rng.uniform(size=8)
    pd.DataFrame(rows_tr).to_csv(tmp_path / "Yearly-train.csv", index=False)
    pd.DataFrame(rows_te).to_csv(tmp_path / "Yearly-test.csv", index=False)
    cfg = _cfg(data="m4", data_root=str(tmp_path), dataset="m4",
               seasonal_patterns="Yearly", dnn_type="TimesNet",
               seq_len=12, top_k=2, num_kernels=2, train_epochs=2,
               batch_size=4)
    exp = ForecastExperiment(cfg)
    assert exp.cfg.pred_len == 6      # M4Meta horizon overrides pred_len
    params = exp.train(seed=0)
    m = exp.test(params)
    assert np.isfinite(m["mse"])


def test_short_term_m4_smape_and_owa_bridge(tmp_path):
    """short_term_forecast = M4 protocol: sMAPE objective, sMAPE metric, and
    the {group}_forecast.csv -> M4Summary OWA evaluation round-trip."""
    from sie_tpu.data.m4 import M4Dataset, M4Meta, build_m4_cache
    from sie_tpu.train.tasks import ShortTermForecastExperiment
    from sie_tpu.utils.m4_summary import M4Summary

    rng = np.random.default_rng(5)
    n_series, train_len, horizon = 6, 30, 6
    rows_tr = {"V1": [f"Y{i + 1}" for i in range(n_series)]}
    rows_te = {"V1": rows_tr["V1"]}
    for j in range(train_len):
        rows_tr[f"c{j}"] = rng.uniform(10, 100, n_series)
    for j in range(horizon):
        rows_te[f"c{j}"] = rng.uniform(10, 100, n_series)
    pd.DataFrame(rows_tr).to_csv(tmp_path / "Yearly-train.csv", index=False)
    pd.DataFrame(rows_te).to_csv(tmp_path / "Yearly-test.csv", index=False)
    cache = tmp_path / "m4cache"
    build_m4_cache({"Yearly": (str(tmp_path / "Yearly-train.csv"),
                               str(tmp_path / "Yearly-test.csv"))}, str(cache))

    cfg = _cfg(data="m4", data_root=str(cache), dataset="m4",
               seasonal_patterns="Yearly", seq_len=12, train_epochs=2,
               batch_size=4)
    exp = ShortTermForecastExperiment(cfg)
    assert exp.cfg.pred_len == M4Meta.horizons_map["Yearly"] == horizon
    params = exp.train(seed=0)
    m = exp.test(params)
    assert "smape" in m and np.isfinite(m["smape"])
    assert 0.0 <= m["smape"] <= 200.0

    fdir = tmp_path / "forecasts"
    path = exp.write_forecast_csv(params, str(fdir))
    fc = pd.read_csv(path)
    assert fc.shape == (n_series, horizon)

    # naive2 submission (last train value repeated) -> finite OWA
    tr = M4Dataset.load(True, str(cache))
    naive_rows = [[sid] + [float(tr.values[i][-1])] * horizon
                  for i, sid in enumerate(tr.ids)]
    pd.DataFrame(naive_rows).to_csv(cache / "submission-Naive2.csv",
                                    index=False)
    smape, owa, _mape, mase = M4Summary(str(fdir) + "/", str(cache)).evaluate()
    assert set(owa) == {"Yearly", "Average"}
    assert all(np.isfinite(v) for v in owa.values())
    assert all(np.isfinite(v) for v in mase.values())


def test_imputation_experiment(tmp_path):
    from sie_tpu.train.tasks import ImputationExperiment
    _write_sine_csv(tmp_path / "sines.csv")
    cfg = _cfg(data="custom", data_root=str(tmp_path), dataset="sines",
               dnn_type="PatchTST", mask_rate=0.25, train_epochs=3)
    exp = ImputationExperiment(cfg)
    assert exp.cfg.pred_len == 0
    init = exp.init_params(0)
    base = exp.evaluate(init, exp.val_data)
    params = exp.train(seed=0)
    trained = exp.evaluate(params, exp.val_data)
    assert trained < base, (trained, base)
    m = exp.test(params)
    assert set(m) == {"mse", "mae"} and np.isfinite(m["mse"])


def test_anomaly_experiment_detects_spikes(tmp_path):
    from sie_tpu.train.tasks import AnomalyExperiment
    rng = np.random.default_rng(3)
    c, n_tr, n_te = 4, 1200, 600
    train = rng.normal(scale=0.1, size=(n_tr, c))
    test = rng.normal(scale=0.1, size=(n_te, c))
    labels = np.zeros(n_te, np.float32)
    for lo in (100, 300, 500):
        test[lo: lo + 12] += 8.0       # injected anomaly segments
        labels[lo: lo + 12] = 1.0
    np.save(tmp_path / "SMD_train.npy", train)
    np.save(tmp_path / "SMD_test.npy", test)
    np.save(tmp_path / "SMD_test_label.npy", labels)
    # threshold percentile over the POOLED train+test energies: 36 anomalous
    # of 1200 pooled points -> ratio 3%
    cfg = _cfg(data="SMD", data_root=str(tmp_path), seq_len=50,
               train_epochs=2, batch_size=8, anomaly_ratio=3.0)
    exp = AnomalyExperiment(cfg)
    params = exp.train(seed=0)
    m = exp.test(params)
    assert set(m) == {"threshold", "accuracy", "precision", "recall", "f1"}
    # 8-sigma spikes against 0.1-sigma noise must be detected
    assert m["f1"] > 0.8, m


def test_adjust_predictions_segment_rule():
    from sie_tpu.train.tasks import adjust_predictions
    gt = np.array([0, 1, 1, 1, 0, 1, 1, 0], np.int32)
    pred = np.array([0, 0, 1, 0, 0, 0, 0, 1], np.int32)
    adj = adjust_predictions(gt, pred)
    # first segment: one hit -> whole segment credited; second: no hit -> stays
    np.testing.assert_array_equal(adj, [0, 1, 1, 1, 0, 0, 0, 1])


def test_run_cli_forecast_dispatch(tmp_path):
    """run.py --task_name long_term_forecast trains/tests end-to-end and
    pickles the metrics (TPU-side extension of reference run.py:103)."""
    import run as run_mod
    _write_sine_csv(tmp_path / "sines.csv")
    res = run_mod.main([
        "--task_name", "long_term_forecast", "--data", "custom",
        "--dataset", "sines", "--data_root", str(tmp_path),
        "--seq_len", "24", "--label_len", "8", "--pred_len", "8",
        "--d_model", "16", "--d_ff", "32", "--n_heads", "2",
        "--e_layers", "1", "--d_layers", "1", "--dropout", "0.0",
        "--train_epochs", "1", "--batch_size", "16", "--seed", "0",
        "--no-amp", "--no_pallas", "--model", "DNN",
        "--dnn_type", "Transformer",
        "--result_dir", str(tmp_path / "results"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    seed, _, metrics = res[0]
    assert seed == 0 and np.isfinite(metrics["mse"])
    assert (tmp_path / "results" / "DNN"
            / "long_term_forecast_seed0.pkl").exists()


def test_build_task_model_rejects_unbranched_backbone():
    from sie_tpu.train.tasks import build_task_model
    with pytest.raises(ValueError, match="no forecast branch"):
        build_task_model(_cfg(dnn_type="FCN"), "forecast")
