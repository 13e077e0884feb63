"""Forecast / anomaly / M4 loader tests (capability-parity branches)."""

import numpy as np
import pandas as pd
import pytest

from sie_tpu.data.anomaly import load_segments
from sie_tpu.data.forecast import load_forecast_csv, load_m4_csv


def _write_csv(path, n=400, c=3):
    rng = np.random.default_rng(0)
    dates = pd.date_range("2020-01-01", periods=n, freq="h")
    df = pd.DataFrame({"date": dates})
    for i in range(c - 1):
        df[f"f{i}"] = rng.normal(size=n)
    df["OT"] = rng.normal(size=n)
    df.to_csv(path, index=False)


def test_forecast_custom_splits(tmp_path):
    p = tmp_path / "series.csv"
    _write_csv(p, n=400)
    size = (48, 24, 24)
    tr = load_forecast_csv(str(p), "train", size)
    va = load_forecast_csv(str(p), "val", size)
    te = load_forecast_csv(str(p), "test", size)
    assert len(tr) > 0 and len(va) > 0 and len(te) > 0
    x, y, xm, ym = tr[0]
    assert x.shape == (48, 3) and y.shape == (48, 3)
    assert xm.shape == (48, 4)  # hourly -> 4 time features
    # standardized on train
    assert abs(tr.data.mean()) < 0.2


def test_forecast_univariate(tmp_path):
    p = tmp_path / "series.csv"
    _write_csv(p)
    tr = load_forecast_csv(str(p), "train", (24, 12, 12), features="S")
    x, y, _, _ = tr[0]
    assert x.shape == (24, 1)


def test_forecast_inverse_transform(tmp_path):
    p = tmp_path / "series.csv"
    _write_csv(p)
    tr = load_forecast_csv(str(p), "train", (24, 12, 12))
    x, _, _, _ = tr[0]
    rt = (tr.inverse_transform(x) - tr.mean) / tr.std
    np.testing.assert_allclose(rt, x, rtol=1e-4, atol=1e-5)


def test_m4_dataset(tmp_path):
    p = tmp_path / "m4.csv"
    rng = np.random.default_rng(1)
    rows = {"V1": [f"S{i}" for i in range(5)]}
    for j in range(60):
        rows[f"c{j}"] = rng.normal(size=5)
    pd.DataFrame(rows).to_csv(p, index=False)
    ds = load_m4_csv(str(p), seq_len=30, pred_len=6)
    assert len(ds) == 5
    ins, outs = ds[0]
    assert ins.shape == (30,) and outs.shape == (6,)


def test_provider_registry_full_surface():
    """The registry carries the reference's full data_dict
    (data_factory/data_factory.py:10-26): 15 names."""
    from sie_tpu.data.provider import DATA_REGISTRY
    assert set(DATA_REGISTRY) == {
        "ETTh1", "ETTh2", "ETTm1", "ETTm2", "custom", "m4",
        "PSM", "MSL", "SMAP", "SMD", "SWAT", "UEA", "Monash", "EEG", "EEG3"}


def test_provider_routes_forecast(tmp_path):
    from sie_tpu.config import Config
    from sie_tpu.data.provider import data_provider
    _write_csv(tmp_path / "myseries.csv", n=400)
    cfg = Config(data="custom", data_root=str(tmp_path), dataset="myseries",
                 seq_len=48, label_len=24, pred_len=24, batch_size=4, seed=0)
    ds, batcher = data_provider(cfg, "train")
    x, y, xm, ym = next(iter(batcher))
    assert x.shape == (4, 48, 3) and y.shape == (4, 48, 3)
    assert len(batcher) == len(ds) // 4


def test_provider_routes_anomaly(tmp_path):
    from sie_tpu.config import Config
    from sie_tpu.data.provider import data_provider
    rng = np.random.default_rng(3)
    np.save(tmp_path / "PSM_train.npy", rng.normal(size=(500, 8)))
    np.save(tmp_path / "PSM_test.npy", rng.normal(size=(300, 8)))
    np.save(tmp_path / "PSM_test_label.npy",
            rng.integers(0, 2, 300).astype(np.float32))
    cfg = Config(data="PSM", data_root=str(tmp_path), seq_len=100,
                 batch_size=2, seed=0)
    ds, batcher = data_provider(cfg, "test")
    w, lab = next(iter(batcher))
    assert w.shape == (2, 100, 8) and lab.shape == (2, 100)


def test_provider_routes_m4(tmp_path):
    from sie_tpu.config import Config
    from sie_tpu.data.provider import data_provider
    rng = np.random.default_rng(4)
    rows = {"V1": [f"S{i}" for i in range(6)]}
    for j in range(60):
        rows[f"c{j}"] = rng.normal(size=6)
    pd.DataFrame(rows).to_csv(tmp_path / "Monthly.csv", index=False)
    cfg = Config(data="m4", data_root=str(tmp_path),
                 seasonal_patterns="Monthly",
                 seq_len=30, pred_len=6, batch_size=3, seed=0)
    ds, batcher = data_provider(cfg, "train")
    ins, outs = next(iter(batcher))
    # the subset's M4 horizon (Monthly=18) overrides pred_len, like the
    # reference's M4Meta lookup
    assert ins.shape == (3, 30) and outs.shape == (3, 18)


def test_anomaly_segments(tmp_path):
    rng = np.random.default_rng(2)
    np.save(tmp_path / "SMD_train.npy", rng.normal(size=(500, 8)))
    np.save(tmp_path / "SMD_test.npy", rng.normal(size=(300, 8)))
    np.save(tmp_path / "SMD_test_label.npy",
            rng.integers(0, 2, 300).astype(np.float32))
    tr = load_segments(str(tmp_path), "SMD", "train", win_size=100, step=50)
    te = load_segments(str(tmp_path), "SMD", "test", win_size=100)
    assert len(tr) == (500 - 100) // 50 + 1
    w, lab = te[0]
    assert w.shape == (100, 8) and lab.shape == (100,)
    assert abs(tr.values.mean()) < 0.1  # standardized on train


def _write_m4_group_csvs(tmp_path, group, n_series, train_len, horizon, seed):
    rng = np.random.default_rng(seed)
    rows_tr = {"V1": [f"{group[0]}{i + 1}" for i in range(n_series)]}
    rows_te = {"V1": rows_tr["V1"]}
    for j in range(train_len):
        rows_tr[f"c{j}"] = rng.uniform(10, 100, n_series)
    for j in range(horizon):
        rows_te[f"c{j}"] = rng.uniform(10, 100, n_series)
    tr = tmp_path / f"{group}-train.csv"
    te = tmp_path / f"{group}-test.csv"
    pd.DataFrame(rows_tr).to_csv(tr, index=False)
    pd.DataFrame(rows_te).to_csv(te, index=False)
    return str(tr), str(te)


def test_m4_cache_roundtrip_and_meta(tmp_path):
    from sie_tpu.data.m4 import M4Dataset, M4Meta, build_m4_cache
    csvs = {"Yearly": _write_m4_group_csvs(tmp_path, "Yearly", 4, 20, 6, 0),
            "Hourly": _write_m4_group_csvs(tmp_path, "Hourly", 3, 60, 48, 1)}
    cache = tmp_path / "m4cache"
    build_m4_cache(csvs, str(cache))
    tr = M4Dataset.load(training=True, dataset_file=str(cache))
    te = M4Dataset.load(training=False, dataset_file=str(cache))
    assert len(tr.ids) == 7 and (tr.groups == "Yearly").sum() == 4
    assert tr.horizons[0] == M4Meta.horizons_map["Yearly"] == 6
    assert len(tr.values[0]) == 20 and len(te.values[0]) == 6
    assert tr.frequencies[-1] == M4Meta.frequency_map["Hourly"] == 24


def test_m4_summary_owa_one_for_naive2(tmp_path):
    """If the model forecast IS the Naive2 submission, OWA == 1 everywhere."""
    from sie_tpu.data.m4 import build_m4_cache
    from sie_tpu.utils.m4_summary import M4Summary
    csvs = {g: _write_m4_group_csvs(tmp_path, g, 3, 30, h, i)
            for i, (g, h) in enumerate(
                [("Yearly", 6), ("Quarterly", 8), ("Monthly", 18),
                 ("Weekly", 13), ("Daily", 14), ("Hourly", 48)])}
    cache = tmp_path / "m4cache"
    build_m4_cache(csvs, str(cache))

    # naive2 submission: last train value repeated over the horizon
    from sie_tpu.data.m4 import M4Dataset, M4Meta
    tr = M4Dataset.load(True, str(cache))
    naive_rows, max_h = [], max(M4Meta.horizons)
    fdir = tmp_path / "forecasts"
    fdir.mkdir()
    per_group = {}
    for i, sid in enumerate(tr.ids):
        h = int(tr.horizons[i])
        fc = np.full(h, tr.values[i][-1])
        row = np.full(max_h, np.nan)
        row[:h] = fc
        naive_rows.append([sid] + row.tolist())
        per_group.setdefault(tr.groups[i], []).append(fc)
    pd.DataFrame(naive_rows).to_csv(cache / "submission-Naive2.csv",
                                    index=False)
    for g, rows in per_group.items():
        pd.DataFrame(np.stack(rows)).to_csv(fdir / f"{g}_forecast.csv",
                                            index=False)

    smape, owa, mape_, mase_ = M4Summary(str(fdir) + "/", str(cache)).evaluate()
    for k, v in owa.items():
        assert abs(v - 1.0) < 1e-9, (k, v)
    assert set(smape) == {"Yearly", "Quarterly", "Monthly", "Others", "Average"}
    assert all(np.isfinite(list(mase_.values())))


def test_m4_flag_routing(tmp_path):
    """The m4 provider entry must route train vs test: train pairs come from a
    holdout within the training series, test pairs from the held-out horizons
    — never the same windows for both (train==test leakage)."""
    import pandas as pd
    from sie_tpu.data.forecast import load_m4
    rng = np.random.default_rng(3)
    n, h = 4, 6
    tr_rows = {"V1": [f"M{i}" for i in range(n)]}
    te_rows = {"V1": [f"M{i}" for i in range(n)]}
    for j in range(50):
        tr_rows[f"c{j}"] = rng.normal(size=n)
    for j in range(h):
        te_rows[f"c{j}"] = rng.normal(size=n)
    pd.DataFrame(tr_rows).to_csv(tmp_path / "Monthly-train.csv", index=False)
    pd.DataFrame(te_rows).to_csv(tmp_path / "Monthly-test.csv", index=False)

    tr = load_m4(str(tmp_path), "Monthly", 30, h, "train")
    te = load_m4(str(tmp_path), "Monthly", 30, h, "test")
    ins_tr, out_tr = tr[0]
    ins_te, out_te = te[0]
    # test outsample is the held-out horizon, train outsample is within train
    assert not np.allclose(out_tr, out_te)
    # test insample sees the full training series (train holds the tail out)
    assert not np.allclose(ins_tr, ins_te)


def test_m4_test_refuses_single_csv(tmp_path):
    import pandas as pd
    import pytest as _pytest
    from sie_tpu.data.forecast import load_m4
    rows = {"V1": ["M0"], **{f"c{j}": [float(j)] for j in range(20)}}
    pd.DataFrame(rows).to_csv(tmp_path / "Monthly.csv", index=False)
    assert len(load_m4(str(tmp_path), "Monthly", 10, 4, "train")) == 1
    with _pytest.raises(FileNotFoundError):
        load_m4(str(tmp_path), "Monthly", 10, 4, "test")


def test_load_m4_routes_npz_cache(tmp_path):
    """load_m4 prefers the npz cache layout, filtered by seasonal pattern,
    with test outsample = the held-out test horizons."""
    from sie_tpu.data.m4 import build_m4_cache
    from sie_tpu.data.forecast import load_m4
    csvs = {"Yearly": _write_m4_group_csvs(tmp_path, "Yearly", 4, 20, 6, 0),
            "Hourly": _write_m4_group_csvs(tmp_path, "Hourly", 3, 60, 48, 1)}
    cache = tmp_path / "m4cache"
    build_m4_cache(csvs, str(cache))
    tr = load_m4(str(cache), "Yearly", 12, 6, "train")
    te = load_m4(str(cache), "Yearly", 12, 6, "test")
    assert len(tr) == 4 and len(te) == 4
    ins_te, out_te = te[0]
    # test outsample equals the test csv horizon for that series
    expected = pd.read_csv(csvs["Yearly"][1]).iloc[0, 1:7].to_numpy(np.float32)
    np.testing.assert_allclose(out_te, expected, rtol=1e-6)
    _, out_tr = tr[0]
    assert not np.allclose(out_tr, out_te)
