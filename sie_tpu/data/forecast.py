"""Forecasting window datasets — capability parity with the reference's
TSlib-inherited loaders (`data_factory/data_loader.py:18-597`: Dataset_ETT_hour,
Dataset_ETT_minute, Dataset_Custom, Dataset_M4). These are unreachable from the
reference CLI (task_name is restricted to classification/regression,
run.py:103) but part of its data layer; rebuilt compactly as dense numpy
window datasets with the same split conventions.

Split boundaries:
- ETT hour:   train 12 months, val 4, test 4 (30*24-hour months)
- ETT minute: same months at 15-min resolution (4x)
- custom CSV: 70% / 10% / 20%
Windows: x = [t, t+seq_len), y = [t+seq_len-label_len, t+seq_len+pred_len).
Optional per-feature standardization fitted on train (like the reference's
StandardScaler usage) and calendar time-features from utils/timefeatures.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from sie_tpu.utils.timefeatures import time_features


@dataclass
class ForecastDataset:
    data: np.ndarray            # (T, C) scaled values
    stamp: np.ndarray           # (T, F) time features
    seq_len: int
    label_len: int
    pred_len: int
    mean: Optional[np.ndarray] = None
    std: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.data) - self.seq_len - self.pred_len + 1

    def __getitem__(self, i: int):
        s_end = i + self.seq_len
        r_begin = s_end - self.label_len
        r_end = s_end + self.pred_len
        return (self.data[i:s_end], self.data[r_begin:r_end],
                self.stamp[i:s_end], self.stamp[r_begin:r_end])

    def inverse_transform(self, x):
        if self.mean is None:
            return x
        return x * self.std + self.mean


def _window_split(n: int, flag: str, borders) -> Tuple[int, int]:
    (b1s, b1e), (b2s, b2e), (b3s, b3e) = borders
    return {"train": (b1s, b1e), "val": (b2s, b2e), "test": (b3s, b3e)}[flag]


def load_forecast_csv(path: str, flag: str = "train", size=(96, 48, 96),
                      features: str = "M", target: str = "OT",
                      scale: bool = True, freq: str = "h",
                      dataset_kind: str = "custom") -> ForecastDataset:
    """dataset_kind: 'ETTh' | 'ETTm' | 'custom'."""
    seq_len, label_len, pred_len = size
    df = pd.read_csv(path)
    date_col = df.columns[0]
    dates = pd.to_datetime(df[date_col])
    values = df.drop(columns=[date_col])
    if features == "S":
        values = values[[target]]
    elif target in values.columns:
        # target column last, so the 'MS' consumers can slice [..., -1:]
        # (same convention as the reference's TSlib-lineage loaders)
        others = [c for c in values.columns if c != target]
        values = values[others + [target]]
    data = values.to_numpy(dtype=np.float32)
    n = len(data)

    if dataset_kind == "ETTh":
        month = 30 * 24
        borders = ((0, 12 * month), (12 * month - seq_len, 16 * month),
                   (16 * month - seq_len, 20 * month))
    elif dataset_kind == "ETTm":
        month = 30 * 24 * 4
        borders = ((0, 12 * month), (12 * month - seq_len, 16 * month),
                   (16 * month - seq_len, 20 * month))
    else:
        n_train = int(n * 0.7)
        n_test = int(n * 0.2)
        n_val = n - n_train - n_test
        borders = ((0, n_train), (n_train - seq_len, n_train + n_val),
                   (n - n_test - seq_len, n))
    borders = tuple((max(0, a), min(n, b)) for a, b in borders)

    mean = std = None
    if scale:
        tr0, tr1 = borders[0]
        mean = data[tr0:tr1].mean(axis=0)
        std = data[tr0:tr1].std(axis=0) + 1e-8
        data = (data - mean) / std

    stamp = time_features(pd.DatetimeIndex(dates), freq).T.astype(np.float32)
    lo, hi = _window_split(n, flag.lower(), borders)
    return ForecastDataset(data[lo:hi], stamp[lo:hi], seq_len, label_len,
                           pred_len, mean, std)


@dataclass
class M4Dataset:
    """Minimal M4 per-series dataset (reference data_factory/m4.py): each item
    is (insample window padded/cropped to seq_len, outsample horizon)."""

    insample: list                  # per-series history (1-D np arrays)
    outsample: list                 # per-series target horizon (1-D np arrays)
    seq_len: int
    pred_len: int

    def __len__(self):
        return len(self.insample)

    def __getitem__(self, i: int):
        src = self.insample[i]
        insample = np.zeros((self.seq_len,), np.float32)
        take = min(len(src), self.seq_len)
        insample[-take:] = src[-take:]
        outsample = np.zeros((self.pred_len,), np.float32)
        tail = self.outsample[i][: self.pred_len]
        outsample[: len(tail)] = tail
        return insample, outsample


def read_m4_rows(path: str, dtype=np.float32) -> list:
    """M4-format CSV rows (first column id, rest the ragged values) as
    (id, values) pairs — the one row parser shared by the window loaders here
    and the cache builder (sie_tpu/data/m4.py:build_m4_cache)."""
    df = pd.read_csv(path)
    out = []
    for _i, row in df.iterrows():
        vals = row.iloc[1:].dropna().to_numpy(dtype=dtype)
        if len(vals):
            out.append((str(row.iloc[0]), vals))
    return out


def _holdout_split(series: list, seq_len: int, pred_len: int) -> M4Dataset:
    """Train/val pairs entirely within the training series: the final horizon
    of each series is the target, everything before it the history."""
    ins = [s[: max(len(s) - pred_len, 1)] for s in series]
    outs = [s[max(len(s) - pred_len, 1):] for s in series]
    return M4Dataset(ins, outs, seq_len, pred_len)


def load_m4_csv(path: str, seq_len: int, pred_len: int) -> M4Dataset:
    """Single-CSV convenience loader: holdout-split training pairs."""
    series = [v for _id, v in read_m4_rows(path)]
    return M4Dataset([s[: max(len(s) - pred_len, 1)] for s in series],
                     [s[max(len(s) - pred_len, 1):] for s in series],
                     seq_len, pred_len)


def load_m4(root: str, name: str, seq_len: int, pred_len: int,
            flag: str) -> M4Dataset:
    """Flag-routed M4 loader (reference Dataset_M4 semantics: flag picks the
    training vs test cache, data_factory/data_loader.py Dataset_M4 +
    m4.py M4Dataset.load). Sources, in order:

    1. npz cache layout (`M4-info.csv` + training.npz/test.npz, built by
       sie_tpu.data.m4.build_m4_cache) filtered to the seasonal pattern;
    2. `{name}-train.csv` / `{name}-test.csv` pairs (the public M4 layout);
    3. single `{name}.csv` — train/val only (holdout split); test REFUSES
       so a missing test set can never silently score training targets.

    Test pairs: insample = tail of the full training series, outsample = the
    held-out test horizon."""
    import os
    from sie_tpu.data.m4 import M4Dataset as M4Cache

    want_test = flag == "test"
    if (os.path.exists(os.path.join(root, "M4-info.csv"))
            and os.path.exists(os.path.join(root, "training.npz"))):
        tr = M4Cache.load(training=True, dataset_file=root)
        keep = np.asarray(tr.groups) == name
        train_series = [np.asarray(v, np.float32) for v in tr.values[keep]]
        if want_test:
            te = M4Cache.load(training=False, dataset_file=root)
            test_series = [np.asarray(v, np.float32) for v in te.values[keep]]
            return M4Dataset(train_series, test_series, seq_len, pred_len)
        return _holdout_split(train_series, seq_len, pred_len)

    pair = os.path.join(root, f"{name}-train.csv")
    if os.path.exists(pair):
        train_series = [v for _id, v in read_m4_rows(pair)]
        if want_test:
            tpath = os.path.join(root, f"{name}-test.csv")
            if not os.path.exists(tpath):
                raise FileNotFoundError(
                    f"{tpath} not found — the M4 test split needs the "
                    "held-out horizons (or the npz cache)")
            test_series = [v for _id, v in read_m4_rows(tpath)]
            return M4Dataset(train_series, test_series, seq_len, pred_len)
        return _holdout_split(train_series, seq_len, pred_len)

    single = os.path.join(root, f"{name}.csv")
    if want_test:
        raise FileNotFoundError(
            f"no M4 test source under {root!r} (need {name}-test.csv or the "
            "npz cache); refusing to evaluate on training targets")
    return load_m4_csv(single, seq_len, pred_len)
