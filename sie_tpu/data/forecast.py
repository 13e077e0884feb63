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
    is (insample window, outsample horizon) sampled from one series."""

    series: list                    # list of 1-D np arrays
    seq_len: int
    pred_len: int

    def __len__(self):
        return len(self.series)

    def __getitem__(self, i: int):
        s = self.series[i]
        insample = np.zeros((self.seq_len,), np.float32)
        cut = s[: max(len(s) - self.pred_len, 1)]
        take = min(len(cut), self.seq_len)
        insample[-take:] = cut[-take:]
        outsample = np.zeros((self.pred_len,), np.float32)
        tail = s[-self.pred_len:]
        outsample[: len(tail)] = tail
        return insample, outsample


def load_m4_csv(path: str, seq_len: int, pred_len: int) -> M4Dataset:
    """Reads an M4-format CSV (first column id, rest the series values)."""
    df = pd.read_csv(path)
    series = []
    for _i, row in df.iterrows():
        vals = row.iloc[1:].dropna().to_numpy(dtype=np.float32)
        if len(vals):
            series.append(vals)
    return M4Dataset(series, seq_len, pred_len)
