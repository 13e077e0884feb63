"""Calendar time features (reference utils/timefeatures.py — gluonts-derived).

Used by the temporal-embedding branch of DataEmbedding when marks are supplied
(`embed='timeF'`); the classification/regression workloads never pass marks, so
this exists for capability parity with the forecasting toolkit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def second_of_minute(idx):  # [-0.5, 0.5]
    return idx.second / 59.0 - 0.5


def minute_of_hour(idx):
    return idx.minute / 59.0 - 0.5


def hour_of_day(idx):
    return idx.hour / 23.0 - 0.5


def day_of_week(idx):
    return idx.dayofweek / 6.0 - 0.5


def day_of_month(idx):
    return (idx.day - 1) / 30.0 - 0.5


def day_of_year(idx):
    return (idx.dayofyear - 1) / 365.0 - 0.5


def month_of_year(idx):
    return (idx.month - 1) / 11.0 - 0.5


def week_of_year(idx):
    week = pd.Index(idx.isocalendar().week, dtype="int64")
    return (week - 1) / 52.0 - 0.5


_FREQ_FEATURES = {
    "a": [], "m": [month_of_year], "w": [day_of_month, week_of_year],
    "d": [day_of_week, day_of_month, day_of_year],
    "b": [day_of_week, day_of_month, day_of_year],
    "h": [hour_of_day, day_of_week, day_of_month, day_of_year],
    "t": [minute_of_hour, hour_of_day, day_of_week, day_of_month, day_of_year],
    "s": [second_of_minute, minute_of_hour, hour_of_day, day_of_week,
          day_of_month, day_of_year],
}


def time_features(dates: pd.DatetimeIndex, freq: str = "h") -> np.ndarray:
    """-> (num_features, len(dates)) float32."""
    feats = _FREQ_FEATURES[freq.lower()[-1]]
    return np.vstack([np.asarray(f(dates), np.float32) for f in feats]) \
        if feats else np.zeros((0, len(dates)), np.float32)
