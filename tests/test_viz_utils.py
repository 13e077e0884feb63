"""Visualization + misc utility tests."""

import numpy as np
import pytest

from sie_tpu.utils.shapelet_util import (ClassificationResult,
                                         compute_shapelet_score, smooth_array,
                                         visualize_shapelets)
from sie_tpu.utils.tools import EarlyStopping, convert_to_hms, gini_coefficient
from sie_tpu.utils.metrics import MAE, MSE, RMSE, accuracy, class_distribution


def test_early_stopping_semantics():
    es = EarlyStopping(patience=2)
    assert es(-0.5) is True          # first call always improves
    assert es(-0.6) is True          # better accuracy
    assert es(-0.6) is True          # tie resets (reference: score < best fails)
    assert es(-0.5) is False         # strike 1
    assert not es.early_stop
    assert es(-0.4) is False         # strike 2 -> stop
    assert es.early_stop


def test_convert_to_hms():
    assert convert_to_hms(3661) == "01:01:01"
    assert convert_to_hms(59.9) == "00:00:59"


def test_gini_coefficient():
    # perfectly equal -> 0; fully concentrated -> close to 1
    w_eq = np.ones((2, 10))
    assert abs(gini_coefficient(w_eq)) < 1e-9
    w_conc = np.zeros((1, 100))
    w_conc[0, 0] = 1.0
    assert gini_coefficient(w_conc) > 0.95
    assert gini_coefficient(np.zeros((1, 0))) == 0.0


def test_compute_shapelet_score():
    d = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    w = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)  # (num_class, F)
    y_pred = np.array([0, 1])
    y_true = np.array([0, 1])
    score = compute_shapelet_score(d, w, y_pred, y_true)
    assert np.isfinite(score)
    # no correct predictions -> nan
    assert np.isnan(compute_shapelet_score(d, w, y_pred, 1 - y_true))


def test_smooth_array():
    x = np.zeros(11)
    x[5] = 5.0
    sm = smooth_array(x, 5)
    assert sm[5] == pytest.approx(1.0)
    assert smooth_array(x, 1) is x


def test_visualize_shapelets(tmp_path):
    rng = np.random.default_rng(0)
    result = ClassificationResult(
        accuracy=0.8, loss=0.5, num_samples=4,
        x=rng.normal(size=(4, 50, 2)).astype(np.float32),
        preds=rng.normal(size=(4, 3)).astype(np.float32),
        trues=np.array([0, 1, 2, 0]),
        w=np.abs(rng.normal(size=(3, 6))).astype(np.float32),
        shapelets=[(rng.normal(size=7).astype(np.float32), i % 2)
                   for i in range(6)],
    )
    out = visualize_shapelets(result, sample_idx=0, top_k=3,
                              save_path=str(tmp_path / "viz.png"))
    import os
    assert os.path.exists(out)


def test_metrics():
    p = np.array([1.0, 2.0])
    t = np.array([1.5, 2.5])
    assert MAE(p, t) == pytest.approx(0.5)
    assert MSE(p, t) == pytest.approx(0.25)
    assert RMSE(p, t) == pytest.approx(0.5)
    assert accuracy(np.array([1, 0]), np.array([1, 1])) == 0.5
    dist = class_distribution(np.array([0, 0, 1]), 3)
    assert dist[0]["count"] == 2 and dist[2]["count"] == 0
