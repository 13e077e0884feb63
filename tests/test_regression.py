"""Regression experiment (CRPS) end-to-end on a synthetic Monash archive."""

import numpy as np
import jax.numpy as jnp
import pytest

from sie_tpu.config import Config
from sie_tpu.data.synthetic import write_synthetic_monash
from sie_tpu.train.regression import (RegressionExperiment, make_crps_head,
                                      subsample_batch)


@pytest.fixture(scope="module")
def monash_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("monash")
    write_synthetic_monash(str(root), "ToyReg", n_train=24, n_test=12,
                           n_dims=2, length=50, seed=3)
    return str(root)


def test_crps_head_matches_naive():
    edges = np.array([1.0, 2.0, 3.0])
    head = make_crps_head(edges)
    logits = jnp.asarray([[0.2, 1.0, -0.3], [1.5, 0.1, 0.1]])
    targets = jnp.asarray([1.5, 2.5])
    w = jnp.ones((2,))
    got = float(head(logits, targets, w))
    p = np.exp(np.asarray(logits))
    p = p / p.sum(1, keepdims=True)
    cdf = np.cumsum(p, axis=1)
    cdf_true = (edges[None] >= np.asarray(targets)[:, None]).astype(float)
    want = ((cdf - cdf_true) ** 2).sum(1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_subsample_batch():
    x = np.zeros((2, 2500, 3))
    out = subsample_batch(x)
    assert out.shape[1] <= 1000
    x2 = np.zeros((2, 500, 3))
    assert subsample_batch(x2).shape[1] == 500


@pytest.mark.slow
def test_regression_experiment_sbm(monash_root, tmp_path):
    cfg = Config(data="Monash", data_root=monash_root, dataset="ToyReg",
                 task_name="regression", model="SBM", num_shapelet=2,
                 batch_size=8, train_epochs=3, patience=5, log_interval=100,
                 amp=False, use_pallas=False, seed=0,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 result_dir=str(tmp_path / "res"))
    exp = RegressionExperiment(cfg, verbose=False)
    exp.train()
    loss, _, df = exp.test(save_csv=True)
    assert np.isfinite(loss)
    assert df["pred"].shape[1] == 10      # 10 bins
    assert df["w"] is not None
    assert len(df["shapelets"]) > 0


def test_regression_experiment_dnn(monash_root, tmp_path):
    cfg = Config(data="Monash", data_root=monash_root, dataset="ToyReg",
                 task_name="regression", model="DNN", dnn_type="FCN",
                 batch_size=8, train_epochs=2, patience=5, log_interval=100,
                 amp=False, use_pallas=False, seed=0,
                 checkpoint_dir=str(tmp_path / "ckpt2"),
                 result_dir=str(tmp_path / "res2"))
    exp = RegressionExperiment(cfg, verbose=False)
    exp.train()
    loss, _, df = exp.test(save_csv=False)
    assert np.isfinite(loss)


def test_subsample_strides_mask_not_truncates():
    """The padding mask must be strided with the same factor as x — truncation
    would mark tail padding of shorter samples as real timesteps."""
    from sie_tpu.train.regression import RegressionExperiment
    b, t, c = 2, 2000, 3
    x = np.ones((b, t, c), np.float32)
    mask = np.zeros((b, t), np.float32)
    mask[0, :1200] = 1.0          # sample 0: real length 1200
    mask[1, :] = 1.0
    y = np.zeros((b,), np.float32)
    w = np.ones((b,), np.float32)
    xs, _, ms, _ = RegressionExperiment._batch(None, (x, y, mask, w))
    assert xs.shape[1] == 1000 and ms.shape[1] == 1000
    assert ms[0].sum() == 600     # 1200 real steps / factor 2
    assert ms[1].sum() == 1000
