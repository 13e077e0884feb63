"""Coverage for model/experiment variants beyond the primary paths."""

import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.train.experiment import Experiment


@pytest.fixture(scope="module")
def uea_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("uea_var")
    write_synthetic_uea(str(root), "Toy", n_train=16, n_test=8, n_dims=2,
                        length=24, n_classes=2, seed=11)
    return str(root)


def cfg_for(uea_root, tmp_path, **kw):
    base = dict(data="UEA", data_root=uea_root, dataset="Toy", model="SBM",
                num_shapelet=2, batch_size=8, train_epochs=2, patience=3,
                shapelet_lengths=(0.1, 0.3),
                log_interval=100, amp=False, use_pallas=False, seed=0,
                d_model=8, d_ff=16, n_heads=2, e_layers=1, top_k=2,
                num_kernels=2,
                checkpoint_dir=str(tmp_path / "ckpt"),
                result_dir=str(tmp_path / "res"))
    base.update(kw)
    return Config(**base)


def _train_and_test(cfg):
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, res = exp.test(save_csv=False)
    assert np.isfinite(loss)
    return exp, metrics, res


def test_lts_experiment(uea_root, tmp_path):
    _train_and_test(cfg_for(uea_root, tmp_path, model="LTS"))


@pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "pearson"])
def test_distance_metrics_train(uea_root, tmp_path, metric):
    _train_and_test(cfg_for(uea_root, tmp_path, distance_func=metric))


@pytest.mark.parametrize("cls", ["bilinear", "attention"])
def test_classifier_heads_train(uea_root, tmp_path, cls):
    _train_and_test(cfg_for(uea_root, tmp_path, sbm_cls=cls))


@pytest.mark.slow
def test_interpgn_timesnet_trains(uea_root, tmp_path):
    """Gradient flow through the shape-static TimesNet fold."""
    _train_and_test(cfg_for(uea_root, tmp_path, model="InterpGN",
                            dnn_type="TimesNet", train_epochs=1))


def test_interpgn_test_time_gating(uea_root, tmp_path):
    cfg = cfg_for(uea_root, tmp_path, model="InterpGN", dnn_type="FCN",
                  gating_value=-1.0)
    exp, metrics, res = _train_and_test(cfg)
    np.testing.assert_allclose(np.asarray(res.eta), 1.0)


@pytest.mark.slow
def test_eeg_39class(tmp_path):
    cfg = Config(data="EEG", data_root=str(tmp_path / "none"),
                 cache_dir=str(tmp_path / "cache"), model="SBM",
                 num_shapelet=2, batch_size=8, train_epochs=1, patience=2,
                 max_files=5, target_channels=8, target_timepoints=120,
                 log_interval=100, amp=False, use_pallas=False, seed=0,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 result_dir=str(tmp_path / "res"))
    exp = Experiment(cfg, verbose=False)
    assert exp.cfg.num_class == 39
    exp.train()
    loss, metrics, _ = exp.test(save_csv=False)
    assert metrics["random_baseline"] == pytest.approx(100.0 / 39)


def test_lr_decay_schedule(uea_root, tmp_path):
    _train_and_test(cfg_for(uea_root, tmp_path, lr_decay=True, train_epochs=3))
