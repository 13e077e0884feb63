"""End-to-end EEG3 classification: synthetic CHISCO trials -> preprocessing ->
EEGCNN / InterpGN experiments (the reference's primary workload, run.py:17)."""

import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.train.experiment import Experiment


def eeg_cfg(tmp_path, **kw):
    base = dict(data="EEG3", data_root=str(tmp_path / "none"),
                cache_dir=str(tmp_path / "cache"),
                checkpoint_dir=str(tmp_path / "ckpt"),
                result_dir=str(tmp_path / "res"),
                model="EEGCNN", batch_size=8, train_epochs=2, patience=3,
                max_files=5, target_channels=16, target_timepoints=250,
                eegcnn_kernel1=13, eegcnn_kernel2=5, eegcnn_layers=1,
                eegcnn_d_ff=16, eegcnn_n_heads=2,
                log_interval=100, amp=False, use_pallas=False, seed=0)
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_eegcnn_experiment(tmp_path):
    exp = Experiment(eeg_cfg(tmp_path), verbose=False)
    assert exp.cfg.num_class == 3
    assert exp.cfg.enc_in == 16
    exp.train()
    loss, metrics, df = exp.test(save_csv=True)
    assert np.isfinite(loss)
    assert metrics["random_baseline"] == pytest.approx(100.0 / 3)


@pytest.mark.slow
def test_interpgn_eeg_experiment_amp(tmp_path):
    """InterpGN on EEG3 with the bf16 compute policy (reference autocast)."""
    cfg = eeg_cfg(tmp_path, model="InterpGN", dnn_type="FCN",
                  num_shapelet=2, amp=True)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, res = exp.test(save_csv=False)
    assert np.isfinite(loss)
    assert res.eta is not None and np.isfinite(res.eta).all()
