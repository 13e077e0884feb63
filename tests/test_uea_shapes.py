"""Archive shape coverage (VERDICT r2 item 7): regime-representative UEA
shapes smoke-trained end to end on CPU. The full 30-shape on-chip sweep is
scripts/uea_shape_sweep.py (artifact: docs/UEA_SWEEP_r03.md)."""

import pytest

from sie_tpu.data.uea import UEA_30_DATASETS, UEA_DATASET_SHAPES


def test_shape_table_covers_all_30():
    assert set(UEA_30_DATASETS) == set(UEA_DATASET_SHAPES)
    for dims, length, classes in UEA_DATASET_SHAPES.values():
        assert dims >= 1 and length >= 8 and classes >= 2


@pytest.mark.slow
@pytest.mark.parametrize("name,use_pallas", [
    ("PenDigits", True),        # T=8: L=3 clamp + FCN small-kernel path
    ("JapaneseVowels", True),   # short ragged-style shape
    ("FaceDetection", True),    # C=144 -> 2-lane register budget (interpret)
    ("PEMS-SF", False),         # C=963 wide-channel scan path
])
def test_shape_smoke_train(name, use_pallas, tmp_path):
    import os
    from sie_tpu.config import Config
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.train.experiment import Experiment
    import numpy as np

    dims, length, classes = UEA_DATASET_SHAPES[name]
    write_synthetic_uea(str(tmp_path), name, n_train=8, n_test=8,
                        n_dims=dims, length=length, n_classes=classes, seed=7)
    if use_pallas:
        os.environ["SIE_TPU_PALLAS_INTERPRET"] = "1"
    try:
        cfg = Config(data="UEA", data_root=str(tmp_path), dataset=name,
                     model="InterpGN", dnn_type="FCN", num_shapelet=2,
                     batch_size=4, train_epochs=1, patience=2,
                     log_interval=100, amp=False, use_pallas=use_pallas,
                     seed=0, checkpoint_dir=str(tmp_path / "ckpt"),
                     result_dir=str(tmp_path / "res"),
                     cache_dir=str(tmp_path / "c"))
        exp = Experiment(cfg, verbose=False)
        assert (exp.cfg.seq_len, exp.cfg.enc_in, exp.cfg.num_class) == (
            length, dims, classes)
        exp.train()
        loss, metrics, _ = exp.test(save_csv=False)
        assert np.isfinite(loss)
    finally:
        os.environ.pop("SIE_TPU_PALLAS_INTERPRET", None)
