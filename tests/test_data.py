"""Data layer tests: .ts parsing, dense conversion, batching, preprocessing."""

import numpy as np
import pytest

from sie_tpu.data.loader import ArrayDataset, Batcher, standardize
from sie_tpu.data.synthetic import write_synthetic_monash, write_synthetic_uea
from sie_tpu.data.ts_parser import parse_ts_file, to_dense
from sie_tpu.data.uea import load_uea_dataset
from sie_tpu.data.monash import load_monash_dataset


def test_ts_parser_roundtrip(tmp_path):
    write_synthetic_uea(str(tmp_path), "Toy", n_train=8, n_test=4, n_dims=3,
                        length=20, n_classes=2)
    ts = parse_ts_file(str(tmp_path / "Toy" / "Toy_TRAIN.ts"))
    assert ts.n_samples == 8
    assert ts.n_dims == 3
    assert ts.class_labels == ["c0", "c1"]
    x, lengths, max_len = to_dense(ts)
    assert x.shape == (8, 20, 3)
    assert (lengths == 20).all()


def test_ts_parser_missing_values(tmp_path):
    p = tmp_path / "m.ts"
    p.write_text("@problemName m\n@classLabel true a b\n@data\n"
                 "1.0,?,3.0:4.0,5.0,6.0:a\n"
                 "7.0,8.0,9.0:10.0,?,12.0:b\n")
    ts = parse_ts_file(str(p))
    x, lengths, _ = to_dense(ts)
    # NaNs interpolated linearly
    np.testing.assert_allclose(x[0, :, 0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(x[1, :, 1], [10.0, 11.0, 12.0])


def test_uea_dataset_loading(tmp_path):
    write_synthetic_uea(str(tmp_path), "Toy", n_train=10, n_test=6, n_dims=2,
                        length=30, n_classes=3)
    train = load_uea_dataset(str(tmp_path), "Toy", "train")
    test = load_uea_dataset(str(tmp_path), "Toy", "test")
    val = load_uea_dataset(str(tmp_path), "Toy", "val")
    assert len(train) == 10 and len(test) == 6
    assert val.x.shape == test.x.shape  # val == test (intended semantics)
    assert train.num_class == 3
    assert train.enc_in == 2
    # standardized: near 0-mean/1-std per dim over the file
    flat = train.x.reshape(-1, 2)
    assert abs(flat.mean()) < 0.2


def test_monash_dataset(tmp_path):
    write_synthetic_monash(str(tmp_path), "ToyReg", n_train=10, n_test=5)
    train = load_monash_dataset(str(tmp_path), "ToyReg", "train")
    test = load_monash_dataset(str(tmp_path), "ToyReg", "test",
                               bin_edges=train.bin_edges)
    assert train.y.dtype == np.float32
    assert len(train.bin_edges) == 10
    assert train.bin_edges[-1] == np.inf
    np.testing.assert_array_equal(train.bin_edges, test.bin_edges)


def test_batcher_fixed_shapes():
    n, t, c, b = 10, 8, 2, 4
    ds = ArrayDataset(x=np.arange(n * t * c, dtype=np.float32).reshape(n, t, c),
                      y=np.arange(n, dtype=np.int32),
                      padding_mask=np.ones((n, t), np.float32))
    batcher = Batcher(ds, b, shuffle=True, seed=3)
    batches = list(batcher.epoch(0))
    assert len(batches) == 3
    seen = []
    total_w = 0
    for x, y, m, w in batches:
        assert x.shape == (b, t, c) and y.shape == (b,) and w.shape == (b,)
        seen.extend(y[w > 0].tolist())
        total_w += w.sum()
    assert sorted(seen) == list(range(n))  # every sample exactly once
    assert total_w == n
    # shuffling differs across epochs, stable within an epoch
    e0 = [y.tolist() for _, y, _, _ in batches]
    e1 = [y.tolist() for _, y, _, _ in batcher.epoch(1)]
    e1b = [y.tolist() for _, y, _, _ in batcher.epoch(1)]
    assert e1 == e1b
    assert e0 != e1  # epoch number must enter the shuffle RNG


def test_standardize_uses_real_timesteps():
    x = np.zeros((2, 4, 1), np.float32)
    x[0, :2, 0] = [1.0, 3.0]
    x[1, :4, 0] = [1.0, 3.0, 1.0, 3.0]
    lengths = np.array([2, 4])
    out, mean, std = standardize(x, lengths)
    assert abs(mean[0] - 2.0) < 1e-6
    assert out[0, 2:].sum() == 0  # padding stays zero


def test_eeg_synthetic_pipeline(tmp_path):
    from sie_tpu.config import Config
    from sie_tpu.data.eeg import load_eeg_dataset, THREE_CATEGORY_MAP

    cfg = Config(data="EEG3", data_root=str(tmp_path / "none"),
                 cache_dir=str(tmp_path / "cache"), max_files=5,
                 target_channels=16, target_timepoints=200, batch_size=8)
    train = load_eeg_dataset(cfg, "train", three_class=True, synthetic=True)
    val = load_eeg_dataset(cfg, "val", three_class=True, synthetic=True)
    test = load_eeg_dataset(cfg, "test", three_class=True, synthetic=True)
    target_t = int(200 * 256 / 500)
    assert train.x.shape[1:] == (target_t, 16)
    assert train.num_class == 3
    assert set(np.concatenate([train.y, val.y, test.y])) <= {0, 1, 2}
    # disjoint split covering everything: every trial appears in exactly one
    # split (row content is unique random data, so bytes-dedup detects both
    # duplication across splits and dropped trials)
    n = len(train) + len(val) + len(test)
    assert len(val) >= 1 and len(test) >= 1
    rows = {xs.tobytes() for split in (train, val, test) for xs in split.x}
    assert len(rows) == n
    # per-channel z-scored
    s = train.x[0].std(axis=0)
    assert np.all(np.abs(s - 1.0) < 0.2)
    assert set(THREE_CATEGORY_MAP.values()) == {0, 1, 2}
    assert len(THREE_CATEGORY_MAP) == 39


def test_eeg_loso_split(tmp_path):
    from sie_tpu.config import Config
    from sie_tpu.data.eeg import load_eeg_dataset

    cfg = Config(data="EEG3", data_root=str(tmp_path / "none"),
                 cache_dir=str(tmp_path / "cache2"), max_files=5,
                 target_channels=8, target_timepoints=100, batch_size=8)
    tr = load_eeg_dataset(cfg, "train", synthetic=True, loso_test_subject=0)
    te = load_eeg_dataset(cfg, "test", synthetic=True, loso_test_subject=0)
    assert (te.subject_ids == 0).all()
    assert (tr.subject_ids != 0).all()


def test_fourier_resample_matches_scipy(rng):
    import scipy.signal
    import jax.numpy as jnp
    from sie_tpu.data.preprocess import fourier_resample

    for n, m in [(100, 150), (101, 150), (100, 64), (101, 64), (100, 100)]:
        x = rng.normal(size=(3, n)).astype(np.float32)
        want = scipy.signal.resample(x.astype(np.float64), m, axis=-1)
        got = np.asarray(fourier_resample(jnp.asarray(x), m, axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_preprocess_trials_crop_and_scale():
    import jax.numpy as jnp
    from sie_tpu.data.preprocess import preprocess_trials

    raw = np.random.default_rng(0).normal(0, 1e-5, (4, 20, 300))
    out = np.asarray(preprocess_trials(jnp.asarray(raw), target_channels=16,
                                       target_timepoints=150, normalize=False))
    assert out.shape == (4, 16, 150)
    np.testing.assert_allclose(out, raw[:, :16, :150] * 1e6, rtol=1e-4)


def test_normalizer_modes_match_pandas():
    """All four Normalizer modes vs a pandas transcription of
    data_factory/uea.py:85-109."""
    import pandas as pd
    from sie_tpu.data.loader import normalize_array
    rng = np.random.default_rng(7)
    n, t, c = 4, 12, 3
    lengths = np.array([12, 9, 12, 6], np.int32)
    x = rng.normal(2.0, 3.0, (n, t, c)).astype(np.float32)
    for i in range(n):
        x[i, lengths[i]:] = 0.0

    # pandas long-format frame indexed by sample id (reference layout)
    frames = [pd.DataFrame(x[i, : lengths[i]], index=[i] * lengths[i])
              for i in range(n)]
    df = pd.concat(frames)
    eps = np.finfo(float).eps

    def ref(norm_type):
        if norm_type == "standardization":
            return (df - df.mean()) / (df.std() + eps)
        if norm_type == "minmax":
            return (df - df.min()) / (df.max() - df.min() + eps)
        g = df.groupby(by=df.index)
        if norm_type == "per_sample_std":
            return (df - g.transform("mean")) / g.transform("std")
        mn = g.transform("min")
        return (df - mn) / (g.transform("max") - mn + eps)

    for mode in ["standardization", "minmax", "per_sample_std",
                 "per_sample_minmax"]:
        out = normalize_array(x, lengths, mode)
        want = ref(mode).to_numpy(dtype=np.float32)
        got = np.concatenate([out[i, : lengths[i]] for i in range(n)])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=mode)
        # padding stays exactly 0
        for i in range(n):
            assert (out[i, lengths[i]:] == 0).all(), mode


def test_normalizer_unknown_mode_raises():
    from sie_tpu.data.loader import normalize_array
    with pytest.raises(NameError):
        normalize_array(np.zeros((1, 4, 2), np.float32), None, "nope")


def test_uea_normalizer_flag_changes_data(tmp_path):
    write_synthetic_uea(str(tmp_path), "Toy2", n_train=8, n_test=4, n_dims=2,
                        length=16, n_classes=2)
    a = load_uea_dataset(str(tmp_path), "Toy2", "train")
    b = load_uea_dataset(str(tmp_path), "Toy2", "train",
                         norm_type="per_sample_minmax")
    assert np.abs(a.x - b.x).max() > 0.1
    assert b.x.min() >= -1e-6 and b.x.max() <= 1.0 + 1e-6


def test_resolve_subjects(tmp_path):
    """--subject_ids > --subject_id fallback > auto-discovery capped at
    --max_subjects (reference run.py:31,285-295)."""
    from sie_tpu.config import Config
    from sie_tpu.data.eeg import resolve_subjects
    for i in range(9):
        (tmp_path / f"sub-{i + 1:02d}").mkdir()
    (tmp_path / "not-a-subject").mkdir()

    cfg = Config(data_root=str(tmp_path), subject_ids=("sub-04,sub-05", "sub-06"))
    assert resolve_subjects(cfg) == ["sub-04", "sub-05", "sub-06"]

    cfg = Config(data_root=str(tmp_path), subject_ids=(), subject_id="sub-02")
    assert resolve_subjects(cfg) == ["sub-02"]

    cfg = Config(data_root=str(tmp_path), subject_ids=(), subject_id="",
                 max_subjects=3)
    assert resolve_subjects(cfg) == ["sub-01", "sub-02", "sub-03"]

    cfg = Config(data_root=str(tmp_path), subject_ids=(), subject_id="",
                 max_subjects=0)  # 0 = no cap
    assert len(resolve_subjects(cfg)) == 9


def test_eeg_qa_runs_before_normalization():
    """The outlier QA must see microvolt data (reference order: validate, then
    per-sample z-score) — on z-scored data the 1e5 bounds can never fire."""
    from sie_tpu.config import Config
    from sie_tpu.data.eeg import process_trials
    rng = np.random.default_rng(0)
    cfg = Config(target_channels=4, target_timepoints=50,
                 original_fs=500, target_fs=500)
    raw = rng.normal(0, 1e-5, size=(3, 4, 50))      # plausible volts
    raw[1] += 10.0                                  # 1e7 microvolts: outlier
    maps = {"w0": 9, "w1": 13}
    x, y, subj = process_trials(raw, ["w0", "w1", "w0"],
                                np.zeros(3, np.int32), maps, True, cfg)
    assert len(x) == 2                              # outlier trial dropped
    assert np.isfinite(x).all()
    # survivors are z-scored per channel
    np.testing.assert_allclose(x.mean(axis=-1), 0.0, atol=1e-4)


def test_eeg_padded_channels_no_nan():
    """Zero-padded channels (C_raw < target) must yield zeros, not NaN, and
    must not drop the trial."""
    from sie_tpu.config import Config
    from sie_tpu.data.eeg import process_trials
    rng = np.random.default_rng(1)
    cfg = Config(target_channels=6, target_timepoints=40,
                 original_fs=500, target_fs=500)
    raw = rng.normal(0, 1e-5, size=(2, 3, 40))      # 3 raw channels -> pad to 6
    maps = {"w": 17}
    x, _, _ = process_trials(raw, ["w", "w"], np.zeros(2, np.int32),
                             maps, True, cfg)
    assert len(x) == 2 and np.isfinite(x).all()
    np.testing.assert_array_equal(x[:, 3:, :], 0.0)


def test_uea_declared_class_labels_pin_mapping(tmp_path):
    """A split missing one declared class must keep the declared mapping
    (per-file present-label mapping would silently permute test ids)."""
    from sie_tpu.data.uea import load_uea_dataset
    d = tmp_path / "Toy3"
    d.mkdir()
    head = ("@problemName Toy3\n@timeStamps false\n@univariate true\n"
            "@classLabel true a b c\n@data\n")
    (d / "Toy3_TRAIN.ts").write_text(
        head + "1,2,3:a\n4,5,6:b\n7,8,9:c\n")
    (d / "Toy3_TEST.ts").write_text(
        head + "1,1,1:a\n9,9,9:c\n")                  # class b absent
    tr = load_uea_dataset(str(tmp_path), "Toy3", "train")
    te = load_uea_dataset(str(tmp_path), "Toy3", "test")
    assert tr.class_names == te.class_names == ("a", "b", "c")
    assert list(te.y) == [0, 2]                       # c stays id 2, not 1


def test_ts_dense_ragged_dims_sized_by_all_dims(tmp_path):
    """A sample whose later dim is longer than dim 0 must not overflow the
    dense buffer, and its mask length is the max over dims."""
    from sie_tpu.data.ts_parser import parse_ts_file, to_dense
    p = tmp_path / "rag.ts"
    p.write_text("@problemName rag\n@classLabel true x y\n@data\n"
                 "1,2:3,4,5,6:x\n7,8,9:1,2:y\n")
    ts = parse_ts_file(str(p))
    x, lengths, max_len = to_dense(ts, apply_subsample_on_ragged_dims=False)
    assert x.shape == (2, 4, 2) and max_len == 4
    assert list(lengths) == [4, 3]
