"""Alt UEA loader (utils/uea_loader.py:14-97 parity) tests."""

import numpy as np
import pytest

from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.data.uea_alt import (LabelEncoderLite, Normalizer, UEADataset,
                                  _interp_to_length)


def _write_ragged_ts(path, rows, labels, classes):
    lines = ["@problemName rag", "@timeStamps false", "@univariate false",
             f"@classLabel true {' '.join(classes)}", "@data"]
    for chans, lab in zip(rows, labels):
        cell = ":".join(",".join(f"{v:.6f}" for v in ch) for ch in chans)
        lines.append(f"{cell}:{lab}")
    path.write_text("\n".join(lines) + "\n")


def test_interp_to_length_matches_np_interp():
    s = np.array([0.0, 1.0, 4.0, 9.0], np.float32)
    out = _interp_to_length(s, 7)
    ref = np.interp(np.linspace(0, 1, 7), np.linspace(0, 1, 4), s)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # already at length -> unchanged; length-1 -> constant fill
    np.testing.assert_array_equal(_interp_to_length(s, 4), s)
    np.testing.assert_array_equal(_interp_to_length(s[:1], 3),
                                  np.zeros(3, np.float32))


def test_normalizer_standard_axis_and_reuse():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, (4, 2, 50))
    n = Normalizer()
    out = n.normalize(x)
    # reference quirk: per-sample per-channel stats over time (axis=-1)
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-12)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-6)
    # stats are cached on first call and reused verbatim
    x2 = x + 10.0
    out2 = n.normalize(x2)
    np.testing.assert_allclose(out2, out + 10.0 / (n.std + np.finfo(float).eps))


def test_normalizer_minmax_and_unknown():
    x = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    out = Normalizer("minmax").normalize(x)
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-12)
    with pytest.raises(NameError):
        Normalizer("zscore").normalize(x)


def test_label_encoder_sorted_and_unseen():
    enc = LabelEncoderLite()
    y = enc.fit_transform(["dog", "ant", "cat", "ant"])
    assert list(enc.classes_) == ["ant", "cat", "dog"]
    np.testing.assert_array_equal(y, [2, 0, 1, 0])
    np.testing.assert_array_equal(enc.transform(["cat", "dog"]), [1, 2])
    with pytest.raises(ValueError):
        enc.transform(["bee"])


def test_uea_dataset_equal_length(tmp_path):
    write_synthetic_uea(str(tmp_path), "Toy", n_train=10, n_test=6, n_dims=3,
                        length=20, n_classes=3, seed=1)
    tr = UEADataset("Toy", root_dir=str(tmp_path), flag="TRAIN")
    te = UEADataset("Toy", root_dir=str(tmp_path), flag="TEST",
                    label_encoder=tr.label_encoder)
    assert tr.x.shape == (10, 3, 20) and te.x.shape == (6, 3, 20)
    assert tr.y.shape == (10,) and tr.num_class == 3
    assert not te.fit  # passed encoder -> transform-only
    np.testing.assert_allclose(tr.x.mean(-1), 0.0, atol=1e-5)
    xi, yi = tr[4]
    assert xi.shape == (3, 20) and yi.shape == (1,)  # y[[i]] quirk
    assert len(tr) == 10


def test_uea_dataset_ragged_interpolates_to_max(tmp_path):
    d = tmp_path / "Rag"
    d.mkdir()
    rows = [
        [np.linspace(0, 1, 5), np.linspace(1, 0, 5)],
        [np.linspace(0, 2, 9), np.linspace(2, 0, 9)],
        [np.linspace(0, 3, 7), np.linspace(3, 0, 7)],
    ]
    _write_ragged_ts(d / "Rag_TRAIN.ts", rows, ["a", "b", "a"], ["a", "b"])
    ds = UEADataset("Rag", root_dir=str(tmp_path), flag="TRAIN")
    # every series linearly stretched to the archive max length (9)
    assert ds.x.shape == (3, 2, 9)
    assert ds.num_class == 2
    # monotone ramps stay monotone after interpolation + standardization
    assert (np.diff(ds.x[0, 0]) > 0).all() and (np.diff(ds.x[0, 1]) < 0).all()
