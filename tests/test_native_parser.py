"""Native .ts scanner vs the pure-Python reference parser."""

import numpy as np
import pytest

from sie_tpu.data.native import native_available, parse_ts_file_fast
from sie_tpu.data.synthetic import write_synthetic_monash, write_synthetic_uea
from sie_tpu.data.ts_parser import _parse_ts_file_py

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no g++ / native lib")


@needs_native
def test_native_matches_python_uea(tmp_path):
    write_synthetic_uea(str(tmp_path), "Toy", n_train=12, n_test=4, n_dims=3,
                        length=25, n_classes=3, seed=5)
    path = str(tmp_path / "Toy" / "Toy_TRAIN.ts")
    a = _parse_ts_file_py(path)
    b = parse_ts_file_fast(path)
    assert a.n_samples == b.n_samples
    assert a.n_dims == b.n_dims
    assert a.labels == b.labels
    assert a.class_labels == b.class_labels
    for sa, sb in zip(a.series, b.series):
        for da, db in zip(sa, sb):
            np.testing.assert_allclose(da, db, rtol=1e-6)


@needs_native
def test_native_matches_python_monash(tmp_path):
    write_synthetic_monash(str(tmp_path), "ToyReg", n_train=8, n_test=4,
                           n_dims=2, length=30, seed=6)
    path = str(tmp_path / "ToyReg" / "ToyReg_TRAIN.ts")
    a = _parse_ts_file_py(path)
    b = parse_ts_file_fast(path)
    assert b.is_regression
    assert a.labels == b.labels
    for sa, sb in zip(a.series, b.series):
        for da, db in zip(sa, sb):
            np.testing.assert_allclose(da, db, rtol=1e-6)


@needs_native
def test_native_missing_values(tmp_path):
    p = tmp_path / "m.ts"
    p.write_text("@problemName m\n@classLabel true a b\n@data\n"
                 "1.0,?,3.0:4.0,5.0,6.0:a\n"
                 "7.0,8.0,9.0:10.0,?,12.0:b\n")
    b = parse_ts_file_fast(str(p))
    assert np.isnan(b.series[0][0][1])
    assert b.labels == ["a", "b"]
