"""Disk-streaming input pipeline (sie_tpu/data/stream.py): memmap round
trip, lazy split views, device prefetcher, and an end-to-end streamed
training run that must reproduce the in-RAM run (beyond-reference — the
torch reference materializes every dataset in RAM, data_factory/uea.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sie_tpu.data.loader import ArrayDataset, Batcher
from sie_tpu.data.stream import (_IndexedField, lazy_select,
                                 open_memmap_dataset, prefetch_to_device,
                                 save_memmap_dataset)


def _toy_ds(n=20, t=12, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayDataset(
        x=rng.normal(size=(n, t, c)).astype(np.float32),
        y=rng.integers(0, 4, size=(n,)).astype(np.int32),
        padding_mask=np.ones((n, t), np.float32),
        num_class=4, class_names=("a", "b", "c", "d"),
        subject_ids=rng.integers(0, 3, size=(n,)).astype(np.int32),
        bin_edges=np.linspace(0, 1, 5, dtype=np.float32))


def test_memmap_round_trip(tmp_path):
    ds = _toy_ds()
    save_memmap_dataset(str(tmp_path / "mm"), ds, chunk_rows=7)
    got = open_memmap_dataset(str(tmp_path / "mm"))
    assert isinstance(got.x, np.memmap) and not got.x.flags.writeable
    np.testing.assert_array_equal(np.asarray(got.x), ds.x)
    np.testing.assert_array_equal(got.y, ds.y)
    np.testing.assert_array_equal(np.asarray(got.padding_mask),
                                  ds.padding_mask)
    np.testing.assert_array_equal(np.asarray(got.subject_ids),
                                  ds.subject_ids)
    np.testing.assert_array_equal(got.bin_edges, ds.bin_edges)
    assert got.num_class == 4 and got.class_names == ("a", "b", "c", "d")
    assert got.max_seq_len == ds.max_seq_len and got.enc_in == ds.enc_in


def test_batcher_over_memmap_matches_ram(tmp_path):
    ds = _toy_ds(n=19)   # non-divisible: exercises the padded final batch
    save_memmap_dataset(str(tmp_path / "mm"), ds)
    mm = open_memmap_dataset(str(tmp_path / "mm"))
    for a, b in zip(Batcher(ds, 8, shuffle=True, seed=3).epoch(0),
                    Batcher(mm, 8, shuffle=True, seed=3).epoch(0)):
        for u, v in zip(a, b):
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_lazy_select_is_lazy_and_composes(tmp_path):
    ds = _toy_ds(n=16)
    save_memmap_dataset(str(tmp_path / "mm"), ds)
    mm = open_memmap_dataset(str(tmp_path / "mm"))
    idx1 = np.asarray([3, 1, 4, 1, 5, 9, 2, 6])
    view = lazy_select(mm, idx1)
    assert isinstance(view.x, _IndexedField)   # rows NOT materialized
    assert view.x.shape == (8,) + ds.x.shape[1:]
    assert len(view) == 8
    np.testing.assert_array_equal(view.x[[0, 2]], ds.x[[3, 4]])
    np.testing.assert_array_equal(view.y, ds.y[idx1])
    # composition: selecting from a view gathers base[idx1[idx2]]
    idx2 = np.asarray([7, 0, 0, 5])
    v2 = lazy_select(view, idx2)
    assert isinstance(v2.x, _IndexedField)
    np.testing.assert_array_equal(np.asarray(v2.x), ds.x[idx1[idx2]])
    np.testing.assert_array_equal(v2.subject_ids, ds.subject_ids[idx1[idx2]])
    # a Batcher over the lazy view yields base rows in view order
    batch = next(iter(Batcher(v2, 4, shuffle=False).epoch(0)))
    np.testing.assert_array_equal(batch[0], ds.x[idx1[idx2]])


def test_prefetch_order_and_errors():
    batches = [(np.full((2, 2), i, np.float32), np.asarray([i])) for i in
               range(7)]
    got = list(prefetch_to_device(iter(batches), depth=3,
                                  device_put=lambda b: b))
    assert len(got) == 7
    for i, b in enumerate(got):
        np.testing.assert_array_equal(b[0], batches[i][0])

    def boom():
        yield batches[0]
        raise RuntimeError("disk gone")

    it = prefetch_to_device(boom(), depth=2, device_put=lambda b: b)
    next(it)
    with pytest.raises(RuntimeError, match="disk gone"):
        next(it)


@pytest.mark.slow
def test_streamed_training_reproduces_in_ram(tmp_path):
    """--stream_from_disk end-to-end: same data, same seed — the streamed
    (host-feed + prefetch) run must reproduce the in-RAM run's accuracy."""
    import run as run_cli
    from sie_tpu.data.synthetic import write_synthetic_uea
    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12, n_dims=2,
                        length=30, n_classes=2, seed=1)
    base = ["--data", "UEA", "--data_root", str(tmp_path), "--dataset", "Toy",
            "--model", "SBM", "--num_shapelet", "2", "--batch_size", "8",
            "--train_epochs", "2", "--patience", "3", "--seed", "0",
            "--no-amp", "--no_pallas",
            "--result_dir", str(tmp_path / "result"),
            "--cache_dir", str(tmp_path / "cache")]
    ram = run_cli.main(base + ["--checkpoint_dir", str(tmp_path / "ck_ram")])
    streamed = run_cli.main(base + ["--stream_from_disk",
                                    "--checkpoint_dir",
                                    str(tmp_path / "ck_mm")])
    # the stream cache dir exists and is what the second run read from
    stream_dirs = [d for d in os.listdir(tmp_path / "cache")
                   if d.startswith("stream_UEA_")]
    assert len(stream_dirs) == 3   # train/val/test
    a_ram = ram[0][2]["accuracy"]
    a_mm = streamed[0][2]["accuracy"]
    assert a_ram == pytest.approx(a_mm, abs=1e-6), (a_ram, a_mm)
    assert np.isfinite(ram[0][1]) and np.isfinite(streamed[0][1])
