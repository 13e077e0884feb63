"""Exercises the MNE-backed .fif ingestion path (`sie_tpu.data.eeg.read_fif_trials`,
parity with reference eeg_processor.py:1084-1160) with a fake `mne` module —
MNE is not in this image, so the stub covers: epoch/metadata extraction
('Word' column incl. NaN -> 'unknown'), EEG-channel picks on mixed-channel
files, the per-subject max_files cap, task_type filename filtering, and the
unknown-label drop downstream in process_trials."""

import sys
import types

import numpy as np
import pandas as pd
import pytest

from sie_tpu.config import Config
from sie_tpu.data.eeg import process_trials, read_fif_trials


class FakeEpochs:
    """Mimics the mne.Epochs surface read_fif_trials touches."""

    def __init__(self, path: str, n_epochs=4, n_channels=5, n_times=50,
                 words=None):
        # stable digest: str hash() is salted per process (PYTHONHASHSEED),
        # which would make the fake trial data irreproducible across runs
        import zlib
        self._seed = zlib.crc32(str(path).encode()) % (2 ** 31)
        self.n_epochs = n_epochs
        self.n_channels = n_channels
        self.n_times = n_times
        self.info = {"path": path}  # opaque; only passed to pick_types
        self.metadata = (None if words is None
                         else pd.DataFrame({"Word": words}))

    def __len__(self):
        return self.n_epochs

    def get_data(self):
        rng = np.random.default_rng(self._seed)
        return rng.normal(0, 1e-5, (self.n_epochs, self.n_channels,
                                    self.n_times))


def make_fake_mne(words_by_file, eeg_picks=(0, 2, 4)):
    fake = types.ModuleType("mne")
    calls = {"read": [], "picks": 0}

    def read_epochs(path, preload=True, verbose=None):
        assert preload  # reference reads with preload=True
        calls["read"].append(path)
        return FakeEpochs(path, words=words_by_file(path))

    def pick_types(info, eeg=False, **kw):
        assert eeg
        calls["picks"] += 1
        return np.asarray(eeg_picks)

    fake.read_epochs = read_epochs
    fake.pick_types = pick_types
    return fake, calls


@pytest.fixture
def fif_tree(tmp_path):
    """sub-01: 3 imagine files (+1 'read' task file that must be skipped);
    sub-02: 1 imagine file nested one level deeper."""
    s1 = tmp_path / "sub-01"
    s1.mkdir()
    for i in range(3):
        (s1 / f"sub-01_task-imagine_run{i}.fif").write_bytes(b"")
    (s1 / "sub-01_task-read_run0.fif").write_bytes(b"")
    s2 = tmp_path / "sub-02" / "ses-01"
    s2.mkdir(parents=True)
    (s2 / "sub-02_task-imagine_run0.fif.gz").write_bytes(b"")
    return tmp_path


def test_read_fif_trials_full_path(fif_tree, monkeypatch):
    words = ["apple", "mystery", float("nan"), "banana"]
    fake, calls = make_fake_mne(lambda path: words)
    monkeypatch.setitem(sys.modules, "mne", fake)

    raws, labels, subjects = read_fif_trials(
        str(fif_tree), ["sub-01", "sub-02"], max_files=2, task_type="imagine")

    # max_files caps per subject: 2 files from sub-01, 1 from sub-02
    assert len(calls["read"]) == 3
    assert all("imagine" in p for p in calls["read"])  # 'read' file skipped
    assert calls["picks"] == 3
    # 3 files x 4 epochs
    assert len(raws) == 12 and len(labels) == 12
    np.testing.assert_array_equal(subjects, [0] * 8 + [1] * 4)
    # picks select the 3 EEG channels out of 5
    assert all(r.shape == (3, 50) for r in raws)
    # metadata Word extraction with NaN -> 'unknown'
    assert labels[:4] == ["apple", "mystery", "unknown", "banana"]


def test_read_fif_trials_no_metadata(fif_tree, monkeypatch):
    fake, _ = make_fake_mne(lambda path: None)
    monkeypatch.setitem(sys.modules, "mne", fake)
    raws, labels, _ = read_fif_trials(str(fif_tree), ["sub-02"], max_files=5)
    assert labels == ["unknown"] * 4


def test_fif_to_processed_drops_unmapped(fif_tree, monkeypatch):
    """End-to-end: fake-mne reading -> process_trials; only textmap-mapped
    labels survive (reference eeg_processor.py:1203-1213)."""
    words = ["apple", "mystery", float("nan"), "banana"]
    fake, _ = make_fake_mne(lambda path: words)
    monkeypatch.setitem(sys.modules, "mne", fake)
    raws, labels, subjects = read_fif_trials(
        str(fif_tree), ["sub-01", "sub-02"], max_files=2)

    t_max = max(r.shape[1] for r in raws)
    raw = np.zeros((len(raws), raws[0].shape[0], t_max))
    for i, r in enumerate(raws):
        raw[i, :, : r.shape[1]] = r

    cfg = Config(target_channels=3, target_timepoints=50,
                 original_fs=500, target_fs=256)
    text_maps = {"apple": 13, "banana": 17}  # 39-class ids
    x, y, subj = process_trials(raw, labels, subjects, text_maps,
                                three_class=True, cfg=cfg)
    # 2 mapped labels per file x 3 files; 13 -> bucket 0, 17 -> bucket 1
    assert len(x) == 6
    np.testing.assert_array_equal(np.unique(y), [0, 1])
    assert x.shape[1] == 3 and x.shape[2] == int(50 * 256 / 500)
    assert x.dtype == np.float32
