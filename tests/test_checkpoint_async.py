"""Atomic + background checkpoint writes (train/checkpoint.py): no torn
files, latest-wins ordering, loads synchronize with pending saves."""

import os
import threading

import numpy as np

from sie_tpu.train import checkpoint as ckpt


def _params(v):
    return {"dense": {"kernel": np.full((8, 8), float(v), np.float32)}}


def test_atomic_no_tmp_left_behind(tmp_path):
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, _params(1.0))
    files = os.listdir(d)
    assert ckpt.CKPT_NAME in files
    assert not any(f.endswith(".tmp") for f in files)


def test_background_save_lands_and_load_waits(tmp_path):
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, _params(3.0), background=True)
    # load_checkpoint must block on the pending write, then see v=3
    restored = ckpt.load_checkpoint(d, {"params": _params(0.0)})
    assert restored["params"]["dense"]["kernel"][0, 0] == 3.0
    assert not any(f.endswith(".tmp") for f in os.listdir(d))


def test_latest_wins_across_mixed_saves(tmp_path):
    d = str(tmp_path / "ck")
    for v, bg in ((1.0, True), (2.0, False), (3.0, True), (4.0, True)):
        ckpt.save_checkpoint(d, _params(v), background=bg,
                             meta={"v": v})
    ckpt.wait_pending(d)
    restored = ckpt.load_checkpoint(d, {"params": _params(0.0)})
    assert restored["params"]["dense"]["kernel"][0, 0] == 4.0
    assert ckpt.load_meta(d)["v"] == 4.0


def test_has_checkpoint_waits(tmp_path):
    d = str(tmp_path / "ck")
    assert not ckpt.has_checkpoint(d)
    ckpt.save_checkpoint(d, _params(1.0), background=True)
    assert ckpt.has_checkpoint(d)     # must not race the pending write


def test_concurrent_dirs_independent(tmp_path):
    dirs = [str(tmp_path / f"ck{i}") for i in range(4)]
    threads = [threading.Thread(
        target=ckpt.save_checkpoint, args=(d, _params(i)),
        kwargs={"background": True}) for i, d in enumerate(dirs)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    ckpt.wait_pending()
    for i, d in enumerate(dirs):
        restored = ckpt.load_checkpoint(d, {"params": _params(0.0)})
        assert restored["params"]["dense"]["kernel"][0, 0] == float(i)


def test_background_write_error_is_raised(tmp_path):
    """A failed background save must surface at wait_pending, not vanish."""
    blocker = tmp_path / "ck_err" / ckpt.CKPT_NAME
    blocker.parent.mkdir()
    blocker.mkdir()          # directory where the file must go -> IsADirectory
    ckpt.save_checkpoint(str(blocker.parent), _params(1.0), background=True)
    import pytest
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        ckpt.wait_pending()
    # the error queue is drained: later saves work again
    d = str(tmp_path / "ck_ok")
    ckpt.save_checkpoint(d, _params(2.0), background=True)
    restored = ckpt.load_checkpoint(d, {"params": _params(0.0)})
    assert restored["params"]["dense"]["kernel"][0, 0] == 2.0


def test_background_error_scoped_to_its_dir(tmp_path):
    """A failed save for dir A must not crash dir B's has_checkpoint; the
    error surfaces when waiting on A (or on everything)."""
    import pytest
    bad = tmp_path / "bad" / ckpt.CKPT_NAME
    bad.parent.mkdir()
    bad.mkdir()
    ckpt.save_checkpoint(str(bad.parent), _params(1.0), background=True)
    other = str(tmp_path / "other")
    ckpt.save_checkpoint(other, _params(5.0), background=True)
    assert ckpt.has_checkpoint(other)          # unaffected by bad's error
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        ckpt.wait_pending(str(bad.parent))
    ckpt.wait_pending()                         # drained: no re-raise
