"""Best-model checkpointing (reference utils/tools.py:34-38 +
run.py:580-602: best-only state_dict keyed on hyperparams, skip-train when a
checkpoint already exists). Serialized with flax msgpack — dependency-free and
adequate for these model sizes; swap in Orbax if sharded async checkpointing
is ever needed.

All writes are ATOMIC (tmp file + os.replace): a crash mid-save can never
corrupt the previous checkpoint, and readers never observe a torn file.
`save_checkpoint(..., background=True)` moves the device_get + serialize +
write onto ONE ordered writer thread (global FIFO — latest submission per
directory always lands last; no two writers ever share a .tmp file).
`wait_pending()` blocks until queued saves land and RE-RAISES any write
error that happened in the background, so failures are never silent; the
sync-save and load paths call it first, and an atexit hook drains the
queue (best-effort) on interpreter shutdown.
"""

from __future__ import annotations

import atexit
import os
import queue as _queue_mod
import threading
from typing import Any, List, Optional, Tuple

import jax
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"

_writer_lock = threading.Lock()
_writer: Optional[threading.Thread] = None
_queue: Optional[_queue_mod.Queue] = None
_errors: List[Tuple[str, BaseException]] = []


def checkpoint_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, CKPT_NAME)


def _atomic_write(path: str, data: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _writer_loop():
    while True:
        ckpt_dir, fn = _queue.get()
        try:
            fn()
        except BaseException as e:   # noqa: BLE001 — re-raised in wait_pending
            _errors.append((ckpt_dir, e))
        finally:
            _queue.task_done()


def _submit(ckpt_dir: str, fn):
    global _writer, _queue
    with _writer_lock:
        if _writer is None:
            _queue = _queue_mod.Queue()
            _writer = threading.Thread(target=_writer_loop, daemon=True)
            _writer.start()
            atexit.register(_drain_at_exit)
    _queue.put((ckpt_dir, fn))


def _drain_at_exit():
    """Best-effort shutdown: finish queued writes, and make any error that
    nobody waited on LOUD on stderr (never silently exit 0 with a failed
    checkpoint write)."""
    import sys
    _queue.join()
    for ckdir, err in _errors:
        print(f"[sie_tpu.checkpoint] background save for {ckdir!r} "
              f"FAILED and was never awaited: {err!r}", file=sys.stderr)


def wait_pending(ckpt_dir: Optional[str] = None):
    """Block until queued background saves have landed, then raise the
    first recorded write error FOR ckpt_dir (or for any dir when None).
    The queue drain is global (one writer thread), but an unrelated
    directory's failure must not crash this directory's save/load/exists
    checks — its error stays recorded until someone waits on that dir or
    on everything."""
    if _queue is not None:
        _queue.join()
    for idx, (ckdir, err) in enumerate(_errors):
        if ckpt_dir is None or ckdir == ckpt_dir:
            _errors.pop(idx)
            raise RuntimeError(
                f"background checkpoint save for {ckdir!r} failed") from err


def save_checkpoint(ckpt_dir: str, params: Any, batch_stats: Any = None,
                    meta: Any = None, background: bool = False):
    """With background=True pass HOST arrays (jax.device_get first) if the
    live train state may be donated/overwritten before the write lands —
    the Experiment call sites already save from their host-side `best`."""
    os.makedirs(ckpt_dir, exist_ok=True)

    def do_save():
        payload = {"params": jax.device_get(params)}
        if batch_stats is not None:
            payload["batch_stats"] = jax.device_get(batch_stats)
        _atomic_write(checkpoint_path(ckpt_dir),
                      serialization.to_bytes(payload))
        if meta is not None:
            import json
            _atomic_write(os.path.join(ckpt_dir, "meta.json"),
                          json.dumps(meta).encode())

    if not background:
        wait_pending(ckpt_dir)   # never let an older async save land later
        do_save()
        return
    _submit(ckpt_dir, do_save)


def load_meta(ckpt_dir: str) -> dict:
    import json
    path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def load_checkpoint(ckpt_dir: str, template: Any) -> Optional[Any]:
    wait_pending(ckpt_dir)
    path = checkpoint_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def has_checkpoint(ckpt_dir: str) -> bool:
    wait_pending(ckpt_dir)
    return os.path.exists(checkpoint_path(ckpt_dir))


# ---- full-state resume (beyond the reference's best-params-only scheme) ----

FULL_STATE_NAME = "train_state.msgpack"


def save_train_state(ckpt_dir: str, state, epoch: int, early_state: dict):
    """Snapshot params + batch_stats + optimizer state + loop position so an
    interrupted run resumes exactly (the reference can only restart from the
    best params with a fresh optimizer, utils/tools.py:34-38)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": epoch,
        "early": early_state,
    }
    _atomic_write(os.path.join(ckpt_dir, FULL_STATE_NAME),
                  serialization.to_bytes(payload))


def load_train_state(ckpt_dir: str, state):
    """Returns (state, epoch, early_state) or None."""
    path = os.path.join(ckpt_dir, FULL_STATE_NAME)
    if not os.path.exists(path):
        return None
    template = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": 0,
        "early": {"best_score": 0.0, "counter": 0, "has_best": False},
    }
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    state = state.replace(
        step=jax.device_put(payload["step"]),
        params=jax.device_put(payload["params"]),
        batch_stats=jax.device_put(payload["batch_stats"]),
        opt_state=jax.device_put(payload["opt_state"]))
    return state, int(payload["epoch"]), payload["early"]
