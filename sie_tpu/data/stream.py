"""Disk-streaming dataset + device prefetcher for archives larger than
host RAM.

Reference parity: none to match — the torch reference materializes every
dataset in RAM (`data_factory/uea.py:7-42`, `data_factory/eeg_processor.py:
960-1284`) and cannot train past host memory. This module is the
TPU-production input pipeline for that regime (NEXT_STEPS r3 item 6):

- `save_memmap_dataset` / `open_memmap_dataset`: each field is a raw .npy
  (written incrementally via np.lib.format.open_memmap) plus a meta.json.
  Opening returns an ArrayDataset whose x / y / padding_mask are READ-ONLY
  np.memmap views: the existing `Batcher`'s fancy indexing then pulls only
  the rows of the current batch off disk, so host RSS stays O(batch_size),
  not O(dataset). No new batcher, no new trainer path.
- `lazy_select` keeps split/LOSO views lazy: instead of materializing the
  selected rows (what ArrayDataset.select does — fine for RAM arrays, fatal
  for a 100x-RAM archive), it composes the index map so `x[idx]` resolves
  to `x_base[base_map[idx]]` at batch-gather time.
- `prefetch_to_device` double-buffers the host->device feed: a background
  thread stays `depth` batches ahead, overlapping the disk gather + the
  ~2 ms/buffer relay upload (CLAUDE.md) with the device step. With the
  device-resident path this is pointless (data is already in HBM); it wires
  into the host-feed path only.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from sie_tpu.data.loader import ArrayDataset

META_NAME = "meta.json"
_META = META_NAME
_FIELDS = ("x", "y", "padding_mask", "subject_ids")


def save_memmap_dataset(path: str, ds: ArrayDataset,
                        chunk_rows: int = 1024) -> str:
    """Write `ds` as a directory of raw .npy files + meta.json. Fields are
    copied in `chunk_rows` slices so a memmap- (or generator-) backed source
    never fully materializes. Publication is ATOMIC: everything lands in a
    `<path>.tmp.<pid>` staging dir that is os.rename'd into place, so a
    concurrent run with the same cache key either sees no dir (and builds
    its own staging copy) or a complete one — never a half-written x.npy.
    Returns `path`."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = f"{path}.tmp.{os.getpid()}"
    os.makedirs(staging, exist_ok=True)
    for name in _FIELDS:
        arr = getattr(ds, name)
        if arr is None:
            continue
        out = np.lib.format.open_memmap(
            os.path.join(staging, f"{name}.npy"), mode="w+",
            dtype=arr.dtype, shape=arr.shape)
        for i in range(0, arr.shape[0], chunk_rows):
            out[i:i + chunk_rows] = arr[i:i + chunk_rows]
        out.flush()
        del out
    meta = {
        "max_seq_len": int(ds.max_seq_len), "enc_in": int(ds.enc_in),
        "num_class": int(ds.num_class), "class_names": list(ds.class_names),
        "original_fs": int(ds.original_fs), "target_fs": int(ds.target_fs),
        "bin_edges": (None if ds.bin_edges is None
                      else np.asarray(ds.bin_edges).tolist()),
    }
    with open(os.path.join(staging, _META), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(staging, path)
    except OSError:
        # a concurrent writer with the same key won the rename — theirs is
        # complete (rename is the last step); drop our staging copy
        import shutil
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(os.path.join(path, _META)):
            raise
    return path


def open_memmap_dataset(path: str) -> ArrayDataset:
    """Open a directory written by save_memmap_dataset as an ArrayDataset of
    read-only memmaps. y is COPIED resident (np.array, not a view — O(N)
    scalars: label filtering, class counting and stratified splits scan it
    repeatedly and may remap in place)."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    arrays = {}
    for name in _FIELDS:
        p = os.path.join(path, f"{name}.npy")
        if os.path.exists(p):
            arrays[name] = np.load(p, mmap_mode="r")
    return ArrayDataset(
        x=arrays["x"],
        y=np.array(arrays["y"]),
        padding_mask=arrays["padding_mask"],
        subject_ids=arrays.get("subject_ids"),
        bin_edges=(None if meta.get("bin_edges") is None
                   else np.asarray(meta["bin_edges"], np.float32)),
        max_seq_len=meta["max_seq_len"], enc_in=meta["enc_in"],
        num_class=meta["num_class"],
        class_names=tuple(meta["class_names"]),
        original_fs=meta["original_fs"], target_fs=meta["target_fs"])


class _IndexedField:
    """Lazy `base[index_map]` view with ndarray-enough surface for the
    Batcher (`field[idx]`) and the Experiment's sizing probes
    (shape / size / nbytes / dtype). Gathers resolve per batch:
    `view[idx] == base[index_map[idx]]` touches only those rows."""

    def __init__(self, base, index_map: np.ndarray):
        self._base = base
        self._map = np.asarray(index_map)
        self.dtype = base.dtype
        self.shape = (len(self._map),) + tuple(base.shape[1:])
        self.size = int(np.prod(self.shape, dtype=np.int64))
        self.nbytes = self.size * base.dtype.itemsize
        self.ndim = len(self.shape)

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, idx):
        return np.asarray(self._base[self._map[idx]])

    def __array__(self, dtype=None):   # np.asarray(view) materializes
        out = np.asarray(self._base[self._map])
        return out if dtype is None else out.astype(dtype)


def lazy_select(ds: ArrayDataset, idx: np.ndarray) -> ArrayDataset:
    """ArrayDataset.select without materializing the rows: x/padding_mask
    become index-composed lazy views (y stays eager — it already is).
    Composes: lazy_select(lazy_select(ds, a), b) gathers base[a[b]]."""
    idx = np.asarray(idx)
    wrap = lambda f: (_IndexedField(f._base, f._map[idx])
                      if isinstance(f, _IndexedField)
                      else _IndexedField(f, idx))
    return dataclasses.replace(
        ds, x=wrap(ds.x), y=np.asarray(ds.y)[idx],
        padding_mask=wrap(ds.padding_mask),
        subject_ids=(None if ds.subject_ids is None
                     else np.asarray(ds.subject_ids)[idx]))


def prefetch_to_device(batches: Iterable[Tuple[np.ndarray, ...]],
                       depth: int = 2,
                       device_put=None) -> Iterator:
    """Iterate `batches` with a background thread staying `depth` ahead,
    pushing each batch to the device as soon as it is gathered. Exceptions
    in the producer re-raise at the consumer's next pull; the producer
    thread is a daemon, so an abandoned iterator cannot hang interpreter
    exit (it parks on the bounded queue and dies with the process)."""
    if device_put is None:
        import jax
        device_put = jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END, _ERR = object(), object()

    def produce():
        try:
            for b in batches:
                q.put(device_put(b))
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            q.put((_ERR, e))

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
