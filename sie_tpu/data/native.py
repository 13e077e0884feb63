"""ctypes bindings for the native .ts scanner (sie_tpu/native/ts_scan.cpp).

Compiles the shared library on first use (g++ -O3) and caches it next to the
source; falls back cleanly when no compiler is available. `parse_ts_file_fast`
returns the same TsFile structure as the pure-Python parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "ts_scan.cpp")
_SO = os.path.join(_NATIVE_DIR, "libts_scan.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.ts_scan_count.restype = ctypes.c_int
            lib.ts_scan_count.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.ts_scan_parse.restype = ctypes.c_int
            lib.ts_scan_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
            _lib = lib
        except Exception:  # noqa: BLE001 — no compiler / load failure
            _lib_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def parse_ts_file_fast(path: str):
    """Native-accelerated equivalent of ts_parser.parse_ts_file; returns a
    TsFile or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from sie_tpu.data.ts_parser import TsFile

    with open(path, "rb") as f:
        data = f.read()

    # header metadata (cheap — python)
    class_labels = None
    is_regression = False
    problem_name = os.path.basename(path)
    equal_length = True
    has_class_label = False
    for raw in data.split(b"\n"):
        line = raw.strip()
        if line.startswith(b"@data") or line.startswith(b"@DATA"):
            break
        if not line.startswith(b"@"):
            continue
        tokens = line.split()
        tag = tokens[0].lower()
        if tag == b"@problemname" and len(tokens) > 1:
            problem_name = tokens[1].decode()
        elif tag == b"@equallength" and len(tokens) > 1:
            equal_length = tokens[1].lower() == b"true"
        elif tag == b"@classlabel":
            has_class_label = len(tokens) > 1 and tokens[1].lower() == b"true"
            if has_class_label:
                class_labels = [t.decode() for t in tokens[2:]]
        elif tag == b"@targetlabel":
            is_regression = len(tokens) > 1 and tokens[1].lower() == b"true"

    n_values = ctypes.c_int64()
    n_fields = ctypes.c_int64()
    n_lines = ctypes.c_int64()
    if lib.ts_scan_count(data, len(data), ctypes.byref(n_values),
                         ctypes.byref(n_fields), ctypes.byref(n_lines)) != 0:
        return None
    values = np.empty(n_values.value, np.float32)
    offsets = np.empty(n_fields.value + 1, np.int64)
    counts = np.empty(n_lines.value, np.int32)
    label_starts = np.empty(n_lines.value, np.int64)
    label_lens = np.empty(n_lines.value, np.int32)
    if lib.ts_scan_parse(data, len(data), values, offsets, counts,
                         label_starts, label_lens) != 0:
        return None

    has_label_field = has_class_label or is_regression
    series: List[List[np.ndarray]] = []
    labels: List[str] = []
    fi = 0
    for li in range(n_lines.value):
        nf = counts[li]
        ndim = nf - 1 if has_label_field else nf
        sample = [values[offsets[fi + d]: offsets[fi + d + 1]]
                  for d in range(ndim)]
        series.append(sample)
        if has_label_field:
            s0 = label_starts[li]
            labels.append(data[s0: s0 + label_lens[li]].decode())
        else:
            labels.append("")
        fi += nf

    n_dims = max((len(s) for s in series), default=1)
    return TsFile(series=series, labels=labels, class_labels=class_labels,
                  is_regression=is_regression, problem_name=problem_name,
                  equal_length=equal_length, n_dims=n_dims)
