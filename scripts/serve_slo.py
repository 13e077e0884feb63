#!/usr/bin/env python
"""Serving SLO benchmark (VERDICT r3 item 6): measured p50/p99 latency and
throughput for the HTTP inference server under concurrent load, per request
size, for the three serving paths (live f32 Predictor, int8 bundle, AOT
StableHLO). One path per process (relay executable hygiene).

Workload: flagship InterpGN+Transformer at CHISCO shape (845 x 122; weights
random-init — SLO is about latency, not accuracy). 4 concurrent clients x 24
requests per request-size bucket (1 / 8 / 32 rows), after a warmup compile of
each bucket. `window` variants add --batch_window_ms micro-batching.

Usage: python scripts/serve_slo.py {f32,int8,aot} [window_ms] [out.json]
                                   [encoding: json|b64|npz] [all|lean|default|paired]

`lean` adds `fields: ["probs"]` response projection (drops the (B, 7320)
InterpGN p/d interpretability tensors from the response). `default` starts
the SERVER with default_fields={"probs"} and drives it with a NAIVE client
that sends no fields at all — measuring what an unmodified bulk client gets
once the operator sets the r5 server-level default (VERDICT r4 weak-7).
`paired` also starts the server with default_fields={"probs"} but each
client thread ALTERNATES naive and `fields: ["all"]` requests, so both
arms sample the same relay minutes: measured r5, inter-slot relay drift
(26-42 rows/s at the 32-row bucket across back-to-back one-mode runs) is
larger than the lean-vs-all contrast, so only a within-window paired
design resolves the default-fields speedup.

`encoding` selects the request/response transport (default json — nested
float lists, the human-debuggable path). `b64` uses the x_b64 fast path
(JSON response), `npz` the binary path both directions; the deltas
quantify how much of the JSON-path latency is host-side text codec
rather than the device.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_LEN, ENC_IN, NUM_CLASS = 845, 122, 3
BUCKETS = (1, 8, 32)
CLIENTS, REQS = 4, 24


def build_predictor(mode: str):
    import jax
    import jax.numpy as jnp
    from sie_tpu.config import Config
    from sie_tpu.models import build_model
    from sie_tpu.serve import CompiledPredictor, Predictor

    cfg = Config(data="EEG3", model="InterpGN", dnn_type="Transformer",
                 seq_len=SEQ_LEN, enc_in=ENC_IN, num_class=NUM_CLASS,
                 num_shapelet=10, d_model=512, d_ff=2048, n_heads=8,
                 e_layers=2, dropout=0.0, amp=True, seed=0,
                 use_pallas=jax.default_backend() == "tpu")
    model = build_model(cfg)
    x0 = jnp.zeros((2, SEQ_LEN, ENC_IN), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, SEQ_LEN)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    pred = Predictor(cfg, v, max_batch=64)
    if mode == "f32":
        return pred
    import tempfile
    art = tempfile.mkdtemp(prefix=f"slo_{mode}_")
    if mode == "int8":
        path = os.path.join(art, "bundle")
        pred.save_bundle(path, quantize=True)
        return Predictor.load_bundle(path, max_batch=64)
    if mode == "aot":
        path = os.path.join(art, "hlo")
        pred.export_stablehlo(path, batch_sizes=BUCKETS)
        return CompiledPredictor(path)
    raise SystemExit(f"unknown mode {mode!r}")


def _build_request(url: str, x: np.ndarray, encoding: str,
                   lean: bool = False, fields=None):
    import base64
    import io
    if fields is None:
        fields = ["probs"] if lean else None
    if encoding == "json":
        payload = {"x": x.tolist()}
        if fields:
            payload["fields"] = fields
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
    elif encoding == "b64":
        payload = {"x_b64": base64.b64encode(x.tobytes()).decode(),
                   "shape": list(x.shape)}
        if fields:
            payload["fields"] = fields
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
    elif encoding == "npz":
        buf = io.BytesIO()
        arrays = {"x": x}
        if fields:
            arrays["fields"] = np.asarray(fields)
        np.savez(buf, **arrays)
        body = buf.getvalue()
        headers = {"Content-Type": "application/x-npz",
                   "Accept": "application/x-npz"}
    else:
        raise SystemExit(f"unknown encoding {encoding!r}")
    return urllib.request.Request(url + "/predict", data=body,
                                  headers=headers)


def drive(url: str, rows: int, encoding: str = "json", lean: bool = False):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(rows, SEQ_LEN, ENC_IN)).astype("<f4")
    req = _build_request(url, x, encoding, lean)

    # warmup (compiles the bucket; excluded from timing)
    for _ in range(2):
        urllib.request.urlopen(req, timeout=600).read()

    lat, lock = [], threading.Lock()

    def client():
        # body prebuilt per thread: measured latency is server-side
        # parse + device + response encode, not client-side encode
        my_req = _build_request(url, x, encoding, lean)
        for _ in range(REQS):
            t0 = time.perf_counter()
            with urllib.request.urlopen(my_req, timeout=600) as r:
                r.read()
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(np.asarray(lat))
    n = len(lat)
    return {
        "rows_per_request": rows,
        "requests": n,
        "concurrency": CLIENTS,
        "p50_ms": round(1e3 * float(lat[n // 2]), 1),
        "p99_ms": round(1e3 * float(lat[min(n - 1, int(0.99 * n))]), 1),
        "mean_ms": round(1e3 * float(lat.mean()), 1),
        "throughput_rows_per_s": round(n * rows / wall, 1),
    }


def drive_paired(url: str, rows: int, encoding: str = "npz"):
    """Within-window contrast: every client thread alternates a NAIVE
    request (no fields key; the server's default_fields={'probs'} applies)
    and an explicit fields=['all'] request, so both arms sample identical
    relay minutes. Returns (naive_row, all_row, ratio)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(rows, SEQ_LEN, ENC_IN)).astype("<f4")
    req_naive = _build_request(url, x, encoding)
    req_all = _build_request(url, x, encoding, fields=["all"])

    for req in (req_naive, req_all):          # warm both response shapes
        for _ in range(2):
            urllib.request.urlopen(req, timeout=600).read()

    lat = {"naive": [], "all": []}
    lock = threading.Lock()

    def client():
        my = {"naive": _build_request(url, x, encoding),
              "all": _build_request(url, x, encoding, fields=["all"])}
        for i in range(2 * REQS):
            arm = "naive" if i % 2 == 0 else "all"
            t0 = time.perf_counter()
            with urllib.request.urlopen(my[arm], timeout=600) as r:
                r.read()
            dt = time.perf_counter() - t0
            with lock:
                lat[arm].append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    out = []
    for arm in ("naive", "all"):
        a = np.sort(np.asarray(lat[arm]))
        n = len(a)
        out.append({
            "rows_per_request": rows, "requests": n, "concurrency": CLIENTS,
            "p50_ms": round(1e3 * float(a[n // 2]), 1),
            "p99_ms": round(1e3 * float(a[min(n - 1, int(0.99 * n))]), 1),
            "mean_ms": round(1e3 * float(a.mean()), 1),
            # both arms share the wall clock; throughput is per-arm rows
            # over the SHARED wall (the arms ran interleaved)
            "throughput_rows_per_s": round(n * rows / wall, 1),
            "arm": arm, "paired": True,
        })
    naive, allf = out
    ratio = round(allf["mean_ms"] / naive["mean_ms"], 2)
    return naive, allf, ratio


def main():
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    window_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    encoding = sys.argv[4] if len(sys.argv) > 4 else "json"
    fields_mode = sys.argv[5] if len(sys.argv) > 5 else "all"
    if fields_mode not in ("all", "lean", "default", "paired"):
        raise SystemExit(f"unknown fields mode {fields_mode!r}")
    lean = fields_mode == "lean"

    from sie_tpu.serve_http import PredictorServer

    print(f"[slo] building {mode} predictor ...", file=sys.stderr, flush=True)
    pred = build_predictor(mode)
    srv = PredictorServer(pred, max_request_rows=4096,
                          batch_window_ms=window_ms,
                          default_fields={"probs"}
                          if fields_mode in ("default", "paired") else None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    results = []
    for rows in BUCKETS:
        print(f"[slo] {mode}/{encoding} rows={rows}: warm + drive ...",
              file=sys.stderr, flush=True)
        if fields_mode == "paired":
            naive, allf, ratio = drive_paired(url, rows, encoding)
            for r in (naive, allf):
                r.update(mode=mode, window_ms=window_ms, encoding=encoding,
                         fields=fields_mode, all_over_naive_mean=ratio)
                results.append(r)
                print(json.dumps(r), flush=True)
            continue
        r = drive(url, rows, encoding, lean)
        r.update(mode=mode, window_ms=window_ms, encoding=encoding,
                 fields=fields_mode)
        results.append(r)
        print(json.dumps(r), flush=True)
    httpd.shutdown()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
