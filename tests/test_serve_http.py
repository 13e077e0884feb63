"""HTTP inference server (sie_tpu/serve_http.py): routes, payload formats,
validation errors, parity with direct Predictor calls."""

import base64
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config
from sie_tpu.serve import Predictor
from sie_tpu.serve_http import PredictorServer


@pytest.fixture(scope="module")
def server():
    from sie_tpu.models import build_model
    cfg = Config(model="InterpGN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, num_shapelet=2, d_model=16, d_ff=32,
                 n_heads=2, e_layers=1, dropout=0.0, amp=False,
                 use_pallas=False, seed=0)
    model = build_model(cfg)
    x0 = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, cfg.seq_len)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    pred = Predictor(cfg, v)
    srv = PredictorServer(pred, max_request_rows=16)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", pred, cfg
    httpd.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_config(server):
    base, _pred, cfg = server
    code, h = _get(base + "/healthz")
    assert code == 200 and h["status"] == "ok"
    assert h["num_class"] == cfg.num_class and h["quantized"] is False
    code, c = _get(base + "/config")
    assert code == 200 and c["model"] == "InterpGN"
    assert _get(base + "/nope")[0] == 404


def test_predict_json_matches_direct(server):
    base, pred, cfg = server
    x = np.random.default_rng(0).normal(
        size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    code, out = _post(base + "/predict", {"x": x.tolist()})
    assert code == 200
    direct = pred.predict(x)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                               direct.logits, atol=1e-5)
    assert out["classes"] == direct.classes.tolist()
    assert "eta" in out      # InterpGN interpretability fields survive JSON


def test_predict_b64_bulk_format(server):
    base, pred, cfg = server
    x = np.random.default_rng(1).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype("<f4")
    code, out = _post(base + "/predict", {
        "x_b64": base64.b64encode(x.tobytes()).decode(),
        "shape": list(x.shape)})
    assert code == 200
    np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                               pred.predict(x).logits, atol=1e-5)


def test_gating_value_override(server):
    base, pred, cfg = server
    x = np.random.default_rng(2).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    code, out = _post(base + "/predict",
                      {"x": x.tolist(), "gating_value": 0.5})
    assert code == 200
    np.testing.assert_allclose(
        np.asarray(out["logits"], np.float32),
        pred.predict(x, gating_value=0.5).logits, atol=1e-5)


def test_validation_errors(server):
    base, _pred, cfg = server
    ok = np.zeros((1, cfg.seq_len, cfg.enc_in), np.float32)
    assert _post(base + "/predict", {})[0] == 400                 # no x
    assert _post(base + "/predict", {"x": [[1.0]]})[0] == 400     # bad shape
    bad = ok.copy(); bad[0, 0, 0] = np.nan
    assert _post(base + "/predict", {"x": bad.tolist()})[0] == 400
    big = np.zeros((17, cfg.seq_len, cfg.enc_in), np.float32)     # > limit
    assert _post(base + "/predict", {"x": big.tolist()})[0] == 400
    assert _post(base + "/predict", {"x_b64": "AAAA"})[0] == 400  # no shape
    assert _post(base + "/nothere", {"x": ok.tolist()})[0] == 404


def test_concurrent_requests(server):
    """The lock serializes device work; concurrent clients all succeed."""
    base, pred, cfg = server
    x = np.random.default_rng(3).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    want = pred.predict(x).classes.tolist()
    results = []

    def hit():
        results.append(_post(base + "/predict", {"x": x.tolist()}))

    threads = [threading.Thread(target=hit) for _ in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert all(code == 200 and out["classes"] == want
               for code, out in results)


def test_metrics_endpoint(server):
    base, pred, cfg = server
    x = np.zeros((2, cfg.seq_len, cfg.enc_in), np.float32)
    code, _ = _post(base + "/predict", {"x": x.tolist()})
    assert code == 200
    _post(base + "/predict", {})                 # one 400
    with urllib.request.urlopen(base + "/metrics") as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)
    assert metrics["sie_tpu_requests_total"] >= 1
    assert metrics["sie_tpu_rows_total"] >= 2
    assert metrics['sie_tpu_errors_total{code="400"}'] >= 1
    assert metrics['sie_tpu_request_seconds_bucket{le="+Inf"}'] == \
        metrics["sie_tpu_requests_total"]
    assert metrics["sie_tpu_request_seconds_sum"] > 0


@pytest.fixture(scope="module")
def batched_server():
    from sie_tpu.models import build_model
    cfg = Config(model="DNN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, dropout=0.0, amp=False, use_pallas=False,
                 seed=0)
    model = build_model(cfg)
    x0 = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, cfg.seq_len)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    pred = Predictor(cfg, v)
    srv = PredictorServer(pred, max_request_rows=64, batch_window_ms=150.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", pred, cfg, srv
    httpd.shutdown()


def test_micro_batching_coalesces_and_matches_direct(batched_server):
    """Concurrent small requests inside the window are served by FEWER
    device dispatches than requests, with per-request outputs equal to
    direct predictor calls."""
    base, pred, cfg, srv = batched_server
    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
          for _ in range(6)]
    # warm the jit outside the measured burst
    _post(base + "/predict", {"x": xs[0].tolist()})
    before = srv.batched_dispatches
    results = [None] * 6

    def hit(i):
        results[i] = _post(base + "/predict", {"x": xs[i].tolist()})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for i in range(6):
        code, out = results[i]
        assert code == 200
        np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                                   pred.predict(xs[i]).logits, atol=1e-5)
    dispatches = srv.batched_dispatches - before
    assert dispatches < 6       # at least some coalescing happened


def test_micro_batching_gating_groups_separate(batched_server):
    """Requests with different gating_value in one window must not share a
    device batch's gating — each comes back matching its own direct call."""
    base, pred, cfg, srv = batched_server
    x = np.random.default_rng(1).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    results = {}

    def hit(tag, payload):
        results[tag] = _post(base + "/predict", payload)

    threads = [
        threading.Thread(target=hit,
                         args=("plain", {"x": x.tolist()})),
        threading.Thread(target=hit,
                         args=("gated", {"x": x.tolist(),
                                         "gating_value": 0.5})),
    ]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert results["plain"][0] == 200 and results["gated"][0] == 200
    np.testing.assert_allclose(
        np.asarray(results["plain"][1]["logits"], np.float32),
        pred.predict(x).logits, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(results["gated"][1]["logits"], np.float32),
        pred.predict(x, gating_value=0.5).logits, atol=1e-5)


def test_micro_batching_error_isolated(batched_server):
    """A bad request in the window fails alone; good requests still
    succeed (validation happens before enqueue)."""
    base, pred, cfg, srv = batched_server
    ok = np.zeros((2, cfg.seq_len, cfg.enc_in), np.float32)
    out_ok = {}
    out_bad = {}

    def good():
        out_ok["r"] = _post(base + "/predict", {"x": ok.tolist()})

    def bad():
        out_bad["r"] = _post(base + "/predict", {"x": [[1.0]]})

    ts = [threading.Thread(target=good), threading.Thread(target=bad)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert out_ok["r"][0] == 200
    assert out_bad["r"][0] == 400


def test_serving_aot_artifact_over_http(tmp_path):
    """PredictorServer serves a CompiledPredictor: health/config from the
    manifest, predict parity, gating override rejected (baked at export)."""
    from sie_tpu.serve import CompiledPredictor
    from sie_tpu.models import build_model
    cfg = Config(model="InterpGN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, num_shapelet=2, d_model=16, d_ff=32,
                 n_heads=2, e_layers=1, dropout=0.0, amp=False,
                 use_pallas=False, seed=0)
    model = build_model(cfg)
    x0 = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, cfg.seq_len)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    live = Predictor(cfg, v)
    d = str(tmp_path / "aot")
    live.export_stablehlo(d, batch_sizes=(4,))
    cp = CompiledPredictor(d)

    srv = PredictorServer(cp, max_request_rows=16)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, h = _get(base + "/healthz")
        assert code == 200 and h["serving"] == "stablehlo-aot"
        assert h["max_batch"] == 4
        code, c = _get(base + "/config")
        assert code == 200 and c["buckets"] == [4]
        x = np.random.default_rng(0).normal(
            size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
        code, out = _post(base + "/predict", {"x": x.tolist()})
        assert code == 200
        np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                                   live.predict(x).logits, atol=1e-5)
        code, err = _post(base + "/predict",
                          {"x": x.tolist(), "gating_value": 0.5})
        assert code == 400 and "baked" in err["error"]
    finally:
        httpd.shutdown()


def test_aot_with_micro_batching_and_bad_gating(tmp_path):
    """AOT serving + micro-batching must not kill the batcher thread:
    requests coalesce via the manifest's bucket cap, and an unhashable
    gating_value fails with a clean 400 (before enqueue), leaving the
    server healthy."""
    from sie_tpu.serve import CompiledPredictor
    from sie_tpu.models import build_model
    cfg = Config(model="DNN", dnn_type="FCN", seq_len=24, enc_in=3,
                 num_class=4, dropout=0.0, amp=False, use_pallas=False,
                 seed=0)
    model = build_model(cfg)
    x0 = jnp.zeros((2, cfg.seq_len, cfg.enc_in), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           x0, jnp.ones((2, cfg.seq_len)), train=False)
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    live = Predictor(cfg, v)
    d = str(tmp_path / "aot")
    live.export_stablehlo(d, batch_sizes=(8,))
    srv = PredictorServer(CompiledPredictor(d), max_request_rows=16,
                          batch_window_ms=100.0)
    assert srv._coalesce_cap == 8
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        x = np.zeros((2, cfg.seq_len, cfg.enc_in), np.float32)
        # unhashable gating -> clean 400, batcher untouched
        code, err = _post(base + "/predict",
                          {"x": x.tolist(), "gating_value": [0.5]})
        assert code == 400 and "number or null" in err["error"]
        # batched path works through the AOT predictor
        results = []

        def hit():
            results.append(_post(base + "/predict", {"x": x.tolist()}))

        ts = [threading.Thread(target=hit) for _ in range(3)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert all(c == 200 for c, _ in results)
        np.testing.assert_allclose(
            np.asarray(results[0][1]["logits"], np.float32),
            live.predict(x).logits, atol=1e-5)
    finally:
        httpd.shutdown()


def test_metrics_count_errors_in_requests_total(batched_server):
    base, _pred, cfg, srv = batched_server
    with urllib.request.urlopen(base + "/metrics") as r:
        before = r.read().decode()
    _post(base + "/predict", {})      # a 400
    with urllib.request.urlopen(base + "/metrics") as r:
        after = r.read().decode()

    def val(text, name):
        for line in text.splitlines():
            if line.startswith(name + " "):
                return float(line.rsplit(" ", 1)[1])
        return 0.0

    assert val(after, "sie_tpu_requests_total") == \
        val(before, "sie_tpu_requests_total") + 1


def test_inference_client_roundtrip(server):
    """sie_tpu.client.InferenceClient: health/config/predict/metrics parity
    with direct Predictor calls, b64 bulk path, server-error mapping."""
    from sie_tpu.client import InferenceClient, ServerError
    base, pred, cfg = server
    c = InferenceClient(base, json_threshold_rows=2)
    assert c.health()["status"] == "ok"
    assert c.config()["model"] == "InterpGN"
    rng = np.random.default_rng(9)
    # small request: JSON path; large: b64 path — both must match direct
    for b in (2, 5):
        x = rng.normal(size=(b, cfg.seq_len, cfg.enc_in)).astype(np.float32)
        out = c.predict(x)
        direct = pred.predict(x)
        np.testing.assert_allclose(out.logits, direct.logits, atol=1e-5)
        np.testing.assert_array_equal(out.classes, direct.classes)
        assert out.eta is not None
    with pytest.raises(ServerError) as ei:
        c.predict(np.zeros((1, 5, 5), np.float32))
    assert ei.value.status == 400 and "must be" in str(ei.value)
    assert "sie_tpu_requests_total" in c.metrics()


def _post_npz(url, arrays, accept="application/x-npz"):
    import io
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        url, data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz", "Accept": accept})
    try:
        with urllib.request.urlopen(req) as r:
            body = r.read()
            if "npz" in (r.headers.get("Content-Type") or ""):
                with np.load(io.BytesIO(body), allow_pickle=False) as z:
                    return r.status, {k: z[k] for k in z.files}
            return r.status, json.loads(body)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_predict_npz_binary_roundtrip(server):
    """npz request + npz response equals the direct Predictor call; the
    same npz request with a JSON Accept gets a JSON-list body."""
    base, pred, cfg = server
    x = np.random.default_rng(11).normal(
        size=(3, cfg.seq_len, cfg.enc_in)).astype("<f4")
    code, out = _post_npz(base + "/predict", {"x": x})
    assert code == 200
    direct = pred.predict(x)
    np.testing.assert_allclose(out["logits"], direct.logits, atol=1e-5)
    np.testing.assert_array_equal(out["classes"], direct.classes)
    assert "eta" in out and isinstance(out["eta"], np.ndarray)
    # npz in, JSON out
    code, jout = _post_npz(base + "/predict", {"x": x}, accept="*/*")
    assert code == 200 and isinstance(jout["logits"], list)
    np.testing.assert_allclose(np.asarray(jout["logits"], np.float32),
                               direct.logits, atol=1e-5)
    # JSON in, npz out (Accept alone selects the response encoding)
    req = urllib.request.Request(
        base + "/predict", data=json.dumps({"x": x.tolist()}).encode(),
        headers={"Content-Type": "application/json",
                 "Accept": "application/x-npz"})
    with urllib.request.urlopen(req) as r:
        assert "npz" in r.headers["Content-Type"]


def test_predict_npz_mask_and_gating(server):
    base, pred, cfg = server
    x = np.random.default_rng(12).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype("<f4")
    mask = np.ones((2, cfg.seq_len), np.float32)
    code, out = _post_npz(base + "/predict",
                          {"x": x, "padding_mask": mask,
                           "gating_value": np.float32(0.5)})
    assert code == 200
    np.testing.assert_allclose(
        out["logits"], pred.predict(x, mask, gating_value=0.5).logits,
        atol=1e-5)
    # NaN gating encodes JSON null (explicit None override)
    code, out = _post_npz(base + "/predict",
                          {"x": x, "gating_value": np.float32(np.nan)})
    assert code == 200
    np.testing.assert_allclose(
        out["logits"], pred.predict(x, gating_value=None).logits, atol=1e-5)


def test_predict_npz_errors(server):
    base, _pred, cfg = server
    # garbage bytes with the npz content type -> 400, JSON error body
    req = urllib.request.Request(
        base + "/predict", data=b"not an npz",
        headers={"Content-Type": "application/x-npz"})
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "invalid npz" in json.loads(e.read())["error"]
    # npz without an x key -> 400
    code, out = _post_npz(base + "/predict",
                          {"y": np.zeros((1, cfg.seq_len, cfg.enc_in),
                                         np.float32)})
    assert code == 400


def test_inference_client_npz_encoding(server):
    from sie_tpu.client import InferenceClient
    base, pred, cfg = server
    c = InferenceClient(base, encoding="npz")
    x = np.random.default_rng(13).normal(
        size=(4, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    out = c.predict(x)
    direct = pred.predict(x)
    np.testing.assert_allclose(out.logits, direct.logits, atol=1e-5)
    np.testing.assert_array_equal(out.classes, direct.classes)
    out2 = c.predict(x, gating_value=None)   # null rides as NaN
    np.testing.assert_allclose(
        out2.logits, pred.predict(x, gating_value=None).logits, atol=1e-5)


def test_fields_projection(server):
    """`fields` keeps only the named outputs (+classes) in both codecs."""
    base, pred, cfg = server
    x = np.random.default_rng(14).normal(
        size=(2, cfg.seq_len, cfg.enc_in)).astype("<f4")
    code, out = _post(base + "/predict",
                      {"x": x.tolist(), "fields": ["probs"]})
    assert code == 200 and set(out) == {"probs", "classes"}
    np.testing.assert_allclose(np.asarray(out["probs"], np.float32),
                               pred.predict(x).probs, atol=1e-5)
    code, out = _post_npz(base + "/predict",
                          {"x": x, "fields": np.asarray(["eta"])})
    assert code == 200 and set(out) == {"eta", "classes"}
    # unknown field -> 400 listing the valid names
    code, err = _post(base + "/predict",
                      {"x": x.tolist(), "fields": ["nope"]})
    assert code == 400 and "unknown fields" in err["error"]
    # client pass-through
    from sie_tpu.client import InferenceClient
    out = InferenceClient(base, encoding="npz").predict(
        x, fields=["probs"])
    assert out.logits is None and out.eta is None
    np.testing.assert_allclose(out.probs, pred.predict(x).probs, atol=1e-5)
    out = InferenceClient(base).predict(x, fields=["logits"])
    assert out.probs is None
    np.testing.assert_allclose(out.logits, pred.predict(x).logits,
                               atol=1e-5)


def test_default_fields_server_level(server):
    """--default_fields projects responses for requests with no `fields`
    key; an explicit request-level `fields` (or ['all'] / JSON null)
    overrides the server default (VERDICT r4 item 6)."""
    _base, pred, cfg = server
    srv = PredictorServer(pred, max_request_rows=16,
                          default_fields={"probs"})
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        x = np.random.default_rng(31).normal(
            size=(2, cfg.seq_len, cfg.enc_in)).astype("<f4")
        # naive client: no fields key -> lean default applies
        code, out = _post(base + "/predict", {"x": x.tolist()})
        assert code == 200 and set(out) == {"probs", "classes"}
        # explicit fields overrides the default
        code, out = _post(base + "/predict",
                          {"x": x.tolist(), "fields": ["logits"]})
        assert code == 200 and set(out) == {"logits", "classes"}
        # ['all'] opts back into everything
        code, out = _post(base + "/predict",
                          {"x": x.tolist(), "fields": ["all"]})
        assert code == 200 and {"logits", "probs", "eta", "p", "d"} <= set(out)
        # JSON null also means everything
        code, out = _post(base + "/predict",
                          {"x": x.tolist(), "fields": None})
        assert code == 200 and "p" in out and "logits" in out
        # npz transport honors the default too
        code, out = _post_npz(base + "/predict", {"x": x})
        assert code == 200 and set(out) == {"probs", "classes"}
    finally:
        httpd.shutdown()
    # constructor validates names
    with pytest.raises(ValueError, match="unknown default_fields"):
        PredictorServer(pred, default_fields={"nope"})


def test_fields_union_through_micro_batcher(server):
    """Coalesced requests with different `fields` each get their own
    projection; the batcher fetches the union (one dispatch)."""
    _base, pred, cfg = server
    srv = PredictorServer(pred, max_request_rows=16, batch_window_ms=150.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        rng = np.random.default_rng(21)
        xs = [rng.normal(size=(2, cfg.seq_len, cfg.enc_in)).astype("<f4")
              for _ in range(3)]
        _post(base + "/predict", {"x": xs[0].tolist()})   # warm the jit
        before = srv.batched_dispatches
        payloads = [
            {"x": xs[0].tolist(), "fields": ["probs"]},
            {"x": xs[1].tolist(), "fields": ["eta"]},
            {"x": xs[2].tolist()},                       # wants everything
        ]
        results = [None] * 3

        def hit(i):
            results[i] = _post(base + "/predict", payloads[i])

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert all(r[0] == 200 for r in results)
        assert set(results[0][1]) == {"probs", "classes"}
        assert set(results[1][1]) == {"eta", "classes"}
        assert "p" in results[2][1] and "logits" in results[2][1]
        for i in range(3):
            direct = pred.predict(xs[i])
            np.testing.assert_array_equal(results[i][1]["classes"],
                                          direct.classes)
        np.testing.assert_allclose(
            np.asarray(results[0][1]["probs"], np.float32),
            pred.predict(xs[0]).probs, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(results[1][1]["eta"], np.float32),
            pred.predict(xs[1]).eta, atol=1e-5)
        assert srv.batched_dispatches - before < 3   # coalescing happened
        # all-projected window: union fetch drops unrequested tensors but
        # every request still gets what it asked for
        results2 = [None] * 2
        payloads = [{"x": xs[0].tolist(), "fields": ["probs"]},
                    {"x": xs[1].tolist(), "fields": ["eta"]}]

        def hit2(i):
            results2[i] = _post(base + "/predict", payloads[i])

        threads = [threading.Thread(target=hit2, args=(i,)) for i in (0, 1)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert set(results2[0][1]) == {"probs", "classes"}
        assert set(results2[1][1]) == {"eta", "classes"}
    finally:
        httpd.shutdown()
