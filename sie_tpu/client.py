"""Thin stdlib client for the sie_tpu HTTP inference API (serve_http.py).

Beyond-reference convenience (the reference has no serving API at all):
lets a consumer process hit a serving host without importing jax or the
model code —

    from sie_tpu.client import InferenceClient
    c = InferenceClient("http://host:8723")
    print(c.health())
    out = c.predict(x)            # x: (B, seq_len, enc_in) np.ndarray
    out.classes, out.probs        # same PredictOutput-shaped fields

Bulk payloads go base64 (the server's x_b64 fast path) above
`json_threshold_rows`; below it, plain JSON lists keep requests
human-debuggable.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import urllib.error
import urllib.request
from typing import Optional

import numpy as np

_MISSING = object()


class ServerError(RuntimeError):
    """Non-2xx response; carries the HTTP status and server error text."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


@dataclasses.dataclass
class ClientPredictOutput:
    logits: np.ndarray
    probs: np.ndarray
    classes: np.ndarray
    eta: Optional[np.ndarray] = None
    p: Optional[np.ndarray] = None
    d: Optional[np.ndarray] = None
    shapelet_preds: Optional[np.ndarray] = None
    dnn_preds: Optional[np.ndarray] = None


class InferenceClient:
    def __init__(self, base_url: str, timeout: float = 630.0,
                 json_threshold_rows: int = 8):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.json_threshold_rows = json_threshold_rows

    # ---- transport -------------------------------------------------------
    def _request(self, path: str, payload: Optional[dict] = None) -> dict:
        url = self.base_url + path
        data = None
        headers = {}
        if payload is not None:
            data = json.dumps(payload).encode()
            headers["Content-Type"] = "application/json"
        req = urllib.request.Request(url, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", "")
            except Exception:   # noqa: BLE001 — best-effort error body
                msg = ""
            raise ServerError(e.code, msg) from None

    # ---- API -------------------------------------------------------------
    def health(self) -> dict:
        return self._request("/healthz")

    def config(self) -> dict:
        return self._request("/config")

    def metrics(self) -> str:
        with urllib.request.urlopen(self.base_url + "/metrics",
                                    timeout=self.timeout) as r:
            return r.read().decode()

    def predict(self, x: np.ndarray,
                padding_mask: Optional[np.ndarray] = None,
                gating_value=_MISSING) -> ClientPredictOutput:
        x = np.ascontiguousarray(np.asarray(x, dtype="<f4"))
        if x.ndim != 3:
            raise ValueError(f"x must be (B, T, C); got {x.shape}")
        if x.shape[0] > self.json_threshold_rows:
            payload = {"x_b64": base64.b64encode(x.tobytes()).decode(),
                       "shape": list(x.shape)}
        else:
            payload = {"x": x.tolist()}
        if padding_mask is not None:
            payload["padding_mask"] = np.asarray(
                padding_mask, np.float32).tolist()
        if gating_value is not _MISSING:
            payload["gating_value"] = gating_value
        resp = self._request("/predict", payload)
        fields = {f.name for f in dataclasses.fields(ClientPredictOutput)}
        out = {k: np.asarray(v, np.float32) for k, v in resp.items()
               if k in fields}
        out["classes"] = np.asarray(resp["classes"], np.int64)
        return ClientPredictOutput(**out)
