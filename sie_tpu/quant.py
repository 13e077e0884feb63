"""Weight-only int8 post-training quantization for serving bundles.

Beyond-reference deployment feature (the reference serves by re-running the
full torch Experiment in f32, exp/experiment_classification.py:828): large
weight tensors are stored as symmetric per-channel int8 + an f32 scale,
shrinking the exported bundle and the serving host's HBM footprint ~4x.

TPU-first design:

- **Dequantize-inside-jit.** The Predictor keeps the int8 tensors in HBM
  and dequantizes them INSIDE the compiled program, immediately before the
  standard f32/bf16 apply. XLA fuses the (convert * scale) into the weight
  load of the consuming matmul/conv, so HBM traffic for the weights is the
  int8 bytes — the memory win survives at runtime, and models never see a
  QTensor (the Pallas kernels keep their f32 contract).
- **Per-output-channel scales.** Symmetric (zero-point-free) quantization
  with one scale per slice of the LAST axis — the output-feature axis of
  every flax kernel layout used here (Dense (in, out), Conv (k, in, out),
  MoE expert stacks (E, d, f)).
- **Size gate, not name gate.** Every float leaf with ndim >= 2 and
  >= `min_size` elements is quantized (norm scales and biases fall through
  untouched); `exclude` path substrings opt specific tensors out.

`Predictor.save_bundle(path, quantize=True)` writes the quantized bundle
(.npz with path-keyed entries); `Predictor.load_bundle` auto-detects it.
Accuracy is certified end-to-end in tests/test_quant.py (logit closeness +
prediction agreement vs the f32 bundle).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class QTensor(struct.PyTreeNode):
    """Symmetric per-channel int8 tensor: dequant = q.astype(f32) * scale."""

    q: jax.Array       # int8, original shape
    scale: jax.Array   # f32, shape (1, ..., 1, C_last)

    @property
    def shape(self):
        return self.q.shape


def quantize_tensor(w: jax.Array) -> QTensor:
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = (amax / 127.0 + (amax == 0.0)).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return QTensor(q=q, scale=scale)


def dequantize_tensor(t: QTensor) -> jax.Array:
    return t.q.astype(jnp.float32) * t.scale


def _is_q(x) -> bool:
    return isinstance(x, QTensor)


def quantize_params(params: Any, min_size: int = 4096,
                    exclude: Sequence[str] = ()) -> Any:
    """Replace large float leaves with QTensors (see module docstring)."""
    def rule(path: Tuple, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path)
        arr = np.asarray(leaf)
        if (np.issubdtype(arr.dtype, np.floating) and arr.ndim >= 2
                and arr.size >= min_size
                and not any(s in name for s in exclude)):
            return quantize_tensor(arr)
        return leaf

    return jax.tree_util.tree_map_with_path(rule, params)


def dequantize_params(params: Any) -> Any:
    """Inverse of quantize_params; identity on non-QTensor leaves. Call
    inside jit so XLA fuses the dequant into the consuming ops."""
    return jax.tree.map(
        lambda x: dequantize_tensor(x) if _is_q(x) else x, params,
        is_leaf=_is_q)


def has_quantized(params: Any) -> bool:
    return any(_is_q(l) for l in
               jax.tree.leaves(params, is_leaf=_is_q))


# ---- flat .npz (de)serialization -----------------------------------------
# Bundle weights are saved as one .npz whose keys are '/'-joined tree paths;
# quantized leaves contribute '<path>.q' + '<path>.scale' entries. The tree
# is rebuilt from the keys alone — no template needed (unlike the msgpack
# checkpoint path, train/checkpoint.py).

def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            tree, is_leaf=_is_q)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                       for p in path)
        if _is_q(leaf):
            out[key + ".q"] = np.asarray(leaf.q)
            out[key + ".scale"] = np.asarray(leaf.scale)
        else:
            out[key] = np.asarray(leaf)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    qs = {k[:-2] for k in flat if k.endswith(".q")}
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        base = key[:-2] if key.endswith(".q") else (
            key[:-6] if key.endswith(".scale") else key)
        parts = base.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if base in qs:
            slot = node.setdefault(parts[-1], {})
            slot["q" if key.endswith(".q") else "scale"] = arr
        else:
            node[parts[-1]] = arr

    def rebuild(node):
        if isinstance(node, dict):
            if set(node) == {"q", "scale"} and getattr(
                    node["q"], "dtype", None) == np.int8:
                return QTensor(q=node["q"], scale=node["scale"])
            return {k: rebuild(v) for k, v in node.items()}
        return node

    return rebuild(tree)


def save_quantized(path: str, variables: Dict[str, Any],
                   min_size: int = 4096,
                   exclude: Sequence[str] = ()) -> None:
    """Write variables (params quantized, batch_stats kept f32) to .npz."""
    tree = dict(variables)
    tree["params"] = quantize_params(tree["params"], min_size, exclude)
    np.savez_compressed(path, **_flatten(tree))


def load_quantized(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)
