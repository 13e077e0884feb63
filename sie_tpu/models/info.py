"""ModelInfo — the auxiliary-output bundle every model returns.

Pytree counterpart of the reference dataclass `utils/shapelet_util.py:17-28`.
Fields default to None so DNN-style models can return a bare-logits info.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import struct


@struct.dataclass
class ModelInfo:
    d: Optional[jax.Array] = None              # min distances   (B, F)
    p: Optional[jax.Array] = None              # max RBF probs   (B, F)
    eta: Optional[jax.Array] = None            # gating utility  (B, 1)
    shapelet_preds: Optional[jax.Array] = None  # SBM logits
    dnn_preds: Optional[jax.Array] = None      # deep-branch logits
    preds: Optional[jax.Array] = None          # blended logits
    loss: Optional[jax.Array] = None           # model reg loss, shape (1,)
