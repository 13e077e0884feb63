"""InterpGN — Gini-gated mixture of a Shapelet Bottleneck Model and a deep
backbone (reference model/InterpGN.py:22-66).

Gate: per-sample Gini index of the SBM softmax, eta = (C*sum(p^2) - 1)/(C - 1);
optional hard gating at test time forces eta=1 for samples above the threshold
(InterpGN.py:48-50). Output = eta * sbm_logits + (1 - eta) * deep_logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.info import ModelInfo
from sie_tpu.models.sbm import ShapeBottleneckModel


class InterpGN(nn.Module):
    config: Config

    def setup(self):
        from sie_tpu.models.registry import DNN_REGISTRY
        self.sbm = ShapeBottleneckModel(self.config, variant="sbm")
        self.deep_model = DNN_REGISTRY[self.config.dnn_type](self.config)

    def __call__(self, x, padding_mask=None, train: bool = False,
                 gating_value: Optional[float] = None):
        sbm_out, info = self.sbm(x, padding_mask, train=train)
        deep_out = self.deep_model(x, padding_mask, train=train)

        c = sbm_out.shape[-1]
        probs = jax.nn.softmax(sbm_out, axis=-1)
        gini = jnp.sum(jnp.square(probs), axis=-1, keepdims=True)
        eta = (c * gini - 1.0) / (c - 1.0)
        if gating_value is not None:
            hard = (eta > gating_value).astype(eta.dtype)
            eta = hard + eta * (1.0 - hard)
        out = eta * sbm_out + (1.0 - eta) * deep_out

        return out, ModelInfo(d=info.d, p=info.p, eta=eta,
                              shapelet_preds=sbm_out, dnn_preds=deep_out,
                              preds=out, loss=info.loss)
