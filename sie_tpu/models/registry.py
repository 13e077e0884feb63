"""Model registries (reference model registry at
exp/experiment_classification.py:87-93 and dnn_dict at model/InterpGN.py:13-19).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from sie_tpu.config import Config
from sie_tpu.models.info import ModelInfo


def _dnn_registry():
    from sie_tpu.models.fcn import FullyConvNetwork
    from sie_tpu.models.transformer import Transformer
    from sie_tpu.models.timesnet import TimesNet
    from sie_tpu.models.patchtst import PatchTST
    from sie_tpu.models.resnet import ResNet
    from sie_tpu.models.extra.backbones import (AutoformerBackbone,
                                                CrossformerBackbone,
                                                ETSformerBackbone,
                                                FEDformerBackbone,
                                                PyraformerBackbone)
    return {
        "FCN": FullyConvNetwork,
        "Transformer": Transformer,
        "TimesNet": TimesNet,
        "PatchTST": PatchTST,
        "ResNet": ResNet,
        # classification heads for the resurrected layer families
        # (models/extra/backbones.py — beyond-reference; usable standalone
        # via --model DNN and as the deep expert inside InterpGN)
        "Autoformer": AutoformerBackbone,
        "FEDformer": FEDformerBackbone,
        "ETSformer": ETSformerBackbone,
        "Pyraformer": PyraformerBackbone,
        "Crossformer": CrossformerBackbone,
    }


class _LazyRegistry(dict):
    def __init__(self, loader):
        super().__init__()
        self._loader = loader

    def _ensure(self):
        if not self:
            self.update(self._loader())

    def __getitem__(self, key):
        self._ensure()
        return super().__getitem__(key)

    def keys(self):
        self._ensure()
        return super().keys()


DNN_REGISTRY = _LazyRegistry(_dnn_registry)


class DNNWrapper(nn.Module):
    """Bare backbone presented with the (logits, ModelInfo) interface."""

    config: Config

    def setup(self):
        self.backbone = DNN_REGISTRY[self.config.dnn_type](self.config)

    def __call__(self, x, padding_mask=None, train: bool = False,
                 gating_value=None):
        logits = self.backbone(x, padding_mask, train=train)
        return logits, ModelInfo(preds=logits,
                                 loss=jnp.zeros((1,), jnp.float32))


def _model_registry():
    from sie_tpu.models.interpgn import InterpGN
    from sie_tpu.models.sbm import ShapeBottleneckModel
    from sie_tpu.models.eegcnn import EEGCNNTransformer
    import functools
    return {
        "InterpGN": InterpGN,
        "SBM": functools.partial(ShapeBottleneckModel, variant="sbm"),
        "LTS": functools.partial(ShapeBottleneckModel, variant="lts"),
        "DNN": DNNWrapper,
        "EEGCNN": EEGCNNTransformer,
    }


MODEL_REGISTRY = _LazyRegistry(_model_registry)


def build_model(cfg: Config) -> nn.Module:
    if cfg.model not in MODEL_REGISTRY.keys():
        raise ValueError(
            f"model {cfg.model!r} not in registry {sorted(MODEL_REGISTRY.keys())}")
    return MODEL_REGISTRY[cfg.model](config=cfg)
