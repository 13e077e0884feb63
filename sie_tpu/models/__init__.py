from sie_tpu.models.info import ModelInfo  # noqa: F401
from sie_tpu.models.registry import build_model, MODEL_REGISTRY, DNN_REGISTRY  # noqa: F401
