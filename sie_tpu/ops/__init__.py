from sie_tpu.ops.shapelet import (  # noqa: F401
    instance_norm,
    sliding_distance,
    ste_max,
    ste_min,
    rbf,
    diversity_loss,
)
