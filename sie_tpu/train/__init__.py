from sie_tpu.train.trainer import Trainer, TrainState, compute_beta  # noqa: F401
from sie_tpu.train.experiment import Experiment  # noqa: F401
