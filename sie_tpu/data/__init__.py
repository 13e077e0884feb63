from sie_tpu.data.loader import ArrayDataset, Batcher  # noqa: F401
from sie_tpu.data.provider import data_provider  # noqa: F401
