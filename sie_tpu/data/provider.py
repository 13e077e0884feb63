"""Dataset provider — registry + factory (reference
`data_factory/data_factory.py:10-160`).

Maps the data flag to a loaded ArrayDataset + fixed-shape Batcher. Shuffle is
train-only; classification keeps all samples (drop_last=False semantics via
weighted final-batch padding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from sie_tpu.config import Config
from sie_tpu.data.loader import ArrayDataset, Batcher


def data_provider(cfg: Config, flag: str,
                  bin_edges: Optional[np.ndarray] = None,
                  loso_test_subject: Optional[int] = None,
                  ) -> Tuple[ArrayDataset, Batcher]:
    flag = flag.lower()
    if cfg.data in ("EEG", "EEG3"):
        from sie_tpu.data.eeg import load_eeg_dataset
        ds = load_eeg_dataset(cfg, flag, three_class=(cfg.data == "EEG3"),
                              loso_test_subject=loso_test_subject)
    elif cfg.data == "UEA":
        from sie_tpu.data.uea import load_uea_dataset
        ds = load_uea_dataset(cfg.data_root, cfg.dataset, flag)
    elif cfg.data == "Monash":
        from sie_tpu.data.monash import load_monash_dataset
        ds = load_monash_dataset(cfg.data_root, cfg.dataset, flag,
                                 bin_edges=bin_edges)
    else:
        raise ValueError(f"unknown data {cfg.data!r}")

    shuffle = flag == "train"
    batcher = Batcher(ds, cfg.batch_size, shuffle=shuffle,
                      seed=max(cfg.seed, 0), drop_last=False)
    return ds, batcher
