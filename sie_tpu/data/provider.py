"""Dataset provider — registry + factory (reference
`data_factory/data_factory.py:10-160`).

The registry carries the reference's full 15-entry `data_dict` surface
(data_factory.py:10-26): classification (EEG/EEG3/UEA), regression (Monash),
forecasting (ETTh1/ETTh2/ETTm1/ETTm2/custom/m4) and anomaly segments
(PSM/MSL/SMAP/SMD/SWAT). Like the reference — whose CLI restricts task_name
to classification/regression — only the first two families are reachable from
run.py; the rest are exposed for library use and return window/segment
batchers.

Classification/regression datasets map to fixed-shape `Batcher`s (shuffle
train-only, drop_last=False semantics via weighted final-batch padding);
forecast/anomaly datasets map to `IndexedBatcher`s over their window tuples.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from sie_tpu.config import Config
from sie_tpu.data.loader import ArrayDataset, Batcher, IndexedBatcher


def _eeg(three_class: bool):
    def load(cfg: Config, flag: str, *, loso_test_subject=None, **_):
        from sie_tpu.data.eeg import load_eeg_dataset
        return load_eeg_dataset(cfg, flag, three_class=three_class,
                                loso_test_subject=loso_test_subject)
    return load


def _uea(cfg: Config, flag: str, **_):
    from sie_tpu.data.uea import load_uea_dataset
    return load_uea_dataset(cfg.data_root, cfg.dataset, flag,
                            norm_type=cfg.normalizer)


def _monash(cfg: Config, flag: str, *, bin_edges=None, **_):
    from sie_tpu.data.monash import load_monash_dataset
    return load_monash_dataset(cfg.data_root, cfg.dataset, flag,
                               bin_edges=bin_edges)


def _forecast(kind: str):
    def load(cfg: Config, flag: str, **_):
        from sie_tpu.data.forecast import load_forecast_csv
        path = os.path.join(cfg.data_root, f"{cfg.dataset}.csv")
        return load_forecast_csv(
            path, flag, size=(cfg.seq_len, cfg.label_len, cfg.pred_len),
            features=cfg.features, target=cfg.target,
            freq=cfg.freq, dataset_kind=kind)
    return load


def _m4(cfg: Config, flag: str, **_):
    from sie_tpu.data.forecast import load_m4
    from sie_tpu.data.m4 import M4Meta
    # --seasonal_patterns picks the M4 subset (reference run.py:134); its
    # horizon overrides pred_len like the reference's M4Meta lookup. The flag
    # routes train (holdout within the training series) vs test (held-out
    # horizons from the -test.csv / npz cache) — reference Dataset_M4.
    name = cfg.seasonal_patterns
    pred = M4Meta.horizons_map.get(name, cfg.pred_len)
    return load_m4(cfg.data_root, name, cfg.seq_len, pred, flag)


def _anomaly(name: str):
    def load(cfg: Config, flag: str, **_):
        from sie_tpu.data.anomaly import load_segments
        return load_segments(cfg.data_root, name, flag, win_size=cfg.seq_len)
    return load


# reference data_factory/data_factory.py:10-26
DATA_REGISTRY: Dict[str, Callable] = {
    "ETTh1": _forecast("ETTh"),
    "ETTh2": _forecast("ETTh"),
    "ETTm1": _forecast("ETTm"),
    "ETTm2": _forecast("ETTm"),
    "custom": _forecast("custom"),
    "m4": _m4,
    "PSM": _anomaly("PSM"),
    "MSL": _anomaly("MSL"),
    "SMAP": _anomaly("SMAP"),
    "SMD": _anomaly("SMD"),
    "SWAT": _anomaly("SWAT"),
    "UEA": _uea,
    "Monash": _monash,
    "EEG": _eeg(three_class=False),
    "EEG3": _eeg(three_class=True),
}


def _stream_path(cfg: Config, flag: str, loso_test_subject) -> str:
    """Memmap stream-cache dir for a split. Keyed by the config fields that
    shape the split's content (the convention the EEG npz cache uses — a
    changed source tree under an unchanged config must clear cache_dir, as
    there). Regression bin_edges need no key: they are fit on the train
    split, itself a deterministic function of these fields."""
    import hashlib

    tag = hashlib.md5(repr(
        (cfg.data, cfg.dataset, cfg.data_root, cfg.json_path, flag,
         loso_test_subject, cfg.test_size, cfg.val_size, cfg.seed,
         cfg.max_files, tuple(cfg.subject_ids), cfg.subject_id,
         cfg.max_subjects, cfg.target_channels, cfg.target_timepoints,
         cfg.original_fs, cfg.target_fs, cfg.task_type,
         cfg.normalizer)).encode()).hexdigest()[:12]
    return os.path.join(cfg.cache_dir, f"stream_{cfg.data}_{flag}_{tag}")


def data_provider(cfg: Config, flag: str,
                  bin_edges: Optional[np.ndarray] = None,
                  loso_test_subject: Optional[int] = None):
    """Returns (dataset, batcher). Classification/regression entries yield
    (ArrayDataset, Batcher); forecast/anomaly entries yield their
    window/segment dataset with an IndexedBatcher."""
    flag = flag.lower()
    if cfg.data not in DATA_REGISTRY:
        raise ValueError(f"unknown data {cfg.data!r} "
                         f"(known: {sorted(DATA_REGISTRY)})")
    if cfg.stream_from_disk:
        # cache-first: a warm stream cache must be opened WITHOUT running
        # the registry loader (whose in-RAM materialization is exactly what
        # an archive larger than host memory cannot afford)
        from sie_tpu.data import stream
        path = _stream_path(cfg, flag, loso_test_subject)
        if os.path.exists(os.path.join(path, stream.META_NAME)):
            ds = stream.open_memmap_dataset(path)
        else:
            ds = DATA_REGISTRY[cfg.data](cfg, flag, bin_edges=bin_edges,
                                         loso_test_subject=loso_test_subject)
            if isinstance(ds, ArrayDataset):
                stream.save_memmap_dataset(path, ds)
                ds = stream.open_memmap_dataset(path)
            # non-ArrayDataset families (forecast windows / anomaly
            # segments) keep their own loaders — flag is a no-op there
    else:
        ds = DATA_REGISTRY[cfg.data](cfg, flag, bin_edges=bin_edges,
                                     loso_test_subject=loso_test_subject)

    shuffle = flag == "train"
    if isinstance(ds, ArrayDataset):
        batcher = Batcher(ds, cfg.batch_size, shuffle=shuffle,
                          seed=max(cfg.seed, 0), drop_last=False)
    else:
        batcher = IndexedBatcher(ds, cfg.batch_size, shuffle=shuffle,
                                 seed=max(cfg.seed, 0))
    return ds, batcher
