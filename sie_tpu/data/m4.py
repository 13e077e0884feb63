"""M4 competition dataset infrastructure (reference data_factory/m4.py:1-138).

The reference downloads M4-info.csv + train/test npz caches from the N-BEATS
release and loads them. This container has no network egress, so the download
step is replaced by `build_m4_cache` (converts the standard M4 per-group CSVs
into the same cache layout) plus the same `M4Dataset.load(training, dir)`
cache reader. `M4Meta` carries the competition constants (seasonal patterns,
horizons, frequencies, interpretable-history sizes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class M4Meta:
    seasonal_patterns = ("Yearly", "Quarterly", "Monthly", "Weekly",
                         "Daily", "Hourly")
    horizons = (6, 8, 18, 13, 14, 48)
    frequencies = (1, 4, 12, 1, 1, 24)
    horizons_map = {"Yearly": 6, "Quarterly": 8, "Monthly": 18,
                    "Weekly": 13, "Daily": 14, "Hourly": 48}
    frequency_map = {"Yearly": 1, "Quarterly": 4, "Monthly": 12,
                     "Weekly": 1, "Daily": 1, "Hourly": 24}
    # input-window multiplier per group (N-BEATS interpretable config)
    history_size = {"Yearly": 1.5, "Quarterly": 1.5, "Monthly": 1.5,
                    "Weekly": 10, "Daily": 10, "Hourly": 10}


@dataclass
class M4Dataset:
    ids: np.ndarray          # series ids, e.g. 'Y1'
    groups: np.ndarray       # seasonal pattern per series
    frequencies: np.ndarray  # seasonal frequency per series
    horizons: np.ndarray     # forecast horizon per series
    values: np.ndarray       # object array of 1-D float arrays

    @staticmethod
    def load(training: bool = True, dataset_file: str = "./dataset/m4"
             ) -> "M4Dataset":
        """Load the cached dataset (M4-info.csv + training.npz/test.npz —
        same layout the reference caches after download)."""
        import pandas as pd
        info = pd.read_csv(os.path.join(dataset_file, "M4-info.csv"))
        cache = os.path.join(dataset_file,
                             "training.npz" if training else "test.npz")
        values = np.load(cache, allow_pickle=True)
        if hasattr(values, "files"):  # npz archive vs bare object array
            values = values[values.files[0]]
        return M4Dataset(ids=info.M4id.values, groups=info.SP.values,
                         frequencies=info.Frequency.values,
                         horizons=info.Horizon.values, values=values)


def build_m4_cache(csv_by_group: dict, out_dir: str) -> None:
    """Convert M4-format CSVs into the cache layout `M4Dataset.load` reads.

    csv_by_group: {'Yearly': (train_csv_path, test_csv_path), ...} where each
    CSV has the series id in the first column and the (ragged) values in the
    remaining columns. Replaces the reference's network download
    (data_factory/m4.py:44-70) — this container has no egress.
    """
    import pandas as pd
    from sie_tpu.data.forecast import read_m4_rows
    ids, groups, freqs, hors = [], [], [], []
    train_vals, test_vals = [], []
    meta = M4Meta()
    for group, (train_csv, test_csv) in csv_by_group.items():
        # pair train/test rows BY ID, not positionally — read_m4_rows drops
        # empty rows, and one dropped row would shift every later pair
        te_by_id = dict(read_m4_rows(test_csv, np.float64))
        for tid, tr_vals in read_m4_rows(train_csv, np.float64):
            te_vals = te_by_id.get(tid)
            if te_vals is None:
                raise ValueError(f"series {tid!r} present in {train_csv} "
                                 f"but missing/empty in {test_csv}")
            ids.append(tid)
            groups.append(group)
            freqs.append(meta.frequency_map[group])
            hors.append(meta.horizons_map[group])
            train_vals.append(tr_vals)
            test_vals.append(te_vals)
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame({"M4id": ids, "SP": groups, "Frequency": freqs,
                  "Horizon": hors}).to_csv(
        os.path.join(out_dir, "M4-info.csv"), index=False)

    def ragged(vals):
        arr = np.empty(len(vals), dtype=object)
        for i, v in enumerate(vals):
            arr[i] = v
        return arr

    np.savez_compressed(os.path.join(out_dir, "training.npz"),
                        values=ragged(train_vals))
    np.savez_compressed(os.path.join(out_dir, "test.npz"),
                        values=ragged(test_vals))
