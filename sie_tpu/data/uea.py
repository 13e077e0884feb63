"""UEA multivariate classification archive loader.

Replaces the reference UEAloader (`data_factory/data_loader.py:600-719`) with a
dense-array pipeline. Intended semantics implemented (and reference bugs fixed,
see SURVEY.md SS2.5):

- flag 'train' reads `{dataset}_TRAIN.ts`; 'val' and 'test' both read
  `{dataset}_TEST.ts` (the reference's lowercased-flag regex never matches and
  there are no VAL files; the regression experiment's val==test is the intended
  behavior).
- labels -> class codes via the sorted unique label strings (pandas categorical
  semantics, data_loader.py:671-674);
- whole-file standardization per dimension (pandas ddof-1 std + float64 eps,
  uea.py:85-89), computed per file like the reference;
- EthanolConcentration keeps the reference's special instance-norm quirk
  (data_loader.py:704-712: mean over time but var over *channels*).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from sie_tpu.data.loader import ArrayDataset, lengths_to_mask, normalize_array
from sie_tpu.data.ts_parser import parse_ts_file, to_dense


def _find_ts(root_path: str, dataset: str, split: str) -> str:
    cands = [
        os.path.join(root_path, dataset, f"{dataset}_{split}.ts"),
        os.path.join(root_path, f"{dataset}_{split}.ts"),
    ]
    for c in cands:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"no {split} .ts file for dataset {dataset!r} under {root_path!r} "
        f"(tried {cands})")


def ethanol_instance_norm(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reference data_loader.py:704-712 quirk: subtract the per-channel mean
    over time, divide by the per-timestep std over channels (unbiased=False)."""
    out = x.copy()
    for i in range(len(x)):
        case = x[i, : lengths[i]]
        mean = case.mean(axis=0, keepdims=True)
        cen = case - mean
        std = np.sqrt(cen.var(axis=1, keepdims=True) + 1e-5)
        out[i, : lengths[i]] = cen / std
    return out


def load_uea_dataset(root_path: str, dataset: str, flag: str,
                     norm_type: str = "standardization") -> ArrayDataset:
    split = "TRAIN" if flag.lower() == "train" else "TEST"
    ts = parse_ts_file(_find_ts(root_path, dataset, split))
    x, lengths, max_len = to_dense(ts)

    # label ids from the @classLabel declaration (sorted, so the mapping
    # equals the reference's pd.Categorical codes whenever every class is
    # present) — deriving them from the labels PRESENT in each file, as the
    # reference does, silently permutes test ids when a class is missing
    # from one split
    declared = getattr(ts, "class_labels", None)
    classes = (tuple(sorted(declared)) if declared
               else tuple(sorted(set(ts.labels))))
    cls_index = {c: i for i, c in enumerate(classes)}
    y = np.array([cls_index[l] for l in ts.labels], np.int32)

    x = normalize_array(x, lengths, norm_type)
    if "EthanolConcentration" in dataset:
        x = ethanol_instance_norm(x, lengths)

    return ArrayDataset(
        x=x, y=y, padding_mask=lengths_to_mask(lengths, x.shape[1]),
        max_seq_len=max_len, enc_in=x.shape[2], num_class=len(classes),
        class_names=classes)


UEA_30_DATASETS: Tuple[str, ...] = (
    # reference run_uea.sh:14-45
    "ArticularyWordRecognition", "AtrialFibrillation", "BasicMotions",
    "CharacterTrajectories", "Cricket", "DuckDuckGeese", "EigenWorms",
    "Epilepsy", "ERing", "EthanolConcentration", "FaceDetection",
    "FingerMovements", "HandMovementDirection", "Handwriting", "Heartbeat",
    "InsectWingbeat", "JapaneseVowels", "Libras", "LSST", "MotorImagery",
    "NATOPS", "PEMS-SF", "PenDigits", "PhonemeSpectra", "RacketSports",
    "SelfRegulationSCP1", "SelfRegulationSCP2", "SpokenArabicDigits",
    "StandWalkJump", "UWaveGestureLibrary",
)

# Published archive metadata (dims, series length, classes) per dataset —
# from the UEA multivariate archive paper (Bagnall et al. 2018) / timeseries
# classification.com tables. Variable-length sets (CharacterTrajectories,
# JapaneseVowels, SpokenArabicDigits, InsectWingbeat) list the max length the
# collate pads to. Used by the shape-coverage sweep
# (scripts/uea_shape_sweep.py) to certify every archive shape compiles.
UEA_DATASET_SHAPES = {
    "ArticularyWordRecognition": (9, 144, 25),
    "AtrialFibrillation": (2, 640, 3),
    "BasicMotions": (6, 100, 4),
    "CharacterTrajectories": (3, 182, 20),
    "Cricket": (6, 1197, 12),
    "DuckDuckGeese": (1345, 270, 5),
    "EigenWorms": (6, 17984, 5),
    "Epilepsy": (3, 206, 4),
    "ERing": (4, 65, 6),
    "EthanolConcentration": (3, 1751, 4),
    "FaceDetection": (144, 62, 2),
    "FingerMovements": (28, 50, 2),
    "HandMovementDirection": (10, 400, 4),
    "Handwriting": (3, 152, 26),
    "Heartbeat": (61, 405, 2),
    "InsectWingbeat": (200, 30, 10),
    "JapaneseVowels": (12, 29, 9),
    "Libras": (2, 45, 15),
    "LSST": (6, 36, 14),
    "MotorImagery": (64, 3000, 2),
    "NATOPS": (24, 51, 6),
    "PEMS-SF": (963, 144, 7),
    "PenDigits": (2, 8, 10),
    "PhonemeSpectra": (11, 217, 39),
    "RacketSports": (6, 30, 4),
    "SelfRegulationSCP1": (6, 896, 2),
    "SelfRegulationSCP2": (7, 1152, 2),
    "SpokenArabicDigits": (13, 93, 10),
    "StandWalkJump": (4, 2500, 3),
    "UWaveGestureLibrary": (3, 315, 8),
}
