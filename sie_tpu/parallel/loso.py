"""Leave-one-subject-out (LOSO) fold driver.

The reference collects per-trial subject ids but never uses them for splitting
(SURVEY.md SS6 'Split fidelity'; README.md:69 states LOSO as the intended
protocol). Here each fold holds one subject out as the test set; folds run
sequentially on a single host (each fold's training step itself is mesh-
parallel), or across hosts by giving each host a fold slice — fold index maps
onto the DCN axis in a multi-host deployment.
"""

from __future__ import annotations

from typing import List, Optional

from sie_tpu.config import Config


def run_loso(cfg: Config, n_subjects: Optional[int] = None, mesh=None,
             synthetic: Optional[bool] = None, verbose: bool = True,
             fold_slice: slice = slice(None)) -> List[dict]:
    """Train/test one experiment per held-out subject; returns per-fold metrics.

    `fold_slice` lets a multi-host launcher give each host a subset of folds.
    """
    from sie_tpu.data.eeg import load_eeg_dataset
    from sie_tpu.train.experiment import Experiment

    if n_subjects is None:
        probe = load_eeg_dataset(cfg, "train", three_class=(cfg.data == "EEG3"),
                                 synthetic=synthetic)
        n_subjects = int(probe.subject_ids.max()) + 1 if probe.subject_ids is not None else 1

    results = []
    for subject in range(n_subjects)[fold_slice]:
        fold_cfg = cfg.replace(
            checkpoint_dir=f"{cfg.checkpoint_dir}/loso-{subject}")
        exp = Experiment(fold_cfg, mesh=mesh, loso_test_subject=subject,
                         verbose=verbose)
        exp.train()
        _loss, metrics, _ = exp.test(save_csv=False)
        metrics = dict(metrics)
        metrics["held_out_subject"] = subject
        results.append(metrics)
        if verbose:
            print(f"[LOSO] subject {subject}: acc {metrics['accuracy']:.2f}%")
    return results
