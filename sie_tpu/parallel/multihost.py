"""Multi-host LOSO: `jax.distributed` bootstrap + per-host fold slicing.

The reference has zero distributed infrastructure (SURVEY.md SS2.7 — only
nn.DataParallel, exp:279-281). The TPU-native multi-host deployment for the
LOSO protocol is fold parallelism over DCN: every host (pod slice) trains a
disjoint contiguous slice of the leave-one-subject-out folds independently —
no gradient traffic crosses hosts; within a fold the train step is still
mesh-parallel over that host's chips. Fold metrics merge host-side (each
fold's result is a few floats).

Env-driven bootstrap (the standard GKE/TPU-VM launcher contract):
  SIE_TPU_COORDINATOR   host:port of process 0
  SIE_TPU_NUM_PROCESSES total process count
  SIE_TPU_PROCESS_ID    this process's id (0-based)
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

from sie_tpu.config import Config


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """`jax.distributed.initialize` wrapper. Args fall back to the
    SIE_TPU_COORDINATOR / SIE_TPU_NUM_PROCESSES / SIE_TPU_PROCESS_ID env vars;
    a no-op returning False when neither requests multi-process mode."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("SIE_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("SIE_TPU_NUM_PROCESSES", "1") or 1)
    if process_id is None:
        pid = os.environ.get("SIE_TPU_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or (num_processes or 1) <= 1:
        return False
    import jax
    global _INITIALIZED
    if _INITIALIZED:  # idempotent: run.py calls this once per seed
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _INITIALIZED = True
    return True


_INITIALIZED = False


def host_fold_slice(n_folds: int, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> slice:
    """Contiguous fold range for this host. The ranges over all hosts are
    disjoint and exhaustive; hosts with index < (n_folds % hosts) take one
    extra fold."""
    if process_index is None or process_count is None:
        import jax
        process_index = jax.process_index() if process_index is None else process_index
        process_count = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n_folds, max(process_count, 1))
    start = process_index * base + min(process_index, extra)
    stop = start + base + (1 if process_index < extra else 0)
    return slice(start, stop)


def run_loso_multihost(cfg: Config, n_subjects: int, mesh=None,
                       synthetic: Optional[bool] = None,
                       verbose: bool = True,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None,
                       ) -> Tuple[List[dict], slice]:
    """Train/test this host's slice of the LOSO folds. Returns
    (local fold metrics, the slice this host covered). Call
    `init_distributed()` first in a multi-process launch."""
    from sie_tpu.parallel.loso import run_loso
    sl = host_fold_slice(n_subjects, process_index, process_count)
    results = run_loso(cfg, n_subjects=n_subjects, mesh=mesh,
                       synthetic=synthetic, verbose=verbose, fold_slice=sl)
    return results, sl
