"""Vectorized multi-seed experiment driver over EnsembleTrainer.

Runs the reference's primary workflow — N seeds of one configuration
(reference run.py:564-625) — as ONE vmapped training program
(train/ensemble.py) instead of N sequential runs: per-seed shuffles,
per-seed early stopping (alive mask), per-seed best-params tracking, and a
final vectorized test pass. For the dispatch-bound small backbones of the
UEA sweep this approaches 1x wall time for all seeds together.

`scripts/uea_ensemble_sweep.py` wraps this over dataset lists; the
sequential `run.py` path stays the default because its skip-train-if-
checkpoint / per-seed artifact layout is inherently per-seed.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np

from sie_tpu.config import DEFAULT_SEEDS, Config
from sie_tpu.data.loader import Batcher
from sie_tpu.data.provider import data_provider
from sie_tpu.train.ensemble import EnsembleTrainer, stack_seed_batches
from sie_tpu.train.trainer import compute_beta


def _eval_accuracy(et: EnsembleTrainer, states, ds, batch_size: int,
                   gating_value=None) -> np.ndarray:
    """Weighted accuracy per seed over a whole split: (N,) in [0, 1]."""
    loader = Batcher(ds, batch_size, shuffle=False)
    correct = np.zeros((et.n,), np.float64)
    total = 0.0
    for x, y, mask, w in loader.epoch(0):
        logits, _ = et.eval_step(states, (x, y, mask, w),
                                 gating_value=gating_value)
        pred = np.argmax(np.asarray(logits), -1)        # (N, B)
        correct += ((pred == y[None]) * w[None]).sum(axis=1)
        total += w.sum()
    return (correct / max(total, 1.0)).astype(np.float64)


def run_ensemble_experiment(cfg: Config,
                            seeds: Sequence[int] = DEFAULT_SEEDS,
                            verbose: bool = True) -> List[Dict]:
    """Train/validate/test all seeds vectorized. Returns one dict per seed:
    {seed, accuracy, val_accuracy, epoch_stop}."""
    train_data, _ = data_provider(cfg, "train")
    val_data, _ = data_provider(cfg, "val")
    test_data, _ = data_provider(cfg, "test")
    cfg = cfg.replace(seq_len=train_data.seq_len, enc_in=train_data.enc_in,
                      num_class=train_data.num_class, pred_len=0,
                      label_len=0)
    seeds = tuple(int(s) for s in seeds)
    n = len(seeds)
    loaders = [Batcher(train_data, cfg.batch_size, shuffle=True, seed=s)
               for s in seeds]
    steps_per_epoch = max(len(loaders[0]), 1)
    et = EnsembleTrainer(cfg, steps_per_epoch, seeds)

    sample = next(iter(loaders[0].epoch(0)))
    states = et.init_states(sample)
    x_all = np.asarray(train_data.x, np.float32)
    y_all = np.asarray(train_data.y)
    m_all = np.asarray(train_data.padding_mask, np.float32)

    # per-seed EarlyStopping instances — the SAME class the sequential
    # Experiment uses (utils/tools.py), so tie/patience semantics (a tie
    # resets the counter and re-snapshots) match run.py exactly
    from sie_tpu.utils.tools import EarlyStopping
    earlies = [EarlyStopping(patience=cfg.patience) for _ in seeds]
    alive = np.ones((n,), np.float32)
    best_val = np.full((n,), -np.inf)
    last_val = np.full((n,), np.nan)   # NaN = no validation epoch ever ran
    epoch_stop = np.zeros((n,), np.int64)
    best_params = [None] * n
    best_stats = [None] * n

    def _snapshot(i):
        # one host round trip per tree (not per leaf): index on device,
        # fetch the sliced tree in a single device_get
        best_params[i] = jax.device_get(
            jax.tree.map(lambda a: a[i], states.params))
        best_stats[i] = jax.device_get(
            jax.tree.map(lambda a: a[i], states.batch_stats))

    for epoch in range(cfg.train_epochs):
        beta = compute_beta(epoch, cfg.train_epochs, cfg.beta_schedule)
        schedules = [list(ld.epoch_indices(epoch)) for ld in loaders]
        losses = []
        for k in range(steps_per_epoch):
            batches = stack_seed_batches(
                [schedules[i][k] for i in range(n)], x_all, y_all, m_all)
            states, loss, _ = et.train_step(states, batches, beta,
                                            alive=alive)
            losses.append(loss)   # device arrays; fetched only when logging
        val_acc = _eval_accuracy(et, states, val_data, cfg.batch_size)
        last_val = val_acc
        if verbose and (epoch + 1) % cfg.log_interval == 0:
            tl = np.stack(jax.device_get(losses)).mean(axis=0)
            print(f"Epoch {epoch + 1}/{cfg.train_epochs} | "
                  f"alive {int(alive.sum())}/{n} | "
                  f"train {np.round(tl, 4).tolist()} | "
                  f"val acc {np.round(val_acc, 4).tolist()}", flush=True)
        if epoch >= cfg.min_epochs:
            for i in range(n):
                if alive[i] == 0.0:
                    continue
                if earlies[i](-val_acc[i]):
                    best_val[i] = val_acc[i]
                    _snapshot(i)
                if earlies[i].early_stop:
                    alive[i] = 0.0
                    epoch_stop[i] = epoch
        epoch_stop[alive > 0] = epoch
        if not alive.any():
            if verbose:
                print(f"all seeds early-stopped by epoch {epoch + 1}",
                      flush=True)
            break

    # seeds that never improved past min_epochs: use final state
    for i in range(n):
        if best_params[i] is None:
            _snapshot(i)

    # one vectorized test pass over the stacked per-seed best params,
    # with the reference's test-time gating semantics (gating only at test)
    stacked_p = jax.tree.map(lambda *ls: np.stack(ls), *best_params)
    stacked_s = jax.tree.map(lambda *ls: np.stack(ls), *best_stats)
    states = states.replace(params=stacked_p, batch_stats=stacked_s)
    test_acc = _eval_accuracy(et, states, test_data, cfg.batch_size,
                              gating_value=cfg.gating_value)

    # seeds that never registered an improvement report their LAST val
    # accuracy — never the test metric (no test leakage into a val field)
    return [{"seed": seeds[i],
             "accuracy": 100.0 * float(test_acc[i]),
             "val_accuracy": 100.0 * float(best_val[i])
             if np.isfinite(best_val[i]) else 100.0 * float(last_val[i]),
             "epoch_stop": int(epoch_stop[i])}
            for i in range(n)]
