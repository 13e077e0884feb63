"""Convergence-parity harness: train the reference-faithful torch IGN
(`sie_tpu.parity.torch_reference`) and the sie_tpu implementation on IDENTICAL
data with IDENTICAL batch schedules, and compare converged test accuracy.

This is the end-to-end analogue of BASELINE.md's ±0.5-pt CHISCO target that is
actually checkable in this container (no CHISCO data / GPU here): op-level
parity (tests/test_torch_parity.py) x training-semantics parity (this module)
on class-separable synthetic sets. Both sides run f32 (amp off): the autocast
policy is already covered by the op/step-level parity tests, and torch-CPU
bf16 autocast does not reproduce GPU autocast behavior anyway.

Seeds intentionally differ in effect between frameworks (torch and JAX PRNGs
initialize different weights from the same integer), so the comparison is
converged-accuracy over multiple seeds, not loss-curve equality.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from sie_tpu.config import Config


def make_parity_splits(kind: str = "eeg3", seed: int = 0,
                       n_per_split: Tuple[int, int, int] = (192, 64, 64),
                       noise: float = 0.4,
                       ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Class-separable synthetic multivariate series, standardized like the
    UEA whole-set Normalizer. kind='eeg3': 3 classes, C=12, T=120 (a scaled
    CHISCO shape); kind='uea': 4 classes, C=6, T=100 (a BasicMotions shape);
    kind='eeg39': 39 classes, C=16, T=160 (the full CHISCO class count at a
    CPU-tractable scale — the r4 cert's failing regime, VERDICT r4 item 1).
    Raising `noise` (sigma of the additive noise vs unit-amplitude sources)
    pushes accuracy off the 100% ceiling so deltas stay informative in the
    non-saturated regime too."""
    if kind == "eeg3":
        n_class, c, t = 3, 12, 120
    elif kind == "uea":
        n_class, c, t = 4, 6, 100
    elif kind == "eeg39":
        n_class, c, t = 39, 16, 160
    else:
        raise ValueError(kind)
    # str hash() is salted per-process; a fixed tag keeps the data reproducible
    rng = np.random.default_rng((seed, {"eeg3": 3, "uea": 4,
                                        "eeg39": 39}[kind]))
    mix = rng.normal(0, 1, (n_class, 3, c))
    freqs = rng.uniform(0.02, 0.3, (n_class, 3))
    tt = np.arange(t)

    def gen(n):
        y = rng.integers(0, n_class, n)
        x = np.zeros((n, t, c), np.float32)
        for i in range(n):
            k = y[i]
            ph = rng.uniform(0, 2 * np.pi, 3)
            src = np.sin(2 * np.pi * freqs[k][:, None] * tt[None] + ph[:, None])
            x[i] = (mix[k].T @ src).T + rng.normal(0, noise, (t, c))
        return x.astype(np.float32), y.astype(np.int64)

    splits = {name: gen(n) for name, n in zip(("train", "val", "test"),
                                              n_per_split)}
    mu = splits["train"][0].mean(axis=(0, 1), keepdims=True)
    sd = splits["train"][0].std(axis=(0, 1), keepdims=True) + 1e-8
    return {k: (((x - mu) / sd).astype(np.float32), y)
            for k, (x, y) in splits.items()}


def make_batch_schedule(n_train: int, batch_size: int, epochs: int,
                        seed: int) -> List[List[np.ndarray]]:
    """Shared per-epoch batch index schedule (full batches only) so both
    frameworks consume the same sample orderings."""
    sched = []
    for epoch in range(epochs):
        rng = np.random.default_rng((seed, epoch, 7))
        order = rng.permutation(n_train)
        nb = n_train // batch_size
        sched.append([order[i * batch_size:(i + 1) * batch_size]
                      for i in range(nb)])
    return sched


def train_sie_tpu(cfg: Config, splits, batch_schedule,
                  verbose: bool = False) -> Dict[str, float]:
    """Trains the sie_tpu model with the production Trainer under the
    reference's epoch semantics (Experiment.train, exp:295-378): beta schedule,
    early stop on negative val accuracy, best-checkpoint restore."""
    import jax
    from sie_tpu.train.trainer import Trainer, compute_beta

    xtr, ytr = splits["train"]
    trainer = Trainer(cfg, steps_per_epoch=len(batch_schedule[0]))
    mk = lambda idx: (xtr[idx], ytr[idx].astype(np.int32),
                      np.ones((len(idx), xtr.shape[1]), np.float32),
                      np.ones((len(idx),), np.float32))
    state = trainer.init_state(mk(batch_schedule[0][0]), seed=cfg.seed)

    def evaluate(state, x, y):
        losses, correct = [], 0
        b = cfg.batch_size
        for i in range(0, len(x), b):
            xb, yb = x[i:i + b], y[i:i + b]
            if len(xb) < b:                      # pad to the compiled shape
                pad = b - len(xb)
                xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:],
                                                  xb.dtype)])
                yb = np.concatenate([yb, np.zeros((pad,), yb.dtype)])
            batch = (xb, yb.astype(np.int32),
                     np.ones((b, xb.shape[1]), np.float32),
                     np.ones((b,), np.float32))
            logits, _info = trainer.eval_step(state, batch)
            logits = np.asarray(jax.device_get(logits))[:len(x[i:i + b])]
            correct += int((logits.argmax(-1) == y[i:i + b]).sum())
        return correct / max(len(x), 1)

    best_acc, best_params, patience_left = -1.0, None, cfg.patience
    epoch_stop = 0
    for epoch in range(cfg.train_epochs):
        beta = compute_beta(epoch, cfg.train_epochs, cfg.beta_schedule)
        for idx in batch_schedule[epoch % len(batch_schedule)]:
            state, loss, _ = trainer.train_step(state, mk(idx), beta)
        val_acc = evaluate(state, *splits["val"])
        if verbose and (epoch + 1) % cfg.log_interval == 0:
            print(f"[sie_tpu] epoch {epoch + 1} val_acc {val_acc:.4f}")
        if epoch >= cfg.min_epochs:
            if val_acc > best_acc:
                best_acc = val_acc
                best_params = (jax.device_get(state.params),
                               jax.device_get(state.batch_stats))
                patience_left = cfg.patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    epoch_stop = epoch
                    break
        epoch_stop = epoch
    if best_params is not None:
        state = state.replace(params=jax.device_put(best_params[0]),
                              batch_stats=jax.device_put(best_params[1]))
    test_acc = evaluate(state, *splits["test"])
    return {"test_accuracy": 100.0 * test_acc,
            "val_accuracy": 100.0 * max(best_acc, 0.0),
            "epoch_stop": epoch_stop}


def make_regression_splits(seed: int = 0,
                           n_per_split: Tuple[int, int] = (192, 64),
                           noise: float = 0.4, nbins: int = 10):
    """Learnable synthetic extrinsic-regression data (Monash-shaped): the
    float target is an affine function of the dominant source amplitude, so a
    CRPS-trained binned classifier can localize it. Returns
    ({'train'/'val'/'test': (x, y_float)}, bin_edges) with val == test
    (reference exp_regression:86-88) and bin edges computed like the
    Monashloader (linspace over TRAIN targets, nbins values ending at +inf,
    data_loader.py:798-810)."""
    c, t = 6, 100
    rng = np.random.default_rng((seed, 11))
    mix = rng.normal(0, 1, (3, c))
    freqs = rng.uniform(0.02, 0.3, 3)
    tt = np.arange(t)

    def gen(n):
        amp = rng.uniform(1.0, 9.0, n)
        x = np.zeros((n, t, c), np.float32)
        for i in range(n):
            ph = rng.uniform(0, 2 * np.pi, 3)
            scale = np.array([amp[i], 1.0, 1.0])
            src = scale[:, None] * np.sin(
                2 * np.pi * freqs[:, None] * tt[None] + ph[:, None])
            x[i] = (mix.T @ src).T + rng.normal(0, noise, (t, c))
        return x.astype(np.float32), amp.astype(np.float32)

    xtr, ytr = gen(n_per_split[0])
    xte, yte = gen(n_per_split[1])
    mu = xtr.mean(axis=(0, 1), keepdims=True)
    sd = xtr.std(axis=(0, 1), keepdims=True) + 1e-8
    xtr, xte = (xtr - mu) / sd, (xte - mu) / sd
    edges = np.linspace(ytr.min(), ytr.max(), nbins + 1)
    edges[-1] = np.inf
    bin_edges = edges[1:].astype(np.float32)
    splits = {"train": (xtr, ytr), "val": (xte, yte), "test": (xte, yte)}
    return splits, bin_edges


def train_sie_tpu_regression(cfg: Config, splits, bin_edges,
                             batch_schedule, verbose: bool = False):
    """sie_tpu regression training under the reference's epoch semantics
    (RegressionExperiment.train): CRPS head with truncate_targets=True to
    match the reference's `label.long()` quirk, early stop on val loss,
    best-state restore, val == test."""
    import jax
    import jax.numpy as jnp
    from sie_tpu.train.regression import make_crps_head
    from sie_tpu.train.trainer import Trainer, compute_beta

    xtr, ytr = splits["train"]
    head = make_crps_head(bin_edges, truncate_targets=True)
    trainer = Trainer(cfg, steps_per_epoch=len(batch_schedule[0]),
                      loss_head=head)
    mk = lambda idx: (xtr[idx], ytr[idx].astype(np.float32),
                      np.ones((len(idx), xtr.shape[1]), np.float32),
                      np.ones((len(idx),), np.float32))
    state = trainer.init_state(mk(batch_schedule[0][0]), seed=cfg.seed)

    def evaluate(state, x, y):
        losses = []
        b = cfg.batch_size
        for i in range(0, len(x), b):
            xb, yb = x[i:i + b], y[i:i + b]
            batch = (xb, yb.astype(np.float32),
                     np.ones((len(xb), xb.shape[1]), np.float32),
                     np.ones((len(xb),), np.float32))
            logits, info = trainer.eval_step(state, batch)
            loss = float(jax.device_get(
                head(logits, jnp.asarray(batch[1]), jnp.asarray(batch[3]))))
            if info.loss is not None:
                loss += float(jax.device_get(info.loss).mean())
            losses.append(loss)
        return float(np.mean(losses))

    best_loss, best_state_h, patience_left = float("inf"), None, cfg.patience
    epoch_stop = 0
    for epoch in range(cfg.train_epochs):
        beta = compute_beta(epoch, cfg.train_epochs, cfg.beta_schedule)
        for idx in batch_schedule[epoch % len(batch_schedule)]:
            state, _loss, _ = trainer.train_step(state, mk(idx), beta)
        val_loss = evaluate(state, *splits["val"])
        if verbose and (epoch + 1) % cfg.log_interval == 0:
            print(f"[sie_tpu] epoch {epoch + 1} val_crps {val_loss:.4f}")
        if epoch >= cfg.min_epochs:
            if val_loss < best_loss:
                best_loss = val_loss
                best_state_h = (jax.device_get(state.params),
                                jax.device_get(state.batch_stats))
                patience_left = cfg.patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    epoch_stop = epoch
                    break
        epoch_stop = epoch
    if best_state_h is not None:
        state = state.replace(params=jax.device_put(best_state_h[0]),
                              batch_stats=jax.device_put(best_state_h[1]))
    test_loss = evaluate(state, *splits["test"])

    # same secondary bin-accuracy metric as the torch side
    edges = np.asarray(bin_edges, np.float32)
    hits, n = 0, 0
    x, y = splits["test"]
    for i in range(0, len(x), cfg.batch_size):
        xb, yb = x[i:i + cfg.batch_size], y[i:i + cfg.batch_size]
        batch = (xb, yb.astype(np.float32),
                 np.ones((len(xb), xb.shape[1]), np.float32),
                 np.ones((len(xb),), np.float32))
        logits, _ = trainer.eval_step(state, batch)
        pred_bin = np.asarray(jax.device_get(logits)).argmax(-1)
        true_bin = np.searchsorted(edges[:-1],
                                   yb.astype(np.int64).astype(np.float32),
                                   side="left")
        hits += int((pred_bin == true_bin).sum())
        n += len(pred_bin)
    return {"test_loss": test_loss, "val_loss": best_loss,
            "bin_accuracy": 100.0 * hits / max(n, 1),
            "epoch_stop": epoch_stop}


def run_regression_parity(model: str, dnn_type: str = "FCN",
                          seeds=(0, 1, 2), epochs: int = 40,
                          batch_size: int = 16,
                          overrides: Optional[dict] = None,
                          noise: float = 0.4, verbose: bool = False,
                          torch_cache: Optional[Dict[int, dict]] = None
                          ) -> Dict:
    """CRPS-training A/B on identical synthetic regression data (VERDICT r3
    item 1, matching exp/experiment_regression.py:59-207). torch_cache: see
    run_parity."""
    splits, bin_edges = make_regression_splits(seed=0, noise=noise)
    t, c = splits["train"][0].shape[1:]
    results = {"torch": [], "sie_tpu": []}
    for seed in seeds:
        kw = dict(data="Monash", dataset="parity-reg", model=model,
                  dnn_type=dnn_type, seq_len=t, enc_in=c,
                  num_class=len(bin_edges), num_shapelet=4,
                  batch_size=batch_size, train_epochs=epochs,
                  patience=max(8, epochs // 4), lr=5e-3, amp=False,
                  dropout=0.0, d_model=64, d_ff=128, n_heads=4, e_layers=2,
                  use_pallas=False, seed=seed, log_interval=1000,
                  task_name="regression")
        kw.update(overrides or {})
        cfg = Config(**kw)
        sched = make_batch_schedule(len(splits["train"][0]), cfg.batch_size,
                                    cfg.train_epochs, seed)
        rt = (torch_cache or {}).get(seed)
        if rt is None:
            from sie_tpu.parity.torch_reference import train_torch_regression
            rt = train_torch_regression(cfg, splits, bin_edges, sched,
                                        verbose=verbose)
        rj = train_sie_tpu_regression(cfg, splits, bin_edges, sched,
                                      verbose=verbose)
        results["torch"].append(rt)
        results["sie_tpu"].append(rj)
        if verbose:
            print(f"[seed {seed}] torch crps {rt['test_loss']:.4f} "
                  f"acc {rt['bin_accuracy']:.1f}% | sie_tpu crps "
                  f"{rj['test_loss']:.4f} acc {rj['bin_accuracy']:.1f}%")
    crps_t = [r["test_loss"] for r in results["torch"]]
    crps_j = [r["test_loss"] for r in results["sie_tpu"]]
    acc_t = [r["bin_accuracy"] for r in results["torch"]]
    acc_j = [r["bin_accuracy"] for r in results["sie_tpu"]]
    return {"model": model, "dnn_type": dnn_type, "kind": "regression",
            "noise": noise, "seeds": list(seeds),
            "torch_acc": acc_t, "sie_tpu_acc": acc_j,
            "torch_mean": float(np.mean(acc_t)),
            "sie_tpu_mean": float(np.mean(acc_j)),
            "delta_pts": float(np.mean(acc_j) - np.mean(acc_t)),
            "torch_crps": float(np.mean(crps_t)),
            "sie_tpu_crps": float(np.mean(crps_j)),
            "per_seed": results}


def run_parity(model: str, dnn_type: str = "FCN", kind: str = "eeg3",
               seeds=(0, 1, 2), epochs: int = 40, batch_size: int = 16,
               overrides: Optional[dict] = None, noise: float = 0.4,
               n_per_split: Optional[Tuple[int, int, int]] = None,
               verbose: bool = False,
               torch_cache: Optional[Dict[int, dict]] = None) -> Dict:
    """A/B one model config across seeds. Returns per-seed accuracies and the
    mean delta (sie_tpu - torch, percentage points).

    torch_cache: {seed: prior torch per-seed result} from an earlier run at
    the SAME (kind, noise, epochs, batch_size, overrides) — the torch side is
    deterministic in those, so a JAX-side-only change (e.g. init parity) can
    reuse it instead of retraining the slow unfold-distance twin."""
    splits = make_parity_splits(kind, seed=0, noise=noise,
                                **({"n_per_split": n_per_split}
                                   if n_per_split else {}))
    n_class = int(splits["train"][1].max()) + 1
    t, c = splits["train"][0].shape[1:]
    results = {"torch": [], "sie_tpu": []}
    for seed in seeds:
        kw = dict(data="UEA", dataset=f"parity-{kind}", model=model,
                  dnn_type=dnn_type, seq_len=t, enc_in=c, num_class=n_class,
                  num_shapelet=4, batch_size=batch_size, train_epochs=epochs,
                  patience=max(8, epochs // 4), lr=5e-3, amp=False,
                  dropout=0.0, d_model=64, d_ff=128, n_heads=4, e_layers=2,
                  use_pallas=False, seed=seed, log_interval=1000)
        kw.update(overrides or {})
        cfg = Config(**kw)
        sched = make_batch_schedule(len(splits["train"][0]), cfg.batch_size,
                                    cfg.train_epochs, seed)
        rt = (torch_cache or {}).get(seed)
        if rt is None:
            from sie_tpu.parity.torch_reference import train_torch_reference
            rt = train_torch_reference(cfg, splits, sched, verbose=verbose)
        rj = train_sie_tpu(cfg, splits, sched, verbose=verbose)
        results["torch"].append(rt)
        results["sie_tpu"].append(rj)
        if verbose:
            print(f"[seed {seed}] torch {rt['test_accuracy']:.2f}% "
                  f"sie_tpu {rj['test_accuracy']:.2f}%")
    acc_t = [r["test_accuracy"] for r in results["torch"]]
    acc_j = [r["test_accuracy"] for r in results["sie_tpu"]]
    head = (overrides or {}).get("sbm_cls")
    return {"model": model, "dnn_type": dnn_type, "kind": kind,
            "noise": noise, "seeds": list(seeds),
            "lr": (overrides or {}).get("lr", 5e-3),
            "sbm_cls": None if head in (None, "linear") else head,
            "torch_acc": acc_t, "sie_tpu_acc": acc_j,
            "torch_mean": float(np.mean(acc_t)),
            "sie_tpu_mean": float(np.mean(acc_j)),
            "delta_pts": float(np.mean(acc_j) - np.mean(acc_t)),
            "per_seed": results}
