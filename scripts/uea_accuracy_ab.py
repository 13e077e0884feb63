#!/usr/bin/env python
"""Per-dataset UEA accuracy A/B on learnable synthetics (VERDICT r3 item 8).

Extends the shape sweep (scripts/uea_shape_sweep.py, 1-epoch smoke) to
TRAINED accuracy vs the reference-faithful torch twin: for a representative
subset of UEA shapes — including the memory-flagged regimes run_uea.sh:14-45
calls out (PEMS-SF C=963, MotorImagery T=3000 = the stride-rule boundary,
EigenWorms T=17984 deep in the log2-stride regime) — generate class-separable
synthetic archives at the dataset's published (C, T, classes), train
InterpGN+FCN (the run_uea.sh default config) on IDENTICAL data and batch
schedules in both frameworks, and compare converged test accuracy.

Both sides run f32 on CPU (the certification is about TRAINING SEMANTICS,
not hardware): sie_tpu uses the scan fallback (use_pallas=False), whose
equality with the Pallas kernel is certified separately
(tests/test_pallas_kernel.py + the on-chip UEA sweep, docs/UEA_SWEEP_r03.md).

Writes docs/UEA_ACCURACY_AB.md + docs/uea_accuracy_ab.json.
Usage: python scripts/uea_accuracy_ab.py [--quick] [--only NAME]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # CPU A/B; relay-independent

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (seeds, n_train): the giant shapes get 1 seed / smaller sets to
# keep the torch side (unfold-broadcast distance) tractable on this host
SUBSET = {
    "BasicMotions": (2, 64),
    "SpokenArabicDigits": (2, 64),
    "Heartbeat": (2, 64),
    "SelfRegulationSCP2": (1, 48),
    "PEMS-SF": (1, 32),
    "MotorImagery": (1, 32),
    "EigenWorms": (1, 24),
}


def make_shaped_splits(n_class: int, c: int, t: int, seed: int,
                       n_train: int, noise: float = 0.6):
    """Class-separable synthetic multivariate series at a UEA dataset's
    published shape, standardized like the whole-set Normalizer (the same
    family as sie_tpu.parity.harness.make_parity_splits, generalized to any
    (classes, C, T))."""
    rng = np.random.default_rng((seed, n_class, c, t))
    n_src = 3
    mix = rng.normal(0, 1, (n_class, n_src, c))
    freqs = rng.uniform(0.02, 0.3, (n_class, n_src))
    tt = np.arange(t)

    def gen(n):
        y = (np.arange(n) % n_class).astype(np.int64)   # balanced classes
        rng.shuffle(y)
        x = np.zeros((n, t, c), np.float32)
        for i in range(n):
            k = y[i]
            ph = rng.uniform(0, 2 * np.pi, n_src)
            src = np.sin(2 * np.pi * freqs[k][:, None] * tt[None]
                         + ph[:, None])
            x[i] = (mix[k].T @ src).T + rng.normal(0, noise, (t, c))
        return x.astype(np.float32), y

    n_test = max(n_class * 4, n_train // 2)
    splits = {"train": gen(n_train), "val": gen(n_test), "test": gen(n_test)}
    mu = splits["train"][0].mean(axis=(0, 1), keepdims=True)
    sd = splits["train"][0].std(axis=(0, 1), keepdims=True) + 1e-8
    return {k: (((x - mu) / sd).astype(np.float32), y)
            for k, (x, y) in splits.items()}


def run_dataset(name: str, quick: bool):
    from sie_tpu.config import Config
    from sie_tpu.data.uea import UEA_DATASET_SHAPES
    from sie_tpu.parity.harness import make_batch_schedule, train_sie_tpu
    from sie_tpu.parity.torch_reference import train_torch_reference

    c, t, n_class = UEA_DATASET_SHAPES[name]
    n_seeds, n_train = SUBSET[name]
    if quick:
        n_seeds = 1
    epochs = 6 if quick else 12
    batch_size = 8
    acc_t, acc_j = [], []
    t0 = time.time()
    for seed in range(n_seeds):
        splits = make_shaped_splits(n_class, c, t, seed, n_train)
        cfg = Config(data="UEA", dataset=f"ab-{name}", model="InterpGN",
                     dnn_type="FCN", seq_len=t, enc_in=c, num_class=n_class,
                     num_shapelet=2, lambda_div=0.1, lambda_reg=0.1,
                     epsilon=1.0, batch_size=batch_size, train_epochs=epochs,
                     patience=max(8, epochs // 2), lr=5e-3, amp=False,
                     dropout=0.0, use_pallas=False, seed=seed,
                     beta_schedule="cosine", log_interval=1000)
        sched = make_batch_schedule(n_train, batch_size, epochs, seed)
        rt = train_torch_reference(cfg, splits, sched)
        rj = train_sie_tpu(cfg, splits, sched)
        acc_t.append(rt["test_accuracy"])
        acc_j.append(rj["test_accuracy"])
        print(f"  [seed {seed}] torch {rt['test_accuracy']:.2f}% "
              f"sie_tpu {rj['test_accuracy']:.2f}%", flush=True)
    return {"dataset": name, "C": c, "T": t, "classes": n_class,
            "seeds": n_seeds, "n_train": n_train, "epochs": epochs,
            "stride_regime": "log2(L)" if t >= 3000 else "1",
            "torch_mean": float(np.mean(acc_t)),
            "sie_tpu_mean": float(np.mean(acc_j)),
            "delta_pts": float(np.mean(acc_j) - np.mean(acc_t)),
            "seconds": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    names = [args.only] if args.only else list(SUBSET)
    rows = []
    for name in names:
        print(f"== {name} ==", flush=True)
        rows.append(run_dataset(name, args.quick))
        print(f"   torch {rows[-1]['torch_mean']:.2f}% vs sie_tpu "
              f"{rows[-1]['sie_tpu_mean']:.2f}% "
              f"(delta {rows[-1]['delta_pts']:+.2f}, "
              f"{rows[-1]['seconds']}s)", flush=True)

    with open(os.path.join(REPO, "docs", "uea_accuracy_ab.json"), "w") as f:
        json.dump(rows, f, indent=1)
    lines = [
        "# Per-dataset UEA accuracy A/B: sie_tpu vs torch twin "
        "(learnable synthetics)",
        "",
        "Class-separable synthetic archives at each dataset's published",
        "(C, T, classes); InterpGN+FCN (the run_uea.sh defaults scaled to",
        "k=2 shapelets), identical data + per-epoch batch schedules, f32",
        "both sides. Accuracies are converged test means over the seeds",
        "(weight inits necessarily differ between PRNGs). MotorImagery sits",
        "exactly at the T>=3000 stride-rule boundary; EigenWorms exercises",
        "the deep log2(L)-stride regime; PEMS-SF the C=963 predicate width.",
        "",
        "| dataset | C | T | cls | stride | seeds | torch acc % | "
        "sie_tpu acc % | delta (pts) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['dataset']} | {r['C']} | {r['T']} | {r['classes']} | "
            f"{r['stride_regime']} | {r['seeds']} | {r['torch_mean']:.2f} | "
            f"{r['sie_tpu_mean']:.2f} | {r['delta_pts']:+.2f} |")
    worst = max(abs(r["delta_pts"]) for r in rows)
    lines += ["", f"Worst |delta| = {worst:.2f} pts.", ""]
    with open(os.path.join(REPO, "docs", "UEA_ACCURACY_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"worst |delta| = {worst:.2f} pts")


if __name__ == "__main__":
    main()
