#!/usr/bin/env python
"""Per-dataset UEA accuracy A/B on learnable synthetics (VERDICT r3 item 8,
de-saturated per VERDICT r4 item 2).

Extends the shape sweep (scripts/uea_shape_sweep.py, 1-epoch smoke) to
TRAINED accuracy vs the reference-faithful torch twin: for a representative
subset of UEA shapes — including the memory-flagged regimes run_uea.sh:14-49
calls out (PEMS-SF C=963, DuckDuckGeese C=1345, MotorImagery T=3000 = the
stride-rule boundary, EigenWorms T=17984 deep in the log2-stride regime) —
generate class-separable synthetic archives at the dataset's published
(C, T, classes), train InterpGN+FCN (the run_uea.sh default config) on
IDENTICAL data and batch schedules in both frameworks, and compare converged
test accuracy.

r5 de-saturation: per-dataset noise is CALIBRATED with torch-only probes so
the torch side lands in the [60%, 92%] band (ceiling-pinned rows cannot
detect a dynamics mismatch — VERDICT r4 weak-2); the accepted probe doubles
as the seed-0 torch result (identical protocol). PEMS-SF runs a PINNED
learnable config (n_train=56, 20 epochs, noise 0.6 -> torch 57.1% measured)
fixing the r4 floor-pinned 28.57%=28.57% row. The two giant stride-regime
rows (MotorImagery, EigenWorms: >1.5h/train on this 1-core host) can be
retained from a prior artifact via --keep-giant.

Both sides run f32 on CPU (the certification is about TRAINING SEMANTICS,
not hardware): sie_tpu uses the scan fallback (use_pallas=False), whose
equality with the Pallas kernel is certified separately
(tests/test_pallas_kernel.py + the on-chip UEA sweep, docs/UEA_SWEEP_r03.md).

Writes docs/UEA_ACCURACY_AB.md + docs/uea_accuracy_ab.json incrementally.
Usage: python scripts/uea_accuracy_ab.py [--quick] [--only NAME]
       [--keep-giant PRIOR_JSON]
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
JSON_PATH = os.path.join(REPO, "docs", "uea_accuracy_ab.json")
MD_PATH = os.path.join(REPO, "docs", "UEA_ACCURACY_AB.md")

BAND = (60.0, 92.0)

# name -> dict(seeds, n_train, epochs, noise, calibrate):
# noise is the calibration start (calibrate=True) or pinned (False).
# The giant shapes get 1 seed / smaller sets to keep the torch side
# (unfold-broadcast distance) tractable on this 1-core host.
SUBSET = {
    "BasicMotions": dict(seeds=2, n_train=64, epochs=12, noise=1.8,
                         calibrate=True),
    "SpokenArabicDigits": dict(seeds=2, n_train=64, epochs=12, noise=1.8,
                               calibrate=True),
    "Heartbeat": dict(seeds=2, n_train=64, epochs=12, noise=1.8,
                      calibrate=True),
    "SelfRegulationSCP2": dict(seeds=1, n_train=48, epochs=12, noise=1.8,
                               calibrate=True),
    # learnable wide-C config measured r5 (/tmp probe: torch 57.1%)
    "PEMS-SF": dict(seeds=1, n_train=56, epochs=20, noise=0.6,
                    calibrate=False),
    # the 4th memory-flagged dataset (run_uea.sh:47-49), C=1345
    "DuckDuckGeese": dict(seeds=1, n_train=40, epochs=20, noise=0.6,
                          calibrate=False),
    "MotorImagery": dict(seeds=1, n_train=32, epochs=12, noise=0.6,
                         calibrate=False, giant=True),
    "EigenWorms": dict(seeds=1, n_train=24, epochs=12, noise=0.6,
                       calibrate=False, giant=True),
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


def _make_cfg(name, c, t, n_class, seed, epochs, batch_size):
    from sie_tpu.config import Config
    return Config(data="UEA", dataset=f"ab-{name}", model="InterpGN",
                  dnn_type="FCN", seq_len=t, enc_in=c, num_class=n_class,
                  num_shapelet=2, lambda_div=0.1, lambda_reg=0.1,
                  epsilon=1.0, batch_size=batch_size, train_epochs=epochs,
                  patience=max(8, epochs // 2), lr=5e-3, amp=False,
                  dropout=0.0, use_pallas=False, seed=seed,
                  beta_schedule="cosine", log_interval=1000)


def _train_torch(name, c, t, n_class, seed, n_train, epochs, batch_size,
                 noise):
    from sie_tpu.parity.harness import make_batch_schedule
    from sie_tpu.parity.torch_reference import train_torch_reference
    splits = make_shaped_splits(n_class, c, t, seed, n_train, noise)
    cfg = _make_cfg(name, c, t, n_class, seed, epochs, batch_size)
    sched = make_batch_schedule(n_train, batch_size, epochs, seed)
    return train_torch_reference(cfg, splits, sched)


def calibrate(name, c, t, n_class, spec, batch_size, max_probes=5):
    """Walk noise until the torch probe (seed 0) lands in BAND. Returns
    (noise, history, seed0_torch_result_at_accepted_noise_or_None)."""
    lo, hi = BAND
    noise = spec["noise"]
    history = []
    step = 1.6
    best = None
    last_dir = None
    for _ in range(max_probes):
        rt = _train_torch(name, c, t, n_class, 0, spec["n_train"],
                          spec["epochs"], batch_size, noise)
        acc = float(rt["test_accuracy"])
        history.append({"noise": noise, "torch_acc": acc})
        print(f"   [calib {name}] noise={noise:.2f} -> torch {acc:.1f}%",
              flush=True)
        if lo <= acc <= hi:
            return noise, history, rt
        best = (noise, rt) if best is None or \
            abs(acc - 0.5 * (lo + hi)) < \
            abs(best[1]["test_accuracy"] - 0.5 * (lo + hi)) else best
        # full geometric steps while still pinned on one side of the band;
        # shrink only once a probe lands on the OTHER side (bracketed) —
        # wide-C sets average i.i.d. channel noise down and can need noise
        # several x the start before accuracy moves at all (Heartbeat C=61
        # stayed at 100% through 3 damped probes in the first r5 run)
        direction = "up" if acc > hi else "down"   # up = raise noise
        if last_dir is not None and direction != last_dir:
            step = 1.0 + (step - 1.0) * 0.5
        last_dir = direction
        noise = noise * step if acc > hi else max(0.1, noise / step)
    return best[0], history, best[1]


def run_dataset(name: str, quick: bool):
    from sie_tpu.data.uea import UEA_DATASET_SHAPES
    from sie_tpu.parity.harness import make_batch_schedule, train_sie_tpu

    c, t, n_class = UEA_DATASET_SHAPES[name]
    spec = SUBSET[name]
    n_seeds = 1 if quick else spec["seeds"]
    epochs = 6 if quick else spec["epochs"]
    batch_size = 8
    t0 = time.time()

    torch0 = None
    if spec.get("calibrate") and not quick:
        noise, history, torch0 = calibrate(name, c, t, n_class, spec,
                                           batch_size)
    else:
        noise, history = spec["noise"], [{"noise_pinned": spec["noise"]}]

    acc_t, acc_j = [], []
    for seed in range(n_seeds):
        splits = make_shaped_splits(n_class, c, t, seed, spec["n_train"],
                                    noise)
        cfg = _make_cfg(name, c, t, n_class, seed, epochs, batch_size)
        sched = make_batch_schedule(spec["n_train"], batch_size, epochs, seed)
        if seed == 0 and torch0 is not None:
            rt = torch0    # the accepted probe IS the seed-0 torch run
        else:
            from sie_tpu.parity.torch_reference import train_torch_reference
            rt = train_torch_reference(cfg, splits, sched)
        rj = train_sie_tpu(cfg, splits, sched)
        acc_t.append(rt["test_accuracy"])
        acc_j.append(rj["test_accuracy"])
        print(f"  [seed {seed}] torch {rt['test_accuracy']:.2f}% "
              f"sie_tpu {rj['test_accuracy']:.2f}%", flush=True)
    return {"dataset": name, "C": c, "T": t, "classes": n_class,
            "seeds": n_seeds, "n_train": spec["n_train"], "epochs": epochs,
            "noise": noise, "calibration": history,
            "stride_regime": "log2(L)" if t >= 3000 else "1",
            "torch_mean": float(np.mean(acc_t)),
            "sie_tpu_mean": float(np.mean(acc_j)),
            "delta_pts": float(np.mean(acc_j) - np.mean(acc_t)),
            "seconds": round(time.time() - t0, 1)}


def _dump(rows):
    order = list(SUBSET)
    rows = sorted(rows, key=lambda r: (order.index(r["dataset"])
                                       if r["dataset"] in order else 99))
    with open(JSON_PATH, "w") as f:
        json.dump(rows, f, indent=1)
    lines = [
        "# Per-dataset UEA accuracy A/B: sie_tpu vs torch twin "
        "(learnable synthetics)",
        "",
        "Class-separable synthetic archives at each dataset's published",
        "(C, T, classes); InterpGN+FCN (the run_uea.sh defaults scaled to",
        "k=2 shapelets), identical data + per-epoch batch schedules, f32",
        "both sides. Per-dataset noise calibrated with torch-only probes so",
        f"the torch side lands in [{BAND[0]:.0f}%, {BAND[1]:.0f}%]"
        " (no ceiling-pinned rows); PEMS-SF and",
        "DuckDuckGeese (the wide-C predicate regimes) run pinned LEARNABLE",
        "configs fixing the r4 floor-pinned PEMS-SF row. MotorImagery sits",
        "exactly at the T>=3000 stride-rule boundary; EigenWorms exercises",
        "the deep log2(L)-stride regime (rows marked r4 are retained",
        "saturated rows: >1.5h/train on this host — execution evidence,",
        "not dynamics-sensitive).",
        "",
        "| dataset | C | T | cls | stride | seeds | noise | torch acc % | "
        "sie_tpu acc % | delta (pts) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        tagname = r["dataset"] + (" (r4)" if r.get("kept_r4") else "")
        lines.append(
            f"| {tagname} | {r['C']} | {r['T']} | {r['classes']} | "
            f"{r['stride_regime']} | {r['seeds']} | "
            f"{r.get('noise', 0.6):.2f} | {r['torch_mean']:.2f} | "
            f"{r['sie_tpu_mean']:.2f} | {r['delta_pts']:+.2f} |")
    fresh = [r for r in rows if not r.get("kept_r4")]
    if fresh:
        worst = max(abs(r["delta_pts"]) for r in fresh)
        lines += ["", f"Worst |delta| over the {len(fresh)} de-saturated "
                      f"rows = {worst:.2f} pts.", ""]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--keep-giant", type=str, default=None, metavar="JSON",
                    help="prior uea_accuracy_ab.json: retain its MotorImagery"
                         "/EigenWorms rows instead of retraining them")
    ap.add_argument("--merge", type=str, default=None, metavar="JSON",
                    help="prior artifact: preload ALL its rows; fresh runs "
                         "replace same-name rows in place (lets --only "
                         "re-calibrate one pinned row without clobbering "
                         "the rest)")
    ap.add_argument("--noise", type=float, default=None,
                    help="override the SUBSET start/pinned noise for the "
                         "--only dataset")
    ap.add_argument("--seeds", type=int, default=None,
                    help="override the SUBSET seed count for the --only "
                         "dataset (e.g. widen a 1-seed wide-C row)")
    args = ap.parse_args()
    names = [args.only] if args.only else list(SUBSET)
    if args.noise is not None or args.seeds is not None:
        if not args.only:
            raise SystemExit("--noise/--seeds require --only")
        over = {}
        if args.noise is not None:
            over["noise"] = args.noise
        if args.seeds is not None:
            over["seeds"] = args.seeds
        SUBSET[args.only] = dict(SUBSET[args.only], **over)

    kept = {}
    if args.keep_giant:
        with open(args.keep_giant) as f:
            for r in json.load(f):
                if SUBSET.get(r["dataset"], {}).get("giant"):
                    r["kept_r4"] = True
                    kept[r["dataset"]] = r

    rows = []
    if args.merge:
        with open(args.merge) as f:
            rows = [r for r in json.load(f) if r["dataset"] not in names]
    for name in names:
        if name in kept:
            rows.append(kept[name])
            _dump(rows)
            print(f"== {name}: kept from {args.keep_giant}", flush=True)
            continue
        print(f"== {name} ==", flush=True)
        rows.append(run_dataset(name, args.quick))
        print(f"   torch {rows[-1]['torch_mean']:.2f}% vs sie_tpu "
              f"{rows[-1]['sie_tpu_mean']:.2f}% "
              f"(delta {rows[-1]['delta_pts']:+.2f}, "
              f"{rows[-1]['seconds']}s)", flush=True)
        _dump(rows)
    fresh = [r for r in rows if not r.get("kept_r4")]
    if fresh:
        print(f"worst fresh |delta| = "
              f"{max(abs(r['delta_pts']) for r in fresh):.2f} pts")


if __name__ == "__main__":
    main()
