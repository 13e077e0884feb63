#!/usr/bin/env python
"""De-saturated convergence-parity matrix (VERDICT r4 item 2).

The r4 matrix (docs/PARITY_CONVERGENCE.md) certifies converged accuracy,
but 14/16 classification rows sit at torch=100% — a ceiling-pinned row
cannot detect a moderate training-dynamics mismatch. This script regenerates
the matrix in a NON-SATURATED regime: for every config it first calibrates
the synthetic-generator noise so the torch reference lands in the
[55%, 92%] band (torch-only probe at seed 0, warm-started per kind), then
runs the multi-seed A/B at that noise with early stopping disabled
(patience=999: near-chance plateaus otherwise randomly truncate whichever
framework drew the slower init — see convergence_parity.py's hard rows).

Also closes two adjacent VERDICT r4 items in the same artifact:
- regression rows at >=5 seeds (weak-4: the +5.21-pt InterpGN hit-rate
  delta rode on 3 seeds with ~11-pt per-seed spread);
- a `sqeuclidean` convergence A/B (weak-5): the reference's own
  memory-efficient distance semantics (Shapelet.py:27-28) trained end-to-end
  in both frameworks (torch twin's distance_func='sqeuclidean' mirrors the
  memory_efficient metric; sie_tpu side is the MXU conv decomposition,
  ops/shapelet.py:182-186).

Writes docs/parity_desat.json + docs/PARITY_DESAT.md INCREMENTALLY (one row
at a time) so partial progress survives interruption.

Usage: python scripts/parity_desat.py [--quick] [--only SUBSTR]
       [--skip-regression] [--skip-classification]
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

# CPU A/B by definition; keeps the axon relay out of the loop
jax.config.update("jax_platforms", "cpu")

from sie_tpu.parity.harness import (  # noqa: E402
    make_batch_schedule, make_parity_splits, run_parity,
    run_regression_parity)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JSON_PATH = os.path.join(REPO, "docs", "parity_desat.json")
MD_PATH = os.path.join(REPO, "docs", "PARITY_DESAT.md")

BAND = (55.0, 92.0)          # torch probe target band, percent
NOISE_MIN, NOISE_MAX = 1.0, 12.0
MAX_PROBES = 4

_TIMESNET = dict(d_model=32, d_ff=32, top_k=2, num_kernels=3, e_layers=1)
_PATCHTST = dict(d_model=32, d_ff=64, e_layers=2)
_EEGCNN = dict(eegcnn_kernel1=15, eegcnn_kernel2=7, eegcnn_pool1=2,
               eegcnn_pool2=2, eegcnn_cnn_f1=8, eegcnn_cnn_f2=2,
               d_model=32, eegcnn_layers=1, eegcnn_n_heads=4,
               eegcnn_d_ff=64, eegcnn_dropout1=0.0, eegcnn_dropout2=0.0)

# same model matrix as convergence_parity.py CONFIGS, plus the two
# sqeuclidean rows (marked dfunc). Ordered so that with --resume the rows
# most affected by the r5 torch-default-init parity fix rerun first (the
# incremental dump keeps partial progress useful if the round ends mid-run).
CONFIGS = [
    dict(model="EEGCNN", dnn_type="FCN", kind="eeg3",
         overrides=dict(_EEGCNN)),
    dict(model="InterpGN", dnn_type="Transformer", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    dict(model="DNN", dnn_type="PatchTST", kind="uea",
         overrides=dict(_PATCHTST)),
    dict(model="InterpGN", dnn_type="FCN", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    dict(model="DNN", dnn_type="ResNet", kind="uea", overrides={}),
    dict(model="DNN", dnn_type="TimesNet", kind="uea",
         overrides=dict(_TIMESNET)),
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4)),
    dict(model="SBM", dnn_type="FCN", kind="eeg3",
         overrides=dict(num_shapelet=4)),
    # 6 seeds: the old-init run's -7.81 LTS delta had a [-12.5, 0.0] per-seed
    # spread; more seeds decide noise-vs-bug (LTS itself is init-unchanged)
    dict(model="LTS", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4), n_seeds=6),
    # VERDICT r4 weak-5: the sqeuclidean metric trained end-to-end
    dict(model="SBM", dnn_type="FCN", kind="eeg3",
         overrides=dict(num_shapelet=4, distance_func="sqeuclidean")),
    dict(model="InterpGN", dnn_type="Transformer", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine",
                        distance_func="sqeuclidean")),
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4, sbm_cls="bilinear")),
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4, sbm_cls="attention")),
    dict(model="InterpGN", dnn_type="ResNet", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    dict(model="InterpGN", dnn_type="PatchTST", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine", **_PATCHTST)),
    dict(model="InterpGN", dnn_type="TimesNet", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine", **_TIMESNET)),
]

REGRESSION_CONFIGS = [
    dict(model="SBM", dnn_type="FCN", overrides=dict(num_shapelet=4)),
    dict(model="DNN", dnn_type="FCN", overrides={}),
    dict(model="InterpGN", dnn_type="FCN",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
]


def _row_tag(cfgkw: dict) -> str:
    o = cfgkw.get("overrides", {})
    bits = [cfgkw["model"], cfgkw["dnn_type"], cfgkw.get("kind", "reg")]
    if o.get("sbm_cls"):
        bits.append(o["sbm_cls"])
    if o.get("distance_func", "euclidean") != "euclidean":
        bits.append(o["distance_func"])
    return "+".join(bits)


def _row_key(r: dict) -> tuple:
    """Identity key for a stored row (resume matching)."""
    kind = r.get("kind", "reg")
    return (r["model"], r["dnn_type"], "reg" if kind == "regression" else kind,
            r.get("sbm_cls") or None,
            r.get("distance_func") or "euclidean")


def _cfg_key(cfgkw: dict) -> tuple:
    o = cfgkw.get("overrides", {})
    head = o.get("sbm_cls")
    return (cfgkw["model"], cfgkw["dnn_type"], cfgkw.get("kind", "reg"),
            None if head in (None, "linear") else head,
            o.get("distance_func", "euclidean"))


def probe_torch(cfgkw: dict, noise: float, epochs: int,
                batch_size: int) -> float:
    """Train ONLY the torch reference (seed 0) at this noise; returns test
    accuracy in percent. Used to calibrate difficulty — applied identically
    to both frameworks afterwards, so it cannot bias the A/B."""
    from sie_tpu.config import Config
    from sie_tpu.parity.torch_reference import train_torch_reference

    kind = cfgkw["kind"]
    splits = make_parity_splits(kind, seed=0, noise=noise)
    n_class = int(splits["train"][1].max()) + 1
    t, c = splits["train"][0].shape[1:]
    kw = dict(data="UEA", dataset=f"desat-{kind}", model=cfgkw["model"],
              dnn_type=cfgkw["dnn_type"], seq_len=t, enc_in=c,
              num_class=n_class, num_shapelet=4, batch_size=batch_size,
              train_epochs=epochs, patience=999, lr=5e-3, amp=False,
              dropout=0.0, d_model=64, d_ff=128, n_heads=4, e_layers=2,
              use_pallas=False, seed=0, log_interval=1000)
    kw.update(cfgkw.get("overrides", {}))
    kw["patience"] = 999
    cfg = Config(**kw)
    sched = make_batch_schedule(len(splits["train"][0]), cfg.batch_size,
                                cfg.train_epochs, 0)
    r = train_torch_reference(cfg, splits, sched, verbose=False)
    return float(r["test_accuracy"])


def calibrate(cfgkw: dict, start_noise: float, epochs: int,
              batch_size: int, verbose: bool,
              max_probes: int = MAX_PROBES) -> tuple:
    """Walk the noise knob until the torch probe lands in BAND. Returns
    (noise, probe_history). Monotone assumption: higher noise -> lower acc."""
    lo, hi = BAND
    noise = start_noise
    history = []
    step = 1.5
    for k in range(max_probes):
        acc = probe_torch(cfgkw, noise, epochs, batch_size)
        history.append({"noise": noise, "torch_acc": acc})
        if verbose:
            print(f"   [calib {_row_tag(cfgkw)}] noise={noise:.2f} -> "
                  f"torch {acc:.1f}%", flush=True)
        if lo <= acc <= hi:
            return noise, history
        if acc > hi:
            noise = min(NOISE_MAX, noise * step)
        else:
            noise = max(NOISE_MIN, noise / step)
        step = 1.0 + (step - 1.0) * 0.6     # shrink toward the band
    # out of probes: return the in-history noise whose acc is closest to
    # the band midpoint (still non-saturated evidence, just off-target)
    mid = 0.5 * (lo + hi)
    best = min(history, key=lambda h: abs(h["torch_acc"] - mid))
    return best["noise"], history


def _dump(rows, meta):
    with open(JSON_PATH, "w") as f:
        json.dump({"meta": meta, "rows": rows}, f, indent=1)
    lines = [
        "# De-saturated convergence parity (round 5)",
        "",
        "Same matrix as docs/PARITY_CONVERGENCE.md but with per-row",
        "generator noise calibrated so the torch reference lands in the"
        f" [{BAND[0]:.0f}%, {BAND[1]:.0f}%] band",
        "(no ceiling- or floor-pinned rows), early stopping disabled, fixed "
        f"{meta['epochs']}-epoch budget.",
        "Calibration uses torch-only probes, applied identically to both "
        "frameworks.",
        "Regression rows: >=5 seeds (VERDICT r4 weak-4). `sqeuclidean` rows "
        "train the reference's",
        "memory-efficient metric (Shapelet.py:27-28) end-to-end in both "
        "frameworks (VERDICT r4 weak-5).",
        "",
        "| config | kind | noise | seeds | torch | sie_tpu | delta (pts) | "
        "per-seed delta spread |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if r["kind"] == "regression":
            tag = f"{r['model']}+{r['dnn_type']} (CRPS)"
            extra = (f" crps {r['torch_crps']:.4f} vs "
                     f"{r['sie_tpu_crps']:.4f}")
        else:
            tag, extra = _row_tag_from_row(r), ""
        deltas = [j - t for t, j in zip(r["torch_acc"], r["sie_tpu_acc"])]
        lines.append(
            f"| {tag} | {r['kind']} | {r['noise']:.2f} | "
            f"{len(r['seeds'])} | {r['torch_mean']:.2f} | "
            f"{r['sie_tpu_mean']:.2f} | {r['delta_pts']:+.2f}{extra} | "
            f"[{min(deltas):+.1f}, {max(deltas):+.1f}] |")
    ds = [abs(r["delta_pts"]) for r in rows if r["kind"] != "regression"]
    if ds:
        lines += ["", f"Worst classification |delta|: {max(ds):.2f} pts "
                      f"over {len(ds)} rows."]
    with open(MD_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")


def _row_tag_from_row(r) -> str:
    bits = [r["model"], r["dnn_type"]]
    if r.get("sbm_cls"):
        bits.append(r["sbm_cls"])
    if r.get("distance_func", "euclidean") != "euclidean":
        bits.append(r["distance_func"])
    return "+".join(bits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2 seeds, 15 epochs, 2 probes (smoke)")
    ap.add_argument("--only", default=None,
                    help="substring filter on the row tag")
    ap.add_argument("--skip-regression", action="store_true")
    ap.add_argument("--skip-classification", action="store_true")
    ap.add_argument("--seeds", type=int, default=None)
    ap.add_argument("--resume", default=None, metavar="JSON",
                    help="prior parity_desat.json: rows whose tag matches a "
                         "config are KEPT (skipped) unless listed in --rerun; "
                         "rerun rows reuse the prior calibrated noise (the "
                         "torch probe is init-independent) and the prior "
                         "torch per-seed results at matching seeds")
    ap.add_argument("--rerun", default="", metavar="SUBSTRS",
                    help="comma-separated tag substrings to force-recompute "
                         "even when present in --resume (empty: keep all "
                         "matching rows)")
    args = ap.parse_args()

    epochs = 15 if args.quick else 40
    n_seeds = args.seeds or (2 if args.quick else 3)
    reg_seeds = tuple(range(2 if args.quick else 5))
    seeds = tuple(range(n_seeds))

    prior = {}
    if args.resume:
        with open(args.resume) as f:
            for r in json.load(f)["rows"]:
                prior[_row_key(r)] = r
    rerun = [s.strip().lower() for s in args.rerun.split(",") if s.strip()]

    def _disposition(cfgkw):
        """(kept_row | None, prior_row | None): kept => skip entirely."""
        p = prior.get(_cfg_key(cfgkw))
        if p is None:
            return None, None
        tag = _row_tag(cfgkw).lower()
        if rerun and any(s in tag for s in rerun):
            return None, p   # forced recompute (noise + torch reusable)
        return p, p          # present and not forced: keep as-is

    def _torch_cache(p, want_seeds, want_epochs):
        if not p or p.get("noise") is None:
            return None
        if list(p.get("seeds", [])) and p.get("per_seed", {}).get("torch"):
            cache = {s: r for s, r in zip(p["seeds"], p["per_seed"]["torch"])}
            return {s: cache[s] for s in want_seeds if s in cache} or None
        return None

    meta = {"band": BAND, "epochs": epochs, "batch_size": 16,
            "patience": "disabled (999)",
            "seeds_classification": list(seeds),
            "seeds_regression": list(reg_seeds)}
    rows = []
    t_start = time.perf_counter()

    if not args.skip_regression:
        for cfgkw in REGRESSION_CONFIGS:
            tag = _row_tag(cfgkw)
            if args.only and args.only.lower() not in tag.lower():
                continue
            kept, _p = _disposition(cfgkw)
            if kept is not None:
                rows.append(kept)
                _dump(rows, meta)
                print(f"== REG {tag}: kept from {args.resume}", flush=True)
                continue
            print(f"== REG {tag} ({len(reg_seeds)} seeds) ==", flush=True)
            r = run_regression_parity(
                cfgkw["model"], cfgkw["dnn_type"], seeds=reg_seeds,
                epochs=epochs, batch_size=16,
                overrides=cfgkw.get("overrides"), noise=0.4,
                torch_cache=_torch_cache(_p, reg_seeds, epochs))
            r["calibration"] = None
            rows.append(r)
            elapsed = time.perf_counter() - t_start
            print(f"   torch crps {r['torch_crps']:.4f}/acc "
                  f"{r['torch_mean']:.1f} vs sie {r['sie_tpu_crps']:.4f}/"
                  f"{r['sie_tpu_mean']:.1f} ({elapsed:.0f}s elapsed)",
                  flush=True)
            _dump(rows, meta)

    if not args.skip_classification:
        # warm-start the noise ladder per kind from the previous accepted row
        start_noise = {"eeg3": 4.5, "uea": 3.0}
        probes = MAX_PROBES if not args.quick else 2
        for cfgkw in CONFIGS:
            tag = _row_tag(cfgkw)
            if args.only and args.only.lower() not in tag.lower():
                continue
            kind = cfgkw["kind"]
            row_seeds = tuple(range(cfgkw["n_seeds"])) \
                if cfgkw.get("n_seeds") else seeds
            kept, p = _disposition(cfgkw)
            if kept is not None:
                rows.append(kept)
                start_noise[kind] = kept["noise"]
                _dump(rows, meta)
                print(f"== {tag}: kept from {args.resume}", flush=True)
                continue
            print(f"== {tag} ({len(row_seeds)} seeds) ==", flush=True)
            if p is not None:
                # prior calibration is torch-side only => init-independent
                noise, history = p["noise"], (p.get("calibration") or [])
                history = history + [{"noise_pinned_from": args.resume}]
                print(f"   [calib {tag}] pinned noise={noise:.2f} from prior "
                      f"run", flush=True)
            else:
                noise, history = calibrate(cfgkw, start_noise[kind], epochs,
                                           16, verbose=True,
                                           max_probes=probes)
            start_noise[kind] = noise
            overrides = dict(cfgkw.get("overrides", {}), patience=999)
            r = run_parity(cfgkw["model"], cfgkw["dnn_type"], kind=kind,
                           seeds=row_seeds, epochs=epochs, batch_size=16,
                           overrides=overrides, noise=noise,
                           torch_cache=_torch_cache(p, row_seeds, epochs))
            r["distance_func"] = overrides.get("distance_func", "euclidean")
            r["calibration"] = history
            rows.append(r)
            print(f"   noise {noise:.2f}: torch {r['torch_mean']:.2f} vs "
                  f"sie {r['sie_tpu_mean']:.2f} (d {r['delta_pts']:+.2f}; "
                  f"{time.perf_counter() - t_start:.0f}s elapsed)",
                  flush=True)
            _dump(rows, meta)

    print(f"done in {time.perf_counter() - t_start:.0f}s -> {JSON_PATH}")


if __name__ == "__main__":
    main()
