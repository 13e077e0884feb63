#!/usr/bin/env python
"""39-class flagship-regime twin A/B (VERDICT r4 item 1, CPU side).

The r4 on-chip cert trained InterpGN+Transformer at the reference defaults
(lr 5e-3, `/root/reference/InterpretGatedNetwork/run.py:105`) in the full
39-class CHISCO regime and got 8.87% — far above the 2.56% baseline but
unusable. This script pins WHY at a CPU-tractable 39-class scale
(kind='eeg39': C=16, T=160, 624 train rows) by training the
reference-faithful torch twin and sie_tpu on identical data + batch
schedules at lr 5e-3 (the failing default) and lr 1e-3 (the candidate fix):

- torch ALSO fails at 5e-3 and both recover at 1e-3  -> faithful reference
  dynamics (the default lr is hot for a Transformer expert at 39 classes);
- only sie_tpu fails at 5e-3                         -> rebuild bug.

Writes docs/flagship39_ab.json and prints a markdown table for
docs/PARITY_CONVERGENCE.md.

Usage: python scripts/flagship39_ab.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# CPU A/B by definition; also keeps the axon relay out of the loop
jax.config.update("jax_platforms", "cpu")

from sie_tpu.parity.harness import run_parity  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mid-scale Transformer expert: big enough to show lr-5e-3 instability if it
# is inherent, small enough for CPU (full cert scale is d_model=512/ff=2048)
_TRANS = dict(d_model=128, d_ff=512, n_heads=8, e_layers=2)
_EEGCNN = dict(eegcnn_kernel1=25, eegcnn_kernel2=7, eegcnn_pool1=2,
               eegcnn_pool2=2, eegcnn_cnn_f1=8, eegcnn_cnn_f2=4,
               d_model=64, eegcnn_layers=1, eegcnn_n_heads=4,
               eegcnn_d_ff=128, eegcnn_dropout1=0.0, eegcnn_dropout2=0.0)

CONFIGS = [
    # the failing regime: reference-default lr on the flagship head
    dict(model="InterpGN", dnn_type="Transformer",
         overrides=dict(num_shapelet=10, beta_schedule="cosine",
                        lr=5e-3, **_TRANS)),
    # the candidate recipe
    dict(model="InterpGN", dnn_type="Transformer",
         overrides=dict(num_shapelet=10, beta_schedule="cosine",
                        lr=1e-3, **_TRANS)),
    # weak-6: is EEGCNN's 54.7% at-scale figure a recipe artifact too?
    dict(model="EEGCNN", dnn_type="FCN",
         overrides=dict(lr=5e-3, **_EEGCNN)),
    dict(model="EEGCNN", dnn_type="FCN",
         overrides=dict(lr=1e-3, **_EEGCNN)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1 seed, fewer epochs (smoke)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    seeds = (0,) if args.quick else (0, 1, 2)
    epochs = 6 if args.quick else 25  # cert ran 25 epochs
    rows = []
    for cfg in CONFIGS:
        row = run_parity(cfg["model"], cfg["dnn_type"], kind="eeg39",
                         seeds=seeds, epochs=epochs, batch_size=64,
                         overrides=dict(cfg["overrides"], patience=8),
                         noise=0.4, n_per_split=(624, 156, 156),
                         verbose=args.verbose)
        rows.append(row)
        print(f"[flagship39] {row['model']}+{row['dnn_type']} lr "
              f"{row['lr']:g}: torch {row['torch_mean']:.2f}% "
              f"sie_tpu {row['sie_tpu_mean']:.2f}% "
              f"(delta {row['delta_pts']:+.2f})", flush=True)

    out = {"kind": "eeg39", "n_per_split": [624, 156, 156], "noise": 0.4,
           "epochs": epochs, "batch_size": 64, "random_baseline": 100.0 / 39,
           "rows": rows}
    path = os.path.join(REPO, "docs", "flagship39_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")

    print("\n| model | lr | torch acc | sie_tpu acc | delta |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']}+{r['dnn_type']} | {r['lr']:g} "
              f"| {r['torch_mean']:.2f} | {r['sie_tpu_mean']:.2f} "
              f"| {r['delta_pts']:+.2f} |")


if __name__ == "__main__":
    main()
