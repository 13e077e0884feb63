#!/usr/bin/env python
"""Convergence-parity certification: reference-faithful torch IGN vs sie_tpu
on identical synthetic EEG3/UEA data, >=3 seeds per config (VERDICT r2 item 1).

Writes docs/PARITY_CONVERGENCE.md + docs/parity_convergence.json.

Usage: python scripts/convergence_parity.py [--quick]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This certification is defined as a CPU A/B (torch-CPU vs sie_tpu-CPU, f32);
# also, the container sitecustomize force-registers the axon TPU backend,
# which hangs every jax op when the relay is down — pin cpu before any use.
jax.config.update("jax_platforms", "cpu")

from sie_tpu.parity.harness import run_parity, run_regression_parity  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# compact-but-converging shapes for the heavy backbones (the A/B compares
# frameworks on identical configs, so absolute capacity only needs to be
# enough to learn the synthetic sets)
_TIMESNET = dict(d_model=32, d_ff=32, top_k=2, num_kernels=3, e_layers=1)
_PATCHTST = dict(d_model=32, d_ff=64, e_layers=2)

CONFIGS = [
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4)),
    dict(model="SBM", dnn_type="FCN", kind="eeg3",
         overrides=dict(num_shapelet=4)),
    dict(model="LTS", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4)),
    dict(model="EEGCNN", dnn_type="FCN", kind="eeg3",
         overrides=dict(eegcnn_kernel1=15, eegcnn_kernel2=7, eegcnn_pool1=2,
                        eegcnn_pool2=2, eegcnn_cnn_f1=8, eegcnn_cnn_f2=2,
                        d_model=32, eegcnn_layers=1, eegcnn_n_heads=4,
                        eegcnn_d_ff=64, eegcnn_dropout1=0.0,
                        eegcnn_dropout2=0.0)),
    dict(model="InterpGN", dnn_type="FCN", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    dict(model="InterpGN", dnn_type="Transformer", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    # hard regime: accuracy off the 100% ceiling so the delta is informative
    # in the non-saturated regime (more seeds: mid-range acc has seed noise).
    # patience=999 disables early stopping on BOTH sides here: near-chance
    # plateaus last 10-15 epochs depending on init luck, and a patience-10
    # stop randomly truncates whichever framework drew the slower init (seen:
    # sie_tpu seed 2 stopped at epoch 11 at 34%, reaches 100% by epoch 28).
    # The early-stop mechanism itself is certified by the default configs.
    dict(model="SBM", dnn_type="FCN", kind="eeg3", noise=3.0,
         overrides=dict(num_shapelet=4, patience=999), seeds=(0, 1, 2, 3, 4)),
    # the Gini-gated mixture in the same non-saturated regime
    dict(model="InterpGN", dnn_type="FCN", kind="eeg3", noise=3.0,
         overrides=dict(num_shapelet=4, patience=999,
                        beta_schedule="cosine"), seeds=(0, 1, 2, 3, 4)),
    # ---- round-4 matrix extension (VERDICT r3 item 1) -------------------
    # every remaining --dnn_type as a standalone DNN ...
    dict(model="DNN", dnn_type="ResNet", kind="uea", overrides={}),
    dict(model="DNN", dnn_type="TimesNet", kind="uea",
         overrides=dict(_TIMESNET)),
    dict(model="DNN", dnn_type="PatchTST", kind="uea",
         overrides=dict(_PATCHTST)),
    # ... and as the deep expert inside InterpGN
    dict(model="InterpGN", dnn_type="ResNet", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
    dict(model="InterpGN", dnn_type="TimesNet", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine", **_TIMESNET)),
    dict(model="InterpGN", dnn_type="PatchTST", kind="eeg3",
         overrides=dict(num_shapelet=4, beta_schedule="cosine", **_PATCHTST)),
    # the bilinear / attention SBM classifier heads (Shapelet.py:199-205)
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4, sbm_cls="bilinear")),
    dict(model="SBM", dnn_type="FCN", kind="uea",
         overrides=dict(num_shapelet=4, sbm_cls="attention")),
]

# CRPS regression training A/B (exp/experiment_regression.py:59-207);
# accuracy columns report argmax-bin hit rate, crps columns the test loss
REGRESSION_CONFIGS = [
    dict(model="SBM", dnn_type="FCN", overrides=dict(num_shapelet=4)),
    dict(model="DNN", dnn_type="FCN", overrides={}),
    dict(model="InterpGN", dnn_type="FCN",
         overrides=dict(num_shapelet=4, beta_schedule="cosine")),
]


def main():
    quick = "--quick" in sys.argv
    seeds = (0, 1) if quick else (0, 1, 2)
    epochs = 15 if quick else 40
    rows = []
    for cfgkw in CONFIGS:
        print(f"== {cfgkw['model']}+{cfgkw['dnn_type']} on {cfgkw['kind']} ==",
              flush=True)
        kw = dict(seeds=seeds, epochs=epochs, batch_size=16, verbose=True)
        kw.update(cfgkw)
        r = run_parity(**kw)
        print(f"   torch {r['torch_mean']:.2f}% vs sie_tpu "
              f"{r['sie_tpu_mean']:.2f}% (delta {r['delta_pts']:+.2f} pts)",
              flush=True)
        rows.append(r)
    for cfgkw in REGRESSION_CONFIGS:
        print(f"== REG {cfgkw['model']}+{cfgkw['dnn_type']} ==", flush=True)
        kw = dict(seeds=seeds, epochs=epochs, batch_size=16, verbose=True)
        kw.update(cfgkw)
        r = run_regression_parity(**kw)
        print(f"   torch crps {r['torch_crps']:.4f} / bin-acc "
              f"{r['torch_mean']:.2f}% vs sie_tpu crps "
              f"{r['sie_tpu_crps']:.4f} / bin-acc {r['sie_tpu_mean']:.2f}%",
              flush=True)
        rows.append(r)

    with open(os.path.join(REPO, "docs", "parity_convergence.json"), "w") as f:
        json.dump([{k: v for k, v in r.items() if k != "per_seed"}
                   for r in rows], f, indent=1)

    lines = [
        "# Convergence parity: sie_tpu vs reference-faithful torch IGN",
        "",
        "Protocol: identical synthetic class-separable data (standardized),",
        "identical per-epoch batch index schedules, f32 both sides,",
        f"{epochs} epochs, seeds {list(seeds)}. The torch side implements the",
        "reference's live training semantics verbatim",
        "(`sie_tpu/parity/torch_reference.py`, citations inline). Accuracies",
        "are means over seeds; per-seed numbers in parity_convergence.json.",
        "Weight inits necessarily differ (different PRNGs), so the comparison",
        "is converged accuracy, not loss curves.",
        "",
        "For `regression` rows the accuracies are argmax-bin hit rates and",
        "the torch/sie_tpu test-CRPS means are appended in the config cell;",
        "`[bilinear]`/`[attention]` mark the SBM classifier head",
        "(Shapelet.py:199-205).",
        "",
        "| config | data | noise | seeds | torch acc % | sie_tpu acc % | delta (pts) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        name = f"{r['model']}+{r['dnn_type']}"
        if r.get("sbm_cls"):
            name += f" [{r['sbm_cls']}]"
        if "torch_crps" in r:
            name += (f" (crps {r['torch_crps']:.3f} vs "
                     f"{r['sie_tpu_crps']:.3f})")
        lines.append(f"| {name} | {r['kind']} | "
                     f"{r['noise']} | {len(r['seeds'])} | "
                     f"{r['torch_mean']:.2f} | {r['sie_tpu_mean']:.2f} | "
                     f"{r['delta_pts']:+.2f} |")
    worst = max(abs(r["delta_pts"]) for r in rows)
    lines += ["",
              f"Worst |delta| = {worst:.2f} pts (target: <= 2 pts on these "
              "synthetic sets, the checkable analogue of BASELINE.md's "
              "±0.5-pt CHISCO goal).", ""]
    with open(os.path.join(REPO, "docs", "PARITY_CONVERGENCE.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"worst |delta| = {worst:.2f} pts")


if __name__ == "__main__":
    main()
