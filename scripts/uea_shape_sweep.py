#!/usr/bin/env python
"""Compile-coverage sweep over ALL 30 UEA archive shapes (VERDICT r2 item 7):
generate synthetic archives with each dataset's published (dims, length,
classes), smoke-train 1 epoch of InterpGN+FCN at the run_uea.sh defaults'
shapelet structure (6 length-fraction banks), and test — certifying the
kernel register-budget / stride-rule / polyphase logic and the whole
model+data+trainer stack off the flagship shape.

Modes:
  python scripts/uea_shape_sweep.py           # all 30, current backend
  python scripts/uea_shape_sweep.py --subset  # the 7 regime-representative
      shapes (wide-C lane budgets, stride rule, seq<=10 FCN path, baseline)
  python scripts/uea_shape_sweep.py --out docs/UEA_SWEEP.md

On CPU the Pallas kernel runs in interpret mode only for small shapes; big
shapes route through the scan path (use_pallas=False) — on a real TPU every
shape uses the compiled kernel.
"""

import argparse
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# covers: baseline, widest-C lane budgets (11 and 8 lane tiles), 2-lane C,
# stride-rule boundary (T=3000), stride>1 + polyphase (T=17984), longest
# stride-1 (T=2500), and the seq_len<=10 small-kernel FCN path
SUBSET = ("BasicMotions", "DuckDuckGeese", "PEMS-SF", "FaceDetection",
          "MotorImagery", "EigenWorms", "StandWalkJump", "PenDigits")


def run_one(name, dims, length, classes, use_pallas, batch_size=4):
    from sie_tpu.config import Config
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.train.experiment import Experiment

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        write_synthetic_uea(td, name, n_train=8, n_test=8, n_dims=dims,
                            length=length, n_classes=classes, seed=7)
        cfg = Config(
            data="UEA", data_root=td, dataset=name, model="InterpGN",
            dnn_type="FCN", num_shapelet=2, batch_size=batch_size,
            train_epochs=1, patience=2, log_interval=100, amp=False,
            use_pallas=use_pallas, seed=0,
            checkpoint_dir=os.path.join(td, "ckpt"),
            result_dir=os.path.join(td, "res"), cache_dir=os.path.join(td, "c"))
        exp = Experiment(cfg, verbose=False)
        assert exp.cfg.seq_len == length, (exp.cfg.seq_len, length)
        assert exp.cfg.enc_in == dims
        assert exp.cfg.num_class == classes
        exp.train()
        loss, metrics, _ = exp.test(save_csv=False)
    return {"loss": float(loss), "accuracy": metrics["accuracy"],
            "seconds": round(time.time() - t0, 1)}


def main():
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    ap = argparse.ArgumentParser()
    ap.add_argument("--subset", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    from sie_tpu.data.uea import UEA_30_DATASETS, UEA_DATASET_SHAPES
    on_tpu = jax.default_backend() == "tpu"
    names = SUBSET if args.subset else UEA_30_DATASETS
    rows = []
    for name in names:
        dims, length, classes = UEA_DATASET_SHAPES[name]
        if on_tpu:
            use_pallas = True
        else:
            # pallas-interpret on CPU is too slow for big shapes; scan path
            # still certifies model/data/trainer compile coverage there
            use_pallas = length * dims <= 20000 and length < 3000
        status = "ok"
        try:
            r = run_one(name, dims, length, classes, use_pallas)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            r = {"loss": float("nan"), "accuracy": float("nan"), "seconds": 0}
            status = f"FAIL: {type(e).__name__}: {e}"
        kernel = ("pallas" if use_pallas and on_tpu else
                  "pallas-interpret" if use_pallas else "scan")
        rows.append((name, dims, length, classes, kernel, status, r))
        print(f"{name:26s} C={dims:<5d} T={length:<6d} k={classes:<3d} "
              f"[{kernel}] {status} loss={r['loss']:.4f} "
              f"({r['seconds']}s)", flush=True)

    n_fail = sum(1 for row in rows if row[5] != "ok")
    print(f"\n{len(rows) - n_fail}/{len(rows)} shapes passed on "
          f"{jax.default_backend()}")
    if args.out:
        lines = [
            "# UEA archive shape-coverage sweep",
            "",
            f"Backend: {jax.default_backend()}; synthetic archives with the "
            "published (dims, length, classes) of each UEA dataset "
            "(`sie_tpu/data/uea.py:UEA_DATASET_SHAPES`); 1-epoch "
            "InterpGN+FCN smoke train + test each.",
            "",
            "| dataset | C | T | classes | kernel | status | time (s) |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, dims, length, classes, kernel, status, r in rows:
            lines.append(f"| {name} | {dims} | {length} | {classes} | "
                         f"{kernel} | {status} | {r['seconds']} |")
        lines.append("")
        lines.append(f"{len(rows) - n_fail}/{len(rows)} passed.")
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
