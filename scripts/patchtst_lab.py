#!/usr/bin/env python
"""PatchTST step-time lab (VERDICT r3 item 3: attack the 599.9 ms step).

One variant per process (the relay accumulates executables); timing uses the
chained-fetch protocol (CLAUDE.md). The workload is the BENCH_NOTES backbone
row: DNN/PatchTST train step, B=64, T=845, C=122 (channel-independent rows
B*C=7808, patch_num=105), d_model=512, d_ff=2048, e_layers=2, bf16 (amp).

Variants:
  baseline          current defaults (chunk 2048 + in-chunk remat; at T=105
                    the fused_min_len=256 auto-gate selects XLA attention)
  fused             force the Pallas attention kernel (fused_min_len=0) —
                    the r3 default this lab measured the crossover against
  chunk<k>          patch_chunk_rows=k (k >= 7808 disables chunking AND remat)
  xla_attn          fused attention kernel off entirely (same program as
                    baseline at this shape; kept for gate-bypass A/B)
  chunk<k>_xla      both

Usage: python scripts/patchtst_lab.py <variant> [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_LEN, ENC_IN, NUM_CLASS, BATCH = 845, 122, 3, 64


def main():
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    chunk = 0
    fused = True
    min_len = 256                     # Config default (auto-gate)
    eval_only = False
    for part in variant.split("_"):
        if part.startswith("chunk"):
            chunk = int(part[len("chunk"):])
        elif part == "xla":
            fused = False
        elif part == "fused":
            min_len = 0               # bypass the auto-gate: kernel at T=105
        elif part == "eval":
            eval_only = True          # fwd-only inference step (decompose)
        elif part in ("baseline", "attn"):
            pass
        else:
            raise SystemExit(f"unknown variant part {part!r}")

    import jax
    from sie_tpu.config import Config
    from sie_tpu.data.loader import ArrayDataset
    from sie_tpu.train.trainer import Trainer

    cfg = Config(data="EEG3", model="DNN", dnn_type="PatchTST",
                 seq_len=SEQ_LEN, enc_in=ENC_IN, num_class=NUM_CLASS,
                 d_model=512, d_ff=2048, n_heads=8, e_layers=2,
                 batch_size=BATCH, dropout=0.0, amp=True, seed=0,
                 use_pallas=True, use_fused_attention=fused,
                 fused_attention_min_len=min_len,
                 patch_chunk_rows=chunk)
    rng = np.random.default_rng(0)
    n = 2 * BATCH
    ds = ArrayDataset(
        x=rng.normal(size=(n, SEQ_LEN, ENC_IN)).astype(np.float32),
        y=rng.integers(0, NUM_CLASS, n).astype(np.int32),
        padding_mask=np.ones((n, SEQ_LEN), np.float32))
    batch = (ds.x[:BATCH], ds.y[:BATCH], ds.padding_mask[:BATCH],
             np.ones((BATCH,), np.float32))
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state(batch, seed=0)
    dev = trainer.device_data("lab", ds)
    w = np.ones((BATCH,), np.float32)
    idx = np.arange(BATCH, dtype=np.int32)
    staged = trainer.stage_steps([(idx, w)] * iters, 1.0)
    print(f"[lab] {variant}: compiling ...", file=sys.stderr, flush=True)

    if eval_only:
        def do(i):
            logits, _ = trainer.eval_step_staged(state, dev, staged, i)
            return logits
        sync = lambda out: float(jax.device_get(out[0, 0]))
    else:
        def do(i):
            nonlocal state
            state, loss, _ = trainer.train_step_staged(state, dev, staged, i)
            return loss
        sync = lambda out: float(jax.device_get(out))

    for _ in range(3):
        out = do(0)
    print(f"[lab] warm sync {sync(out):.4f}; timing ...",
          file=sys.stderr, flush=True)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = do(i)
        sync(out)
        reps.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(reps))
    print(f"{variant}: {dt * 1e3:.1f} ms/step "
          f"({BATCH / dt:.1f} samples/s; reps "
          f"{[round(r * 1e3, 1) for r in reps]}) on {jax.default_backend()}")


if __name__ == "__main__":
    main()
