#!/usr/bin/env python
"""A/B the whole-epoch fused dispatch (--scan_epoch) against the per-step
staged loop on the real chip. One variant per process (the relay
accumulates executables); chained-fetch timing protocol (CLAUDE.md).

Usage: python scripts/scan_epoch_lab.py <model> <variant> [steps] [epochs]
  model:   eegcnn | ign          (CHISCO shapes, batch 64)
  variant: loop | scan | eval_loop | eval_scan
  steps:   steps per epoch (default 20)
  epochs:  timed epochs (default 3; median reported)

loop/scan time the TRAINING epoch; eval_* time a full validation pass
(the per-batch eval path pays ~4 device round trips per batch; the
scanned pass is one dispatch + one fetch).
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
    model = sys.argv[1] if len(sys.argv) > 1 else "eegcnn"
    variant = sys.argv[2] if len(sys.argv) > 2 else "loop"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    n_epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    if n_steps < 1 or n_epochs < 1:
        raise SystemExit("steps and epochs must be >= 1")

    import jax
    from sie_tpu.config import Config
    from sie_tpu.data.loader import ArrayDataset
    from sie_tpu.train.trainer import Trainer

    kw = dict(data="EEG3", seq_len=SEQ_LEN, enc_in=ENC_IN,
              num_class=NUM_CLASS, batch_size=BATCH, amp=True, seed=0,
              use_pallas=jax.default_backend() == "tpu")
    if model == "eegcnn":
        cfg = Config(model="EEGCNN", **kw)
    else:
        cfg = Config(model="InterpGN", dnn_type="Transformer",
                     num_shapelet=10, d_model=512, d_ff=2048, n_heads=8,
                     e_layers=2, dropout=0.0, **kw)
    rng = np.random.default_rng(0)
    n = 2 * BATCH
    ds = ArrayDataset(
        x=rng.normal(size=(n, SEQ_LEN, ENC_IN)).astype(np.float32),
        y=rng.integers(0, NUM_CLASS, n).astype(np.int32),
        padding_mask=np.ones((n, SEQ_LEN), np.float32))
    batch = (ds.x[:BATCH], ds.y[:BATCH], ds.padding_mask[:BATCH],
             np.ones((BATCH,), np.float32))
    trainer = Trainer(cfg, steps_per_epoch=n_steps)
    state = trainer.init_state(batch, seed=0)
    dev = trainer.device_data("lab", ds)
    w = np.ones((BATCH,), np.float32)
    steps = [(rng.integers(0, n, BATCH).astype(np.int32), w)
             for _ in range(n_steps)]
    staged = trainer.stage_steps(steps, 1.0)
    print(f"[lab] {model}/{variant}: compiling ...", file=sys.stderr,
          flush=True)

    if variant == "loop":
        def epoch():
            nonlocal state
            for k in range(n_steps):
                state, loss, _ = trainer.train_step_staged(
                    state, dev, staged, k)
            return float(jax.device_get(loss))
    elif variant == "scan":
        def epoch():
            nonlocal state
            state, losses = trainer.train_epoch_staged(state, dev, staged)
            return float(jax.device_get(losses[-1]))
    elif variant == "eval_loop":
        def epoch():
            tot = 0.0
            for k in range(n_steps):
                logits, info = trainer.eval_step_staged(state, dev, staged, k)
                # mirror Experiment._eval_loader's per-batch host work:
                # logits fetch + CE round trip + model-loss fetch
                lg = np.asarray(jax.device_get(logits))
                import optax
                import jax.numpy as jnp
                ce = np.asarray(jax.device_get(
                    optax.softmax_cross_entropy_with_integer_labels(
                        jnp.asarray(lg), jnp.asarray(ds.y[:BATCH]))))
                ml = (float(jax.device_get(info.loss).mean())
                      if info.loss is not None else 0.0)
                tot += float(ce.mean()) + ml
            return tot
    elif variant == "eval_scan":
        def epoch():
            out = trainer.eval_epoch_staged_scan(state, dev, staged)
            logits, ce, mloss, _ = jax.device_get(out)
            return float(np.mean(ce) + np.mean(mloss))
    else:
        raise SystemExit(f"unknown variant {variant!r}")

    val = epoch()  # compile + warm
    print(f"[lab] warm value {val:.4f}; timing ...", file=sys.stderr,
          flush=True)
    reps = []
    for _ in range(n_epochs):
        t0 = time.perf_counter()
        epoch()
        reps.append(time.perf_counter() - t0)
    dt = float(np.median(reps))
    print(f"{model}/{variant}: {dt * 1e3:.1f} ms/epoch of {n_steps} steps "
          f"= {dt * 1e3 / n_steps:.2f} ms/step "
          f"(reps {[round(r * 1e3, 1) for r in reps]}) "
          f"on {jax.default_backend()}")


if __name__ == "__main__":
    main()
