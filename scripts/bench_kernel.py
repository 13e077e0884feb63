#!/usr/bin/env python
"""Shapelet-kernel decomposition benchmark on CHISCO shapes (batch 64 x 122 ch
x 845 steps, 6 banks x 10 shapelets).

Usage: python scripts/bench_kernel.py <mode> [iters]
Modes (run each in its OWN process — the axon relay accumulates executables and
eventually hits RESOURCE_EXHAUSTED):
  fwd         kernel-only forward, 6 banks
  fwdbwd      kernel fwd+bwd through an STE-max loss
  pred        full SBM predicates fwd+bwd (instance norm + RBF + STE max + min)
  sbm_step    full SBM-only jitted train step
  step        full InterpGN (Transformer) jitted train step
  dnn_step    Transformer-backbone-only jitted train step
  step_sq / sbm_step_sq   same with --distance_func sqeuclidean (the
              reference's memory-efficient metric, MXU conv decomposition)

Timing protocol (CLAUDE.md): chain ITERS dependent iterations, force a host
fetch of a dependent scalar, subtract nothing (fetch ~30 ms amortizes over the
chain).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ_LEN, ENC_IN, NUM_CLASS, BATCH, NSH = 845, 122, 3, 64, 10
FRACS = (0.05, 0.1, 0.2, 0.3, 0.5, 0.8)


def _banks(rng):
    import jax.numpy as jnp
    lengths = [max(3, int(np.ceil(f * SEQ_LEN))) for f in FRACS]
    return [jnp.asarray(rng.normal(size=(NSH, ENC_IN, L)).astype(np.float32))
            for L in lengths]


def time_chain(fn, state, iters):
    import jax
    state = fn(state)
    jax.block_until_ready(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    _sync(state)
    return (time.perf_counter() - t0) / iters


def _sync(state):
    import jax
    leaf = jax.tree.leaves(state)[0]
    float(jax.device_get(leaf.reshape(-1)[0]))


def bench_kernel(mode: str, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    from sie_tpu.ops.shapelet import rbf, sliding_distance, ste_max
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, ENC_IN, SEQ_LEN)).astype(np.float32))
    banks = _banks(rng)

    if mode == "fwd":
        @jax.jit
        def run(carry):
            x, banks = carry
            tot = 0.0
            for b in banks:
                d = sliding_distance(x, b, 1, "euclidean", use_pallas=True)
                tot = tot + jnp.mean(d)
            # chain dependency: nudge x by the scalar
            return (x + tot * 1e-12, banks)
    elif mode == "fwdbwd":
        def loss(banks, x):
            tot = 0.0
            for b in banks:
                d = sliding_distance(x, b, 1, "euclidean", use_pallas=True)
                p = ste_max(rbf(d, 1.0), axis=-1)
                tot = tot + jnp.mean(p)
            return tot

        grad = jax.grad(loss)

        @jax.jit
        def run(carry):
            x, banks = carry
            gs = grad(banks, x)
            banks = [b - 1e-9 * g for b, g in zip(banks, gs)]
            return (x, banks)
    else:
        raise ValueError(mode)

    dt = time_chain(run, (x, banks), iters)
    return dt


def bench_model(mode: str, iters: int) -> float:
    import jax
    from sie_tpu.config import Config
    from sie_tpu.data.loader import ArrayDataset
    from sie_tpu.train.trainer import Trainer

    # '_sq' suffix: same step with distance_func='sqeuclidean' — the
    # reference's own memory-efficient distance semantics (Shapelet.py:28),
    # which decomposes into MXU convs instead of the VPU-bound L1 kernel
    # (VERDICT r4 item 3: is the MXU path faster than the L1 roofline?)
    distance_func = "euclidean"
    if mode.endswith("_sq"):
        distance_func, mode = "sqeuclidean", mode[:-3]
    model = {"sbm_step": "SBM", "step": "InterpGN"}.get(mode, "DNN")
    e_layers = {"dnn_step0": 0, "dnn_step1": 1}.get(mode, 2)
    dnn = {"timesnet_step": "TimesNet", "patchtst_step": "PatchTST",
           "resnet_step": "ResNet", "fcn_step": "FCN"}.get(mode, "Transformer")
    # TimesNet at the run.py default width (512/2048) is ~130 TFLOP per
    # Inception pass BY CONSTRUCTION (286 taps == the reference's Conv2d
    # flops) — bench it at the TSlib-typical classification width instead.
    d_model, d_ff = (32, 32) if dnn == "TimesNet" else (512, 2048)
    cfg = Config(data="EEG3", model=model, dnn_type=dnn,
                 seq_len=SEQ_LEN, enc_in=ENC_IN, num_class=NUM_CLASS,
                 num_shapelet=NSH, d_model=d_model, d_ff=d_ff, n_heads=8,
                 e_layers=e_layers, batch_size=BATCH, dropout=0.0, amp=True,
                 use_flash_attention=(mode == "dnn_flash"),
                 top_k=5, num_kernels=6, distance_func=distance_func,
                 use_pallas=True, seed=0)
    rng = np.random.default_rng(0)
    n = 2 * BATCH
    ds = ArrayDataset(x=rng.normal(size=(n, SEQ_LEN, ENC_IN)).astype(np.float32),
                      y=rng.integers(0, NUM_CLASS, n).astype(np.int32),
                      padding_mask=np.ones((n, SEQ_LEN), np.float32))
    batch = (ds.x[:BATCH], ds.y[:BATCH], ds.padding_mask[:BATCH],
             np.ones((BATCH,), np.float32))
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state(batch, seed=0)
    dev = trainer.device_data("bench", ds)
    w = np.ones((BATCH,), np.float32)
    idx = np.arange(BATCH, dtype=np.int32)
    import jax
    for _ in range(3):
        state, loss, _ = trainer.train_step_indexed(state, dev, idx, w, 1.0)
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = trainer.train_step_indexed(state, dev, idx, w, 1.0)
    float(jax.device_get(loss))
    return (time.perf_counter() - t0) / iters


def bench_pred(iters: int) -> float:
    import jax
    import jax.numpy as jnp
    from sie_tpu.config import Config
    from sie_tpu.models.sbm import ShapeBottleneckModel

    cfg = Config(data="EEG3", model="SBM", seq_len=SEQ_LEN, enc_in=ENC_IN,
                 num_class=NUM_CLASS, num_shapelet=NSH, dropout=0.0, amp=True,
                 use_pallas=True, seed=0)
    model = ShapeBottleneckModel(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, SEQ_LEN, ENC_IN)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, None, train=False)

    def loss_fn(params, x):
        p, d = model.apply({"params": params}, x, method=model.predicates)
        return jnp.mean(p) + jnp.mean(d)

    grad = jax.jit(jax.grad(loss_fn))

    @jax.jit
    def run(carry):
        params, x = carry
        g = grad(params, x)
        params = jax.tree.map(lambda a, b: a - 1e-9 * b, params, g)
        return (params, x)

    return time_chain(run, (variables["params"], x), iters)


def bench_per_bank(iters: int):
    """Forward time of each bank's kernel alone (separate jits, one process —
    shapes differ so executables don't alias)."""
    import jax
    import jax.numpy as jnp
    from sie_tpu.ops.shapelet import sliding_distance
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, ENC_IN, SEQ_LEN)).astype(np.float32))
    for bi, bank in enumerate(_banks(rng)):
        @jax.jit
        def run(carry, bank=bank):
            x, b = carry
            d = sliding_distance(x, b, 1, "euclidean", use_pallas=True)
            return (x + jnp.mean(d) * 1e-12, b)
        dt = time_chain(run, (x, bank), iters)
        l = bank.shape[-1]
        w = SEQ_LEN - l + 1
        gflop = 3 * BATCH * NSH * ENC_IN * w * l / 1e9
        print(f"  bank{bi} L={l} W={w}: {dt * 1e3:.2f} ms "
              f"({gflop / dt / 1e3:.2f} TFLOP/s)")


def main():
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    mode = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    if mode == "banks":
        bench_per_bank(iters)
        return
    if mode in ("fwd", "fwdbwd"):
        dt = bench_kernel(mode, iters)
    elif mode == "pred":
        dt = bench_pred(iters)
    else:
        dt = bench_model(mode, iters)
    print(f"{mode}: {dt * 1e3:.1f} ms  ({BATCH / dt:.1f} samples/s)")


if __name__ == "__main__":
    main()
