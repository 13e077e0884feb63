"""On-chip certification queue for the relay-blocked late-r3 items.

Run ONE mode per process (the axon relay accumulates executables;
CLAUDE.md):

    python scripts/onchip_cert.py blocked    # kv-blocked attention kernel:
                                             # compiled-path numerics + time
                                             # at T=8192 (NEXT_STEPS item)
    python scripts/onchip_cert.py moe        # MoE vs dense Transformer
                                             # train-step time, batch 64
    python scripts/onchip_cert.py autoformer # Autoformer-expert InterpGN
                                             # train step compiles + runs

Timing uses the fetch-based protocol (jax.block_until_ready does not wait
through the relay — docs/BENCH_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _sync(x):
    import jax
    return float(jax.device_get(jax.numpy.sum(x).astype(jax.numpy.float32)))


def _time(fn, *args, iters=10):
    import jax
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def cert_blocked():
    """Compiled kv-blocked online-softmax attention at T=8192: numerics vs
    the XLA einsum reference, fwd and fwd+bwd time vs XLA. The (blk, 1)
    lane-1 LSE output block is the Mosaic-compile risk to check."""
    import jax
    import jax.numpy as jnp
    from sie_tpu.ops.pallas.attention_pallas import fused_attention

    bh, t, dk = 8, 8192, 64
    scale = 1.0 / np.sqrt(dk)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.bfloat16)
               for _ in range(3))
    seed = jnp.zeros((1,), jnp.int32)

    fused = jax.jit(lambda q, k, v: fused_attention(q, k, v, seed, scale, 0.0))
    o_fused = jax.device_get(fused(q, k, v)).astype(np.float32)

    def xla_ref(q, k, v):
        s = jnp.einsum("ble,bse->bls", q, k).astype(jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bls,bsd->bld", a.astype(v.dtype), v)

    o_ref = jax.device_get(jax.jit(xla_ref)(q, k, v)).astype(np.float32)
    maxdiff = float(np.abs(o_fused - o_ref).max())
    print(f"[blocked] compiled maxdiff vs XLA: {maxdiff:.3e}")
    assert maxdiff < 3e-2, "blocked kernel numerics off"

    loss_fused = jax.jit(jax.grad(
        lambda q: jnp.sum(fused_attention(q, k, v, seed, scale,
                                          0.0).astype(jnp.float32) ** 2)))
    loss_xla = jax.jit(jax.grad(
        lambda q: jnp.sum(xla_ref(q, k, v).astype(jnp.float32) ** 2)))
    g_f = jax.device_get(loss_fused(q)).astype(np.float32)
    g_x = jax.device_get(loss_xla(q)).astype(np.float32)
    gd = float(np.abs(g_f - g_x).max() / max(np.abs(g_x).max(), 1e-6))
    print(f"[blocked] compiled grad rel-maxdiff vs XLA: {gd:.3e}")

    tf = _time(fused, q, k, v)
    tx = _time(jax.jit(xla_ref), q, k, v)
    tgf = _time(loss_fused, q)
    tgx = _time(loss_xla, q)
    print(f"[blocked] T=8192 fwd: fused {tf * 1e3:.2f} ms vs XLA "
          f"{tx * 1e3:.2f} ms | fwd+bwd: fused {tgf * 1e3:.2f} ms vs XLA "
          f"{tgx * 1e3:.2f} ms")
    print("[blocked] COMPILED PATH CERTIFIED")


def cert_moe():
    """MoE (E=8 top-1) vs dense Transformer DNN train step at batch 64."""
    from sie_tpu.config import Config
    from sie_tpu.train.trainer import Trainer
    import jax

    rng = np.random.default_rng(0)
    results = {}
    for tag, extra in (("dense", {}), ("moe8", dict(moe_experts=8))):
        cfg = Config(model="DNN", dnn_type="Transformer", data="EEG3",
                     seq_len=845, enc_in=122, num_class=3, d_model=512,
                     d_ff=2048, n_heads=8, e_layers=2, batch_size=64,
                     dropout=0.1, amp=True, use_pallas=True, seed=0, **extra)
        batch = (rng.normal(size=(64, 845, 122)).astype(np.float32),
                 rng.integers(0, 3, 64).astype(np.int32),
                 np.ones((64, 845), np.float32),
                 np.ones((64,), np.float32))
        tr = Trainer(cfg, steps_per_epoch=1)
        st = tr.init_state(batch, seed=0)
        # stage the batch in HBM once — the per-step 26 MB host upload
        # otherwise dominates both sides of the dense/MoE comparison
        import jax.numpy as jnp
        batch_dev = tuple(jnp.asarray(b) for b in batch)

        def step(st):
            st, loss, _ = tr.train_step(st, batch_dev, beta=0.0)
            return st, loss

        st, loss = step(st)
        _ = float(jax.device_get(loss))
        t0 = time.perf_counter()
        for _ in range(10):
            st, loss = step(st)
        _ = float(jax.device_get(loss))
        dt = (time.perf_counter() - t0) / 10
        results[tag] = dt
        print(f"[moe] {tag}: {dt * 1e3:.1f} ms/step "
              f"({64 / dt:.0f} samples/s)")
    print(f"[moe] overhead vs dense: "
          f"{(results['moe8'] / results['dense'] - 1) * 100:.1f}%")


def cert_autoformer():
    """InterpGN with the Autoformer deep expert: one on-chip train step."""
    from sie_tpu.config import Config
    from sie_tpu.train.trainer import Trainer
    import jax

    rng = np.random.default_rng(0)
    cfg = Config(model="InterpGN", dnn_type="Autoformer", data="EEG3",
                 seq_len=845, enc_in=122, num_class=3, d_model=128,
                 d_ff=256, n_heads=8, e_layers=2, num_shapelet=10,
                 batch_size=16, dropout=0.1, amp=True, use_pallas=True,
                 seed=0)
    batch = (rng.normal(size=(16, 845, 122)).astype(np.float32),
             rng.integers(0, 3, 16).astype(np.int32),
             np.ones((16, 845), np.float32),
             np.ones((16,), np.float32))
    tr = Trainer(cfg, steps_per_epoch=1)
    st = tr.init_state(batch, seed=0)
    st, loss, _ = tr.train_step(st, batch, beta=1.0)
    lv = float(jax.device_get(loss))
    assert np.isfinite(lv), lv
    print(f"[autoformer] on-chip InterpGN+Autoformer step OK, loss {lv:.4f}")


def cert_quant():
    """int8 weight-only quantized serving vs f32, flagship-ish shape:
    predict latency (batch 64, bucket-warm), device weight bytes, and
    class agreement. NEXT_STEPS 'quantized-serving HBM numbers'."""
    import tempfile

    import jax
    from sie_tpu.config import Config
    from sie_tpu.models.registry import build_model
    from sie_tpu.serve import Predictor

    cfg = Config(model="InterpGN", dnn_type="Transformer", data="EEG3",
                 seq_len=845, enc_in=122, num_class=3, d_model=512,
                 d_ff=2048, n_heads=8, e_layers=2, num_shapelet=10,
                 dropout=0.0, amp=True, use_pallas=True, seed=0)
    rng = np.random.default_rng(0)
    model = build_model(cfg)
    x0 = np.zeros((2, cfg.seq_len, cfg.enc_in), np.float32)
    variables = model.init(jax.random.key(0), x0, np.ones((2, cfg.seq_len),
                                                          np.float32))
    variables = jax.device_get(variables)

    x = rng.normal(size=(64, cfg.seq_len, cfg.enc_in)).astype(np.float32)

    def dev_bytes(p):
        return sum(a.nbytes for a in jax.tree.leaves(p.variables))

    with tempfile.TemporaryDirectory() as d:
        base = Predictor(cfg, variables)
        base.save_bundle(d + "/f32")
        base.save_bundle(d + "/q", quantize=True)
        pf = Predictor.load_bundle(d + "/f32")
        pq = Predictor.load_bundle(d + "/q")
        import os as _os
        sz = lambda p: sum(_os.path.getsize(_os.path.join(p, f))
                           for f in _os.listdir(p))
        print(f"[quant] bundle bytes: f32 {sz(d + '/f32'):,} -> "
              f"int8 {sz(d + '/q'):,}")
        print(f"[quant] device weight bytes: f32 {dev_bytes(pf):,} -> "
              f"int8 {dev_bytes(pq):,}")
        rf = pf.predict(x)
        rq = pq.predict(x)
        agree = float(np.mean(rf.classes == rq.classes))
        pdiff = float(np.abs(rf.probs - rq.probs).max())
        print(f"[quant] class agreement {agree:.3f}, prob maxdiff {pdiff:.4f}")
        tf = _time(lambda: pf.predict(x).logits, iters=10)
        tq = _time(lambda: pq.predict(x).logits, iters=10)
        print(f"[quant] predict(64): f32 {tf * 1e3:.1f} ms, "
              f"int8 {tq * 1e3:.1f} ms")
    print("[quant] QUANTIZED SERVING CERTIFIED")


def cert_39(argv):
    """39-class CHISCO-scale LOSO certification, repeatable (VERDICT r4
    item 7): the r4 cert protocol — synthetic CHISCO generator at full
    width (122 ch x 845 t, Zipf-imbalanced 39 classes, 2000 trials over 5
    subjects), batch 64, seed 0 — pinned as a script mode with the model /
    lr / warmup as knobs so the r5 lr-sweep rows are reproducible
    artifacts. Appends one row per run to docs/cert39.json.

    Examples:
        python scripts/onchip_cert.py cert39 --model InterpGN \
            --dnn_type Transformer --lr 5e-4 --lr_warmup_epochs 2
        python scripts/onchip_cert.py cert39 --model EEGCNN --folds 2
    """
    import argparse
    import json
    import time as _time

    ap = argparse.ArgumentParser(prog="onchip_cert.py cert39")
    ap.add_argument("--model", default="InterpGN",
                    choices=["InterpGN", "SBM", "LTS", "DNN", "EEGCNN"])
    ap.add_argument("--dnn_type", default="Transformer")
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--lr_warmup_epochs", type=float, default=0.0)
    ap.add_argument("--lr_decay", action="store_true")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--patience", type=int, default=6)
    ap.add_argument("--folds", type=int, default=5,
                    help="LOSO folds to run (of 5 subjects); fewer = quick "
                         "sweep point, 5 = full cert")
    ap.add_argument("--num_shapelet", type=int, default=10)
    ap.add_argument("--lambda_reg", type=float, default=0.1)
    ap.add_argument("--lambda_div", type=float, default=0.1)
    ap.add_argument("--beta_schedule", default="constant")
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--tag", default="")
    # scale knobs (defaults = the r4 cert protocol; shrink only for smokes)
    ap.add_argument("--synthetic_trials", type=int, default=2000)
    ap.add_argument("--max_subjects", type=int, default=5)
    ap.add_argument("--target_channels", type=int, default=122)
    ap.add_argument("--target_timepoints", type=int, default=1651)
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--d_ff", type=int, default=2048)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import run as run_cli
    from sie_tpu.parallel.loso import run_loso

    # pin the r4 cert protocol via the public CLI surface so every knob a
    # user would set is the knob this cert sets (BENCH_NOTES "39-class")
    argv_cli = ["--data", "EEG", "--loso",
                "--synthetic_trials", str(args.synthetic_trials),
                "--max_subjects", str(args.max_subjects),
                "--target_channels", str(args.target_channels),
                "--target_timepoints", str(args.target_timepoints),
                "--d_model", str(args.d_model), "--d_ff", str(args.d_ff),
                "--batch_size", "64", "--seed", "0",
                "--model", args.model, "--dnn_type", args.dnn_type,
                "--lr", str(args.lr),
                "--lr_warmup_epochs", str(args.lr_warmup_epochs),
                "--train_epochs", str(args.epochs),
                "--patience", str(args.patience),
                "--num_shapelet", str(args.num_shapelet),
                "--lambda_reg", str(args.lambda_reg),
                "--lambda_div", str(args.lambda_div),
                "--beta_schedule", args.beta_schedule,
                "--top_k", str(args.top_k),
                "--checkpoint_dir", "/tmp/cert39_ckpt",
                "--result_dir", "/tmp/cert39_result"]
    if args.lr_decay:
        argv_cli.append("--lr_decay")
    cli = run_cli.get_args(argv_cli)
    cfg = run_cli.args_to_config(cli, seed=0)

    t0 = time.perf_counter()
    fold_results = run_loso(cfg, fold_slice=slice(0, args.folds))
    wall_s = time.perf_counter() - t0
    accs = [r["accuracy"] for r in fold_results]
    row = {"tag": args.tag or f"{args.model}+{args.dnn_type}",
           "model": args.model, "dnn_type": args.dnn_type,
           "lr": args.lr, "lr_warmup_epochs": args.lr_warmup_epochs,
           "lr_decay": args.lr_decay, "epochs": args.epochs,
           "patience": args.patience, "folds": args.folds,
           "num_shapelet": args.num_shapelet,
           "beta_schedule": args.beta_schedule,
           "accuracy_mean": float(np.mean(accs)),
           "accuracy_std": float(np.std(accs)),
           "per_fold": [float(a) for a in accs],
           "random_baseline": 100.0 / 39,
           "wall_s": round(wall_s, 1),
           "when": _time.strftime("%Y-%m-%d %H:%M:%S")}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "cert39.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[cert39] {row['tag']} lr {args.lr:g} warmup "
          f"{args.lr_warmup_epochs:g}: {row['accuracy_mean']:.2f} +/- "
          f"{row['accuracy_std']:.2f} over {args.folds} folds "
          f"(baseline 2.56) in {wall_s:.0f}s -> appended to {path}")


def jnp_sum(x):
    import jax.numpy as jnp
    return jnp.sum(x)


def cert_ensemble():
    """Vectorized 5-seed training vs 1 seed on the flagship config: the
    vmapped program should train 5 seeds for far less than 5x single-seed
    wall time (weight-stationary reuse across the seed axis; the claim in
    train/ensemble.py, previously CPU-verified only)."""
    import jax
    from sie_tpu.config import Config
    from sie_tpu.train.ensemble import EnsembleTrainer

    rng = np.random.default_rng(0)
    cfg = Config(model="InterpGN", dnn_type="Transformer", data="EEG3",
                 seq_len=845, enc_in=122, num_class=3, d_model=512,
                 d_ff=2048, n_heads=8, e_layers=2, num_shapelet=10,
                 batch_size=64, dropout=0.1, amp=True, use_pallas=True,
                 seed=0)
    batch = (rng.normal(size=(64, 845, 122)).astype(np.float32),
             rng.integers(0, 3, 64).astype(np.int32),
             np.ones((64, 845), np.float32),
             np.ones((64,), np.float32))
    results = {}
    for seeds in ((0,), (0, 42, 1234, 8237, 2023)):
        tr = EnsembleTrainer(cfg, steps_per_epoch=1, seeds=seeds)
        st = tr.init_states(batch)
        # stage the stacked batch in HBM ONCE: a per-step host re-upload
        # (26 MB/seed through the ~30 MB/s relay) would swamp the compute
        # being compared (first run measured 1350 ms/step at 1 seed vs the
        # 136 ms staged flagship step)
        import jax.numpy as jnp
        stacked = tuple(jnp.asarray(np.broadcast_to(b, (len(seeds),)
                                                    + b.shape))
                        for b in batch)
        jax.block_until_ready(stacked)

        def step(st):
            st, loss, _ = tr.train_step(st, stacked, beta=1.0)
            return st, loss

        st, loss = step(st)
        _ = float(jax.device_get(jnp_sum(loss)))
        t0 = time.perf_counter()
        for _ in range(10):
            st, loss = step(st)
        _ = float(jax.device_get(jnp_sum(loss)))
        dt = (time.perf_counter() - t0) / 10
        results[len(seeds)] = dt
        print(f"[ensemble] {len(seeds)} seed(s): {dt * 1e3:.1f} ms/step "
              f"({len(seeds) * 64 / dt:.0f} samples/s)")
    print(f"[ensemble] 5-seed cost vs 5x single: "
          f"{results[5] / (5 * results[1]) * 100:.0f}% "
          "(1-seed baseline runs through the same vmapped/lax.map "
          "program, so the wrapper overhead cancels in this ratio)")


if __name__ == "__main__":
    if "--cpu" in sys.argv:       # CPU smoke: pin jax before any backend
        sys.argv.remove("--cpu")  # init (the sitecustomize overrides the
        import jax                # JAX_PLATFORMS env var)
        jax.config.update("jax_platforms", "cpu")
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    mode = sys.argv[1] if len(sys.argv) > 1 else "blocked"
    if mode == "cert39":
        cert_39(sys.argv[2:])
    else:
        {"blocked": cert_blocked, "moe": cert_moe,
         "autoformer": cert_autoformer, "quant": cert_quant,
         "ensemble": cert_ensemble}[mode]()
