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
    from sie_tpu.utils.relay import require_backend
    require_backend(what=__file__)  # fail fast if the relay is down
    mode = sys.argv[1] if len(sys.argv) > 1 else "blocked"
    {"blocked": cert_blocked, "moe": cert_moe,
     "autoformer": cert_autoformer, "quant": cert_quant,
     "ensemble": cert_ensemble}[mode]()
