"""Fused-attention Pallas kernel (ops/pallas/attention_pallas.py) vs the
naive XLA attention — forward, gradients, dropout semantics. Interpret mode
on CPU; the compiled path is certified on-chip by tests/test_flash_tpu.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sie_tpu.ops.pallas.attention_pallas import fused_attention


def naive_attention(q, k, v, scale, keep=None, rate=0.0):
    s = jnp.einsum("bld,bsd->bls", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    if q.dtype == jnp.bfloat16:
        s = s.astype(jnp.bfloat16).astype(jnp.float32)
    a = jax.nn.softmax(s * scale, axis=-1)
    if keep is not None:
        a = jnp.where(keep, a / (1.0 - rate), 0.0)
    return jnp.einsum("bls,bsd->bld", a.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def hash_keep_mask(shape_bh_t_tpad, rate, seed):
    """Reconstructs the kernel's counter-based dropout mask host-side
    (mirrors _dropout_mask: murmur3 finalizer over (seed, bh, global row,
    col) — block-size invariant by construction)."""
    bh, t, t_pad = shape_bh_t_tpad
    m = np.zeros((bh, t_pad, t_pad), bool)
    u = np.uint32
    with np.errstate(over="ignore"):
        for i in range(bh):
            row = np.arange(t_pad, dtype=np.uint32)[:, None] * u(0x27D4EB2F)
            col = np.arange(t_pad, dtype=np.uint32)[None, :]
            key = u(seed) * u(0x9E3779B9) ^ u(i) * u(0x85EBCA6B)
            x = (row + col) ^ key
            x = (x ^ (x >> u(16))) * u(0x85EBCA6B)
            x = (x ^ (x >> u(13))) * u(0xC2B2AE35)
            x = x ^ (x >> u(16))
            thresh = u(min(int(rate * 4294967296.0), 4294967295))
            m[i] = x >= thresh
    return m[:, :t, :t]


@pytest.mark.parametrize("t,dk", [(29, 16), (64, 32), (150, 64)])
def test_forward_matches_naive(t, dk):
    rng = np.random.default_rng(0)
    bh = 3
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, jnp.zeros((1,), jnp.int32), scale, 0.0)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


def test_gradients_match_naive():
    rng = np.random.default_rng(1)
    bh, t, dk = 2, 93, 32
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    seed = jnp.zeros((1,), jnp.int32)
    lf = lambda q, k, v: jnp.sum(
        jnp.sin(fused_attention(q, k, v, seed, scale, 0.0)))
    lr = lambda q, k, v: jnp.sum(jnp.sin(naive_attention(q, k, v, scale)))
    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_bf16_matches_naive_bf16():
    """bf16 path: scores rounded to bf16 like the torch-autocast bmm."""
    rng = np.random.default_rng(2)
    bh, t, dk = 2, 50, 16
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.bfloat16)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, jnp.zeros((1,), jnp.int32), scale, 0.0)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_dropout_keep_rate_and_grad():
    rng = np.random.default_rng(3)
    bh, t, dk = 2, 64, 16
    rate, seed_val = 0.3, 77
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    seed = jnp.array([seed_val], jnp.int32)
    keep = hash_keep_mask((bh, t, t), rate, seed_val)
    assert abs(keep.mean() - (1 - rate)) < 0.02  # Bernoulli(1-rate)

    out = fused_attention(q, k, v, seed, scale, rate)
    ref = naive_attention(q, k, v, scale, keep=jnp.asarray(keep), rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)

    lf = lambda q, k, v: jnp.sum(
        jnp.sin(fused_attention(q, k, v, seed, scale, rate)))
    lr = lambda q, k, v: jnp.sum(jnp.sin(
        naive_attention(q, k, v, scale, keep=jnp.asarray(keep), rate=rate)))
    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_padded_tail_is_exact():
    """T far from the 128-multiple: the padded keys must not leak into the
    softmax and padded-query garbage must not corrupt dK/dV."""
    rng = np.random.default_rng(4)
    bh, t, dk = 2, 130, 16   # pads to 136 sublane / 256 block
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 0.25
    seed = jnp.zeros((1,), jnp.int32)
    out = fused_attention(q, k, v, seed, scale, 0.0)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)
    gk = jax.grad(lambda k: jnp.sum(
        fused_attention(q, k, v, seed, scale, 0.0) ** 2))(k)
    gkr = jax.grad(lambda k: jnp.sum(naive_attention(q, k, v, scale) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gkr),
                               atol=5e-6, rtol=1e-4)


# ---------------------------------------------------------------------------
# kv-blocked online-softmax variant (T > 4096 in production; forced here via
# block_kv so the CPU interpreter exercises it at test sizes)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t,dk,blk", [(64, 16, 64), (150, 32, 64),
                                      (129, 16, 32)])
def test_blocked_forward_matches_naive(t, dk, blk):
    rng = np.random.default_rng(10)
    bh = 3
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, jnp.zeros((1,), jnp.int32), scale, 0.0,
                          block_kv=blk)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


def test_blocked_matches_full_row():
    """Same inputs through both variants: the blocked online softmax must
    reproduce the one-pass softmax (f32, rate=0) to float tolerance."""
    rng = np.random.default_rng(11)
    bh, t, dk = 2, 100, 16
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    seed = jnp.zeros((1,), jnp.int32)
    full = fused_attention(q, k, v, seed, 0.25, 0.0)
    blocked = fused_attention(q, k, v, seed, 0.25, 0.0, block_kv=32)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(full),
                               atol=2e-6, rtol=2e-5)


def test_blocked_gradients_match_naive():
    rng = np.random.default_rng(12)
    bh, t, dk = 2, 93, 32
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    seed = jnp.zeros((1,), jnp.int32)
    lf = lambda q, k, v: jnp.sum(jnp.sin(
        fused_attention(q, k, v, seed, scale, 0.0, block_kv=32)))
    lr = lambda q, k, v: jnp.sum(jnp.sin(naive_attention(q, k, v, scale)))
    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_blocked_dropout_matches_hash_mask():
    """The dropout mask is keyed on GLOBAL (row, col): the blocked variant
    must reproduce the same mask as the host-side reconstruction (and hence
    the full-row variant) regardless of block size — fwd AND grads."""
    rng = np.random.default_rng(13)
    bh, t, dk = 2, 64, 16
    rate, seed_val = 0.3, 77
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    seed = jnp.array([seed_val], jnp.int32)
    keep = hash_keep_mask((bh, t, t), rate, seed_val)
    out = fused_attention(q, k, v, seed, scale, rate, block_kv=32)
    ref = naive_attention(q, k, v, scale, keep=jnp.asarray(keep), rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)
    lf = lambda q, k, v: jnp.sum(jnp.sin(
        fused_attention(q, k, v, seed, scale, rate, block_kv=32)))
    lr = lambda q, k, v: jnp.sum(jnp.sin(
        naive_attention(q, k, v, scale, keep=jnp.asarray(keep), rate=rate)))
    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-4)


def test_blocked_bf16_sanity():
    rng = np.random.default_rng(14)
    bh, t, dk = 2, 50, 16
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.bfloat16)
               for _ in range(3))
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, jnp.zeros((1,), jnp.int32), scale, 0.0,
                          block_kv=32)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_blocked_gspmd_partitioning():
    """Sharded (B*H) under plain jit, blocked variant: partitions over the
    leading dim (lse rides along on its trailing dim) and matches the
    unsharded values — fwd and grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(15)
    bh, t, dk = 8, 40, 16
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    seed = jnp.zeros((1,), jnp.int32)
    want = fused_attention(q, k, v, seed, 0.25, 0.0, block_kv=16)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    sh = NamedSharding(mesh, P("data", None, None))
    qd, kd, vd = (jax.device_put(z, sh) for z in (q, k, v))
    got = jax.jit(lambda a, b, c: fused_attention(
        a, b, c, seed, 0.25, 0.0, block_kv=16))(qd, kd, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)
    assert got.sharding.spec[0] == "data", got.sharding
    gd = jax.jit(jax.grad(lambda a: jnp.sum(fused_attention(
        a, kd, vd, seed, 0.25, 0.0, block_kv=16) ** 2)))(qd)
    gw = jax.grad(lambda a: jnp.sum(fused_attention(
        a, k, v, seed, 0.25, 0.0, block_kv=16) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gw),
                               atol=1e-5, rtol=1e-4)


def test_gspmd_partitioning(rng):
    """Sharded (B*H) inputs under plain jit: the kernel must partition over
    the leading dim (not replicate+gather) and match the unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    bh, t, dk = 8, 40, 16
    q, k, v = (jnp.asarray(rng.normal(size=(bh, t, dk)), jnp.float32)
               for _ in range(3))
    seed = jnp.zeros((1,), jnp.int32)
    want = fused_attention(q, k, v, seed, 0.25, 0.0)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    sh = NamedSharding(mesh, P("data", None, None))
    qd, kd, vd = (jax.device_put(z, sh) for z in (q, k, v))
    got = jax.jit(lambda a, b, c: fused_attention(a, b, c, seed, 0.25, 0.0)
                  )(qd, kd, vd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)
    assert got.sharding.spec[0] == "data", got.sharding
    # gradients partition too (no cross-shard reductions for this op)
    gd = jax.jit(jax.grad(lambda a: jnp.sum(
        fused_attention(a, kd, vd, seed, 0.25, 0.0) ** 2)))(qd)
    gw = jax.grad(lambda a: jnp.sum(
        fused_attention(a, k, v, seed, 0.25, 0.0) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gw),
                               atol=1e-5, rtol=1e-4)


class TestFusedMinLenGate:
    """The short-T auto-gate (fused_min_len, r4): below the measured
    crossover the layer must dispatch to XLA attention even when
    use_fused=True, and Config.fused_attention_min_len must reach the
    layer through every construction path (the r4 review found the lab's
    fused variants silently measuring XLA twice)."""

    def _apply(self, min_len, t=32):
        from sie_tpu.models.layers import FullAttentionLayer
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, t, 16)),
                        jnp.float32)
        layer = FullAttentionLayer(16, 4, use_fused=True,
                                   fused_min_len=min_len)
        v = layer.init(jax.random.key(0), x, x, x)
        return layer.apply(v, x, x, x)

    def test_gate_flips_dispatch(self):
        # min_len=0 engages the Pallas kernel (interpret mode on CPU) —
        # bitwise-different from XLA but numerically equal
        gated = self._apply(256)    # T=32 < 256 -> XLA path
        forced = self._apply(0)     # kernel path
        np.testing.assert_allclose(np.asarray(gated), np.asarray(forced),
                                   atol=1e-4)

    def test_config_threads_to_encoder(self):
        # functional check: Config.fused_attention_min_len must reach the
        # attention layer inside the built Transformer — min_len<=T selects
        # the Pallas kernel (pallas_call in the jaxpr), the default gate
        # (256 > T=16) selects XLA; outputs stay numerically equal
        from sie_tpu.config import Config
        from sie_tpu.models import build_model
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 3)),
                        jnp.float32)
        mask = jnp.ones((2, 16), jnp.float32)
        outs, jaxprs = [], []
        for min_len in (7, 256):
            cfg = Config(model="DNN", dnn_type="Transformer", seq_len=16,
                         enc_in=3, num_class=2, d_model=16, d_ff=32,
                         n_heads=4, e_layers=1, use_fused_attention=True,
                         fused_attention_min_len=min_len)
            model = build_model(cfg)
            variables = model.init(jax.random.key(0), x, mask)
            fwd = lambda xx: model.apply(variables, xx, mask)[0]
            jaxprs.append(str(jax.make_jaxpr(fwd)(x)))
            outs.append(np.asarray(fwd(x)))
        assert "pallas" in jaxprs[0] and "pallas" not in jaxprs[1]
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)

    def test_cli_flag_reaches_config(self):
        import run
        cfg = run.args_to_config(run.get_args(
            ["--fused_attention_min_len", "0"]), seed=0)
        assert cfg.fused_attention_min_len == 0
