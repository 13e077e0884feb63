"""GPipe pipeline executor (sie_tpu/parallel/pipeline.py) on the 8-device
virtual CPU mesh: forward + gradients must reproduce the sequential Encoder
(pipelining is a schedule, not math), composing with a data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sie_tpu.config import Config
from sie_tpu.models.layers import Encoder
from sie_tpu.parallel.pipeline import (gpipe, pipelined_encoder_apply,
                                       stack_stage_params)


def _encoder_setup(e_layers=4, d_model=16, seed=0):
    cfg = Config(d_model=d_model, d_ff=32, n_heads=2, e_layers=e_layers,
                 dropout=0.0, amp=False)
    enc = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                  cfg.dropout, cfg.activation)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(8, 12, d_model)), jnp.float32)
    params = enc.init(jax.random.key(seed), x, train=False)["params"]
    return cfg, enc, params, x


def test_stack_stage_params_layout():
    _, _, params, _ = _encoder_setup(e_layers=4)
    layers = [params[f"layer_{i}"] for i in range(4)]
    stacked = stack_stage_params(layers, n_stages=2)
    k = stacked["norm1"]["scale"]
    assert k.shape[:2] == (2, 2)   # (S, L/S, ...)
    np.testing.assert_array_equal(np.asarray(k[1, 0]),
                                  np.asarray(layers[2]["norm1"]["scale"]))
    with pytest.raises(ValueError):
        stack_stage_params(layers, n_stages=3)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    cfg, enc, params, x = _encoder_setup(e_layers=4)
    want = enc.apply({"params": params}, x, train=False)
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("pipe",))
    got = pipelined_encoder_apply(cfg, params, x, mesh,
                                  n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_composes_with_data_parallel():
    cfg, enc, params, x = _encoder_setup(e_layers=4)
    want = enc.apply({"params": params}, x, train=False)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "pipe"))
    got = jax.jit(lambda p, x: pipelined_encoder_apply(
        cfg, p, x, mesh, n_microbatches=2, data_axis="data"))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    """Reverse-mode AD through scan + ppermute = the backward pipeline;
    grads wrt input AND all layer params must match the sequential stack."""
    cfg, enc, params, x = _encoder_setup(e_layers=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))

    def loss_seq(params, x):
        return jnp.sum(jnp.sin(enc.apply({"params": params}, x,
                                         train=False)))

    def loss_pipe(params, x):
        return jnp.sum(jnp.sin(pipelined_encoder_apply(
            cfg, params, x, mesh, n_microbatches=4)))

    gs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    gp = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_pipeline_rejects_bad_splits():
    cfg, _, params, x = _encoder_setup(e_layers=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError, match="microbatch"):
        pipelined_encoder_apply(cfg, params, x, mesh, n_microbatches=3)


def test_pipelined_moe_encoder_matches_sequential():
    """MoE encoder params run under the pipeline executor (stage layers
    carry the moe_* fields); output equals the sequential Encoder apply."""
    import numpy as np
    from jax.sharding import Mesh
    from sie_tpu.config import Config
    from sie_tpu.models.layers import Encoder
    from sie_tpu.parallel.pipeline import pipelined_encoder_apply

    cfg = Config(d_model=16, d_ff=32, n_heads=2, e_layers=2, dropout=0.0,
                 amp=False, moe_experts=4, moe_top_k=1,
                 use_fused_attention=False)
    enc = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                  cfg.dropout, cfg.activation,
                  moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(4, 8, cfg.d_model)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x, train=False)
    y_seq = enc.apply(variables, x, train=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pipe",))
    y_pipe = pipelined_encoder_apply(cfg, variables["params"], x, mesh,
                                     n_microbatches=2)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_seq),
                               atol=1e-5)


def _moe_setup(n_micro=2, batch=4):
    from sie_tpu.models.layers import Encoder

    cfg = Config(d_model=16, d_ff=32, n_heads=2, e_layers=2, dropout=0.0,
                 amp=False, moe_experts=4, moe_top_k=1,
                 use_fused_attention=False)
    enc = Encoder(cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.e_layers,
                  cfg.dropout, cfg.activation,
                  moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(batch, 8, cfg.d_model)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x, train=False)
    return cfg, enc, variables, x


def test_pipelined_moe_train_without_aux_raises():
    """Training a MoE stack through the pipeline must NOT silently drop the
    router's load-balance loss (VERDICT r3 item 5)."""
    cfg, _, variables, x = _moe_setup()
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    with pytest.raises(ValueError, match="load-balance"):
        pipelined_encoder_apply(cfg, variables["params"], x, mesh,
                                n_microbatches=2, train=True)


def test_pipelined_moe_aux_matches_per_microbatch_sum():
    """return_aux=True threads the sown MoE aux through the schedule: the
    collected scalar equals the mean over microbatches of the sequential
    encoder's per-microbatch sown-loss sum (bubble ticks masked out)."""
    cfg, enc, variables, x = _moe_setup(n_micro=2, batch=4)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    y_pipe, aux = pipelined_encoder_apply(
        cfg, variables["params"], x, mesh, n_microbatches=2, train=True,
        return_aux=True)

    # expected: sequential encoder on each microbatch with a mutable
    # 'losses' collection; sow accumulates across the 2 MoE layers
    expected = []
    y_seq = []
    for mb in (x[:2], x[2:]):
        y, mut = enc.apply(variables, mb, train=True, mutable=["losses"])
        y_seq.append(y)
        expected.append(sum(float(jnp.sum(s))
                            for s in jax.tree.leaves(mut["losses"])))
    np.testing.assert_allclose(float(aux), np.mean(expected), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y_pipe),
                               np.concatenate([np.asarray(v) for v in y_seq]),
                               atol=1e-5)
