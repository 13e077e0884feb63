"""GSPMD partitioning of the Pallas shapelet distance (custom_partitioning,
VERDICT r2 item 5): sharded inputs under plain jit — no Trainer-owned mesh
context, no explicit shard_map — must match the unsharded op bit-for-bit
(fwd) / to psum-reorder tolerance (grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sie_tpu.ops.shapelet import _l1_distance
from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _sharded(mesh, x, s):
    xd = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    sd = jax.device_put(s, NamedSharding(mesh, P("model", None, None)))
    return xd, sd


def test_gspmd_distance_matches_unsharded(rng, mesh):
    x = jnp.asarray(rng.normal(size=(8, 3, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    want = np.asarray(l1_sliding_distance(x, s, 1))
    np.testing.assert_allclose(want, np.asarray(_l1_distance(x, s, 1)),
                               rtol=1e-5, atol=1e-6)
    xd, sd = _sharded(mesh, x, s)
    got = jax.jit(lambda a, b: l1_sliding_distance(a, b, 1))(xd, sd)
    # bitwise: each shard runs the identical kernel on its block
    np.testing.assert_array_equal(np.asarray(got), want)
    # the output must actually BE sharded over (data, model) — if the
    # partitioner fell back to replicate+gather this catches it
    assert hasattr(got.sharding, "spec"), type(got.sharding)
    spec = got.sharding.spec
    assert spec[0] == "data" and spec[1] == "model", spec


def test_gspmd_distance_grad_matches(rng, mesh):
    x = jnp.asarray(rng.normal(size=(8, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 2, 5)).astype(np.float32))
    xd, sd = _sharded(mesh, x, s)

    loss = lambda xv, sv: jnp.sum(jnp.sin(l1_sliding_distance(xv, sv, 1)))
    g1 = jax.jit(jax.grad(loss, argnums=1))(xd, sd)
    g2 = jax.grad(lambda sv: jnp.sum(jnp.sin(_l1_distance(x, sv, 1))))(s)
    # psum over data shards reorders the f32 summation -> tolerance not equal
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_gspmd_partial_sharding(rng, mesh):
    """Replicated x + model-sharded s (an indivisible batch cannot even be
    device_put over 'data'; the fixed-shape Batcher guarantees divisible
    batches in the training path) — the kernel partitions over n alone."""
    x = jnp.asarray(rng.normal(size=(6, 2, 20)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 2, 4)).astype(np.float32))
    xd = jax.device_put(x, NamedSharding(mesh, P(None, None, None)))
    sd = jax.device_put(s, NamedSharding(mesh, P("model", None, None)))
    got = jax.jit(lambda a, b: l1_sliding_distance(a, b, 1))(xd, sd)
    want = _l1_distance(x, s, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_apply_with_sharded_params_outside_trainer(rng, mesh):
    """The round-2 sharp edge, now fixed: calling model.apply with sharded
    params OUTSIDE any trainer context partitions the kernel correctly."""
    from sie_tpu.config import Config
    from sie_tpu.models.sbm import ShapeBottleneckModel
    from sie_tpu.parallel.mesh import shard_params

    cfg = Config(data="UEA", dataset="toy", model="SBM", seq_len=32, enc_in=4,
                 num_class=2, num_shapelet=2, shapelet_lengths=(0.1, 0.3),
                 amp=False, use_pallas=True, seed=0)
    import os
    os.environ["SIE_TPU_PALLAS_INTERPRET"] = "1"
    try:
        model = ShapeBottleneckModel(cfg)
        x = jnp.asarray(rng.normal(size=(8, 32, 4)).astype(np.float32))
        v = model.init(jax.random.key(0), x)
        out_plain, _ = model.apply(v, x)
        vs = {"params": shard_params(v["params"], mesh)}
        xd = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        out_sharded, _ = jax.jit(model.apply)(vs, xd)
        np.testing.assert_allclose(np.asarray(out_sharded),
                                   np.asarray(out_plain), rtol=1e-5,
                                   atol=1e-5)
    finally:
        os.environ.pop("SIE_TPU_PALLAS_INTERPRET", None)


@pytest.mark.slow
def test_full_training_on_mesh_matches(rng, tmp_path):
    """SBM training on a (4,2) mesh (kernel partitioned by GSPMD) must match
    the single-device run."""
    from sie_tpu.config import Config
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.parallel.mesh import make_mesh
    from sie_tpu.train.experiment import Experiment

    write_synthetic_uea(str(tmp_path / "d"), "Toy", n_train=16, n_test=8,
                        n_dims=2, length=24, n_classes=2, seed=21)
    base = dict(data="UEA", data_root=str(tmp_path / "d"), dataset="Toy",
                model="SBM", num_shapelet=2, batch_size=8, train_epochs=2,
                patience=5, log_interval=100, amp=False, use_pallas=False,
                seed=0, result_dir=str(tmp_path / "r"))
    cfg1 = Config(checkpoint_dir=str(tmp_path / "c1"), **base)
    exp1 = Experiment(cfg1, verbose=False)
    exp1.train()
    _, m1, _ = exp1.test(save_csv=False)

    cfg2 = Config(checkpoint_dir=str(tmp_path / "c2"), mesh_shape=(4, 2), **base)
    mesh = make_mesh(cfg2)
    exp2 = Experiment(cfg2, mesh=mesh, verbose=False)
    exp2.train()
    _, m2, _ = exp2.test(save_csv=False)
    assert abs(m1["accuracy"] - m2["accuracy"]) < 1e-6
    assert abs(m1["loss"] - m2["loss"]) < 5e-4
