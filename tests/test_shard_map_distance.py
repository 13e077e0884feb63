"""Explicit shard_map path for the shapelet distance over a device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sie_tpu.ops.shapelet import _l1_distance, sliding_distance
from sie_tpu.parallel.mesh import mesh_context
from sie_tpu.models.sbm import _mesh_aware_distance


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def test_shard_map_distance_matches_unsharded(rng, mesh):
    x = jnp.asarray(rng.normal(size=(8, 3, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 3, 6)).astype(np.float32))
    want = np.asarray(_l1_distance(x, s, 1))
    with mesh_context(mesh):
        got = jax.jit(lambda a, b: _mesh_aware_distance(a, b, 1, "euclidean",
                                                        False))(x, s)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    # output really is sharded over (data, model) — no silent skip: if the
    # sharding type ever loses .spec, fail loudly rather than not checking
    assert hasattr(got.sharding, "spec"), type(got.sharding)
    spec = got.sharding.spec
    assert spec[0] == "data" and spec[1] == "model"


def test_shard_map_distance_grad_matches(rng, mesh):
    x = jnp.asarray(rng.normal(size=(8, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 2, 5)).astype(np.float32))

    def loss_sharded(sv):
        with mesh_context(mesh):
            return jnp.sum(jnp.sin(_mesh_aware_distance(x, sv, 1, "euclidean",
                                                        False)))

    def loss_plain(sv):
        return jnp.sum(jnp.sin(_l1_distance(x, sv, 1)))

    g1 = jax.jit(jax.grad(loss_sharded))(s)
    g2 = jax.grad(loss_plain)(s)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_shard_map_falls_back_on_indivisible(rng, mesh):
    # batch 6 not divisible by dp=4, n=3 not divisible by mp=2 -> plain path
    x = jnp.asarray(rng.normal(size=(6, 2, 20)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 2, 4)).astype(np.float32))
    with mesh_context(mesh):
        got = _mesh_aware_distance(x, s, 1, "euclidean", False)
    want = _l1_distance(x, s, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_pallas_interpret_inside_shard_map(rng, mesh):
    """The Pallas kernel itself (interpret mode on CPU) under shard_map."""
    from sie_tpu.ops.pallas.shapelet_pallas import l1_sliding_distance

    x = jnp.asarray(rng.normal(size=(8, 2, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 2, 5)).astype(np.float32))

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    fn = shard_map(lambda a, b: l1_sliding_distance(a, b, 1, True),
                   mesh=mesh,
                   in_specs=(P("data", None, None), P("model", None, None)),
                   out_specs=P("data", "model", None, None),
                   check_vma=False)
    got = jax.jit(fn)(x, s)
    want = _l1_distance(x, s, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_full_training_with_shard_map_matches(rng, tmp_path):
    """InterpGN training on a (4,2) mesh (SBM via explicit shard_map) must
    match the single-device run."""
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
