"""Mesh-parallel tests on the 8-device virtual CPU backend."""

import jax
import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.parallel.mesh import make_mesh, params_partition_specs
from sie_tpu.train.experiment import Experiment


@pytest.fixture(scope="module")
def uea_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("uea_par")
    write_synthetic_uea(str(root), "Toy", n_train=32, n_test=16, n_dims=3,
                        length=40, n_classes=2, seed=7)
    return str(root)


def par_cfg(uea_root, tmp_path, mesh_shape, **kw):
    base = dict(data="UEA", data_root=uea_root, dataset="Toy",
                model="InterpGN", dnn_type="Transformer", num_shapelet=2,
                d_model=16, d_ff=32, n_heads=2, e_layers=1,
                batch_size=8, train_epochs=2, patience=5, log_interval=100,
                seed=0, amp=False, use_pallas=False, mesh_shape=mesh_shape,
                checkpoint_dir=str(tmp_path / "ckpt"),
                result_dir=str(tmp_path / "res"))
    base.update(kw)
    return Config(**base)


def test_make_mesh_shapes():
    assert jax.device_count() == 8
    cfg = Config(mesh_shape=(4, 2))
    mesh = make_mesh(cfg)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    assert make_mesh(Config(mesh_shape=())) is None


def test_partition_specs_rules(uea_root, tmp_path):
    cfg = par_cfg(uea_root, tmp_path, (2, 2))
    mesh = make_mesh(cfg)
    exp = Experiment(cfg, mesh=mesh, verbose=False)
    exp._init_state()
    specs = params_partition_specs(jax.device_get(exp.state.params), mesh)
    sbm = specs["sbm"]
    assert sbm["shapelets_0"] == jax.sharding.PartitionSpec("model", None, None)
    assert sbm["output_layer"]["kernel"] == jax.sharding.PartitionSpec("model", None)


@pytest.mark.slow
def test_dp_training_matches_single_device(uea_root, tmp_path):
    """Data-parallel sharded training must produce the same numbers as the
    single-device run (identical batches, deterministic ops)."""
    cfg1 = par_cfg(uea_root, tmp_path / "a", ())
    exp1 = Experiment(cfg1, verbose=False)
    exp1.train()
    _, m1, _ = exp1.test(save_csv=False)

    cfg2 = par_cfg(uea_root, tmp_path / "b", (8,))
    mesh = make_mesh(cfg2)
    exp2 = Experiment(cfg2, mesh=mesh, verbose=False)
    exp2.train()
    _, m2, _ = exp2.test(save_csv=False)
    assert abs(m1["accuracy"] - m2["accuracy"]) < 1e-6
    assert abs(m1["loss"] - m2["loss"]) < 5e-4


@pytest.mark.slow
def test_dp_mp_training_runs(uea_root, tmp_path):
    cfg = par_cfg(uea_root, tmp_path, (4, 2))
    mesh = make_mesh(cfg)
    exp = Experiment(cfg, mesh=mesh, verbose=False)
    exp.train()
    loss, metrics, _ = exp.test(save_csv=False)
    assert np.isfinite(loss)


def test_seq_sharded_batch_specs():
    """With a 'seq' mesh axis, shard_batch puts time (axis 1) of rank>=2
    tensors on it; rank-1 tensors stay data-only."""
    from sie_tpu.parallel.mesh import shard_batch
    cfg = Config(mesh_shape=(2, 2, 2), mesh_axes=("data", "seq", "model"))
    mesh = make_mesh(cfg)
    batch = (np.zeros((8, 40, 3), np.float32),
             np.zeros((8,), np.int32),
             np.ones((8, 40), np.float32),
             np.ones((8,), np.float32))
    x, y, mask, w = shard_batch(batch, mesh)
    P = jax.sharding.PartitionSpec
    assert x.sharding.spec == P("data", "seq", None)
    assert mask.sharding.spec == P("data", "seq")
    assert y.sharding.spec == P("data") and w.sharding.spec == P("data")


@pytest.mark.slow
def test_seq_parallel_training_matches_single_device(uea_root, tmp_path,
                                                     monkeypatch):
    """dp x sp x tp (2,2,2) mesh: time-sharded activations between the
    kernels' all-gather seams must reproduce the single-device numbers
    (sequence parallelism is layout, not math). T=40 is NOT divisible by
    the 2-way seq axis — exercises GSPMD's uneven-shard padding too. The
    Pallas shapelet kernel runs (interpret mode) in BOTH runs so its
    custom_partitioning sees the seq-sharded operands."""
    monkeypatch.setenv("SIE_TPU_PALLAS_INTERPRET", "1")
    cfg1 = par_cfg(uea_root, tmp_path / "a", (), use_pallas=True)
    exp1 = Experiment(cfg1, verbose=False)
    exp1.train()
    _, m1, _ = exp1.test(save_csv=False)

    cfg2 = par_cfg(uea_root, tmp_path / "b", (2, 2, 2),
                   mesh_axes=("data", "seq", "model"), use_pallas=True)
    mesh = make_mesh(cfg2)
    assert mesh.axis_names == ("data", "seq", "model")
    exp2 = Experiment(cfg2, mesh=mesh, verbose=False)
    exp2.train()
    _, m2, _ = exp2.test(save_csv=False)
    assert abs(m1["accuracy"] - m2["accuracy"]) < 1e-6
    assert abs(m1["loss"] - m2["loss"]) < 5e-4


@pytest.mark.slow
def test_loso_fold_parallel(tmp_path):
    """LOSO folds as a mapped axis: each fold trains with a different held-out
    subject; here just assert the driver produces one result per subject."""
    from sie_tpu.parallel.loso import run_loso
    cfg = Config(data="EEG3", data_root=str(tmp_path / "none"),
                 cache_dir=str(tmp_path / "cache"), model="SBM",
                 num_shapelet=2, batch_size=8, train_epochs=1, patience=2,
                 target_channels=8, target_timepoints=120, amp=False,
                 use_pallas=False, seed=0, log_interval=100,
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 result_dir=str(tmp_path / "res"))
    results = run_loso(cfg, n_subjects=2, synthetic=True, verbose=False)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r["accuracy"])
