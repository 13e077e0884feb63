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
