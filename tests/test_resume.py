"""Full-state resume: an interrupted run continued with resume=True must end
in exactly the same state as an uninterrupted run (optimizer moments and loop
position included)."""

import jax
import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.train.experiment import Experiment


def make_cfg(root, tmp, epochs, **kw):
    base = dict(data="UEA", data_root=root, dataset="Toy", model="SBM",
                num_shapelet=2, batch_size=8, train_epochs=epochs, patience=50,
                log_interval=100, amp=False, use_pallas=False, seed=0,
                checkpoint_dir=str(tmp), result_dir=str(tmp / "res"))
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_resume_bitwise_equal(tmp_path):
    write_synthetic_uea(str(tmp_path / "data"), "Toy", n_train=16, n_test=8,
                        n_dims=2, length=24, n_classes=2, seed=13)
    root = str(tmp_path / "data")

    # uninterrupted 4 epochs
    exp_a = Experiment(make_cfg(root, tmp_path / "a", 4), verbose=False)
    exp_a.train()
    params_a = jax.device_get(exp_a.state.params)

    # interrupted: 2 epochs with a snapshot, then resume to 4
    exp_b1 = Experiment(make_cfg(root, tmp_path / "b", 2), verbose=False)
    exp_b1.train(snapshot_every=1)
    exp_b2 = Experiment(make_cfg(root, tmp_path / "b", 4), verbose=False)
    exp_b2.train(resume=True)
    params_b = jax.device_get(exp_b2.state.params)

    flat_a = jax.tree.leaves(params_a)
    flat_b = jax.tree.leaves(params_b)
    for a, b in zip(flat_a, flat_b):
        # exact equality: on the deterministic CPU backend the interrupted and
        # uninterrupted runs must be BIT-identical — a tolerance here would
        # let a subtly-wrong optimizer-state restore pass
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
