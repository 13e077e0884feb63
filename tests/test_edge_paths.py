"""Edge-path coverage: long-sequence stride rule, regression via the CLI,
EEGCNN pooling variants."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sie_tpu.config import Config
from sie_tpu.models import build_model
from sie_tpu.ops.shapelet import shapelet_stride


def test_stride_rule():
    # reference Shapelet.py:162: stride 1 below 3000 steps, else log2(L)
    assert shapelet_stride(845, 676) == 1
    assert shapelet_stride(2999, 100) == 1
    assert shapelet_stride(3200, 160) == 7     # int(log2(160)) == 7
    assert shapelet_stride(5000, 3) == 1       # max(1, int(log2(3)))==1


def test_sbm_long_sequence_strided():
    """seq_len >= 3000 triggers strided windows end-to-end."""
    cfg = Config(model="SBM", seq_len=3200, enc_in=2, num_class=2,
                 num_shapelet=1, shapelet_lengths=(0.05, 0.1), amp=False,
                 use_pallas=False, dropout=0.0)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3200, 2))
    variables = model.init(jax.random.key(1), x, None, train=False)
    logits, info = model.apply(variables, x, None, train=False)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()
    # gradient through the strided path
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x, None,
                                               train=False)[0] ** 2))(
        variables["params"])
    assert np.isfinite(np.asarray(g["shapelets_0"])).all()


@pytest.mark.slow
def test_cli_regression_end_to_end(tmp_path):
    import run as run_cli
    from sie_tpu.data.synthetic import write_synthetic_monash

    write_synthetic_monash(str(tmp_path), "ToyReg", n_train=16, n_test=8,
                           n_dims=2, length=40, seed=4)
    results = run_cli.main([
        "--task_name", "regression", "--data", "Monash",
        "--data_root", str(tmp_path), "--dataset", "ToyReg",
        "--model", "SBM", "--num_shapelet", "2", "--batch_size", "8",
        "--train_epochs", "2", "--patience", "3", "--seed", "0",
        "--no-amp", "--no_pallas",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--result_dir", str(tmp_path / "result"),
        "--cache_dir", str(tmp_path / "cache")])
    seed, loss, _ = results[0]
    assert np.isfinite(loss)


@pytest.mark.parametrize("pooling", [None, "sum", "top"])
def test_eegcnn_pooling_variants(pooling):
    cfg = Config(model="EEGCNN", seq_len=100, enc_in=8, num_class=3,
                 eegcnn_pooling=pooling, eegcnn_kernel1=9, eegcnn_kernel2=5,
                 eegcnn_layers=0, amp=False, dropout=0.0)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 100, 8))
    variables = model.init(jax.random.key(1), x, None, train=False)
    logits, _ = model.apply(variables, x, None, train=False)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()
