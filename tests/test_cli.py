"""CLI driver tests — flag parity and a full synthetic run through run.py."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run as run_cli  # noqa: E402


def test_flag_defaults_match_reference():
    args = run_cli.get_args([])
    # reference run.py defaults (run.py:71-135)
    assert args.model == "InterpGN"
    assert args.dnn_type == "Transformer"
    assert args.dataset == "BasicMotions"
    assert args.lambda_reg == 0.1 and args.lambda_div == 0.1
    assert args.epsilon == 1.0 and args.num_shapelet == 10
    assert args.lr == 5e-3 and args.batch_size == 64
    assert args.train_epochs == 500 and args.patience == 50
    assert args.d_model == 512 and args.n_heads == 8 and args.e_layers == 2
    assert args.d_ff == 2048 and args.dropout == 0
    assert args.amp is True
    assert args.seed == -1


def test_args_to_config_subject_parsing():
    args = run_cli.get_args(["--subject_ids", "sub-01,sub-02", "sub-03"])
    cfg = run_cli.args_to_config(args, seed=0)
    assert cfg.subject_ids == ("sub-01", "sub-02", "sub-03")


def test_mesh_flag_parsing():
    args = run_cli.get_args(["--mesh", "4x2"])
    cfg = run_cli.args_to_config(args, seed=0)
    assert cfg.mesh_shape == (4, 2)
    assert cfg.mesh_axes == ("data", "model")


def test_round3_flag_parsing():
    args = run_cli.get_args(["--mesh", "2x2x2",
                             "--mesh_axes", "data,seq,model",
                             "--stream_from_disk",
                             "--fused_attention_max_len", "0"])
    cfg = run_cli.args_to_config(args, seed=0)
    assert cfg.mesh_shape == (2, 2, 2)
    assert cfg.mesh_axes == ("data", "seq", "model")
    assert cfg.stream_from_disk is True
    assert cfg.fused_attention_max_len == 0


@pytest.mark.slow
def test_cli_end_to_end_synthetic_uea(tmp_path):
    from sie_tpu.data.synthetic import write_synthetic_uea
    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12, n_dims=2,
                        length=30, n_classes=2, seed=1)
    results = run_cli.main([
        "--data", "UEA", "--data_root", str(tmp_path), "--dataset", "Toy",
        "--model", "SBM", "--num_shapelet", "2", "--batch_size", "8",
        "--train_epochs", "2", "--patience", "3", "--seed", "0",
        "--no-amp", "--no_pallas",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--result_dir", str(tmp_path / "result"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    assert len(results) == 1
    seed, loss, metrics = results[0]
    assert np.isfinite(loss)
    assert "accuracy" in metrics
    # pickle + csv written
    found_pkl = any("test_results.pkl" in f for _, _, fs in
                    os.walk(tmp_path / "ckpt") for f in fs)
    assert found_pkl
    found_csv = any(f.endswith(".csv") for _, _, fs in
                    os.walk(tmp_path / "result") for f in fs)
    assert found_csv


@pytest.mark.slow
def test_cli_metrics_jsonl(tmp_path):
    """--metrics_jsonl appends one parseable record per epoch with the
    documented keys (machine-readable telemetry; beyond reference)."""
    import json
    from sie_tpu.data.synthetic import write_synthetic_uea
    write_synthetic_uea(str(tmp_path), "Toy", n_train=24, n_test=12, n_dims=2,
                        length=30, n_classes=2, seed=1)
    log = tmp_path / "logs" / "metrics.jsonl"
    run_cli.main([
        "--data", "UEA", "--data_root", str(tmp_path), "--dataset", "Toy",
        "--model", "SBM", "--num_shapelet", "2", "--batch_size", "8",
        "--train_epochs", "3", "--patience", "5", "--seed", "0",
        "--no-amp", "--no_pallas", "--metrics_jsonl", str(log),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--result_dir", str(tmp_path / "result"),
        "--cache_dir", str(tmp_path / "cache"),
    ])
    recs = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(recs) == 3
    for i, r in enumerate(recs):
        assert r["epoch"] == i and r["seed"] == 0
        for k in ("train_loss", "val_loss", "val_accuracy", "beta",
                  "seconds"):
            assert np.isfinite(r[k])
