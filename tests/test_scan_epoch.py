"""Whole-epoch fused dispatch (cfg.scan_epoch, trainer.train_epoch_staged):
one lax.scan program over the HBM-staged step schedule must reproduce the
per-step staged loop — same per-step losses, same final parameters — and the
Experiment wiring must train to the same result end-to-end."""

import jax
import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.data.loader import ArrayDataset
from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.train.experiment import Experiment
from sie_tpu.train.trainer import Trainer


def _make(cfg_kw=None):
    cfg = Config(data="UEA", dataset="Toy", model="SBM", num_shapelet=2,
                 seq_len=24, enc_in=2, num_class=2, batch_size=8,
                 amp=False, use_pallas=False, seed=0, **(cfg_kw or {}))
    rng = np.random.default_rng(0)
    n = 24
    ds = ArrayDataset(
        x=rng.normal(size=(n, cfg.seq_len, cfg.enc_in)).astype(np.float32),
        y=rng.integers(0, cfg.num_class, n).astype(np.int32),
        padding_mask=np.ones((n, cfg.seq_len), np.float32))
    trainer = Trainer(cfg, steps_per_epoch=3)
    batch = (ds.x[:8], ds.y[:8], ds.padding_mask[:8], np.ones(8, np.float32))
    state = trainer.init_state(batch, seed=0)
    steps = [(np.arange(k * 8, (k + 1) * 8, dtype=np.int32),
              np.ones(8, np.float32)) for k in range(3)]
    return trainer, state, ds, steps


def test_scan_matches_per_step_loop():
    trainer, state0, ds, steps = _make()
    dev = trainer.device_data("t", ds)
    staged = trainer.stage_steps(steps, beta=0.5)

    # per-step staged loop
    state_a = state0
    losses_a = []
    for k in range(len(steps)):
        state_a, loss, _ = trainer.train_step_staged(state_a, dev, staged, k)
        losses_a.append(float(jax.device_get(loss)))

    # one fused dispatch from the same init (fresh trainer: state0 was
    # donated above)
    trainer_b, state_b0, _, _ = _make()
    dev_b = trainer_b.device_data("t", ds)
    staged_b = trainer_b.stage_steps(steps, beta=0.5)
    state_b, loss_arr = trainer_b.train_epoch_staged(state_b0, dev_b, staged_b)
    losses_b = np.asarray(jax.device_get(loss_arr))

    assert loss_arr.shape == (3,)
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_a.params)),
                    jax.tree.leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # the optimizer state advanced identically (step count + adam moments)
    assert int(jax.device_get(state_b.step)) == len(steps)


def test_scan_epoch_experiment_e2e(tmp_path):
    write_synthetic_uea(str(tmp_path / "data"), "Toy", n_train=16, n_test=8,
                        n_dims=2, length=24, n_classes=2, seed=13)
    root = str(tmp_path / "data")

    def make_cfg(name, flag):
        # InterpGN so the collect=True scanned eval carries the full
        # ModelInfo (eta/p/d/shapelet_preds/dnn_preds) through the stack
        return Config(data="UEA", data_root=root, dataset="Toy",
                      model="InterpGN", dnn_type="FCN",
                      num_shapelet=2, batch_size=8, train_epochs=3,
                      patience=50, log_interval=100, amp=False,
                      use_pallas=False, seed=0, scan_epoch=flag,
                      scan_eval=flag,
                      checkpoint_dir=str(tmp_path / name),
                      result_dir=str(tmp_path / name / "res"))

    # train ONCE (scanned path end-to-end: train + validation + test)
    exp_scan = Experiment(make_cfg("scan", True), verbose=False)
    exp_scan.train()
    loss_b, metrics_b, res_b = exp_scan.test(save_csv=False)

    # evaluate the SAME trained state through the per-batch path —
    # isolates the eval-path comparison from training-trajectory drift
    # (different XLA programs compound rounding over epochs)
    exp_loop = Experiment(make_cfg("loop", False), verbose=False)
    exp_loop.state = exp_scan.state
    loss_a, metrics_a, res_a = exp_loop.test(save_csv=False)

    assert loss_a == pytest.approx(loss_b, rel=1e-5)
    assert metrics_a["accuracy"] == pytest.approx(metrics_b["accuracy"])
    assert metrics_b["accuracy"] > metrics_b["random_baseline"]
    # the collected interpretability tensors must match between the
    # per-batch and the one-dispatch eval paths
    for field in ("eta", "p", "d", "shapelet_preds", "dnn_preds", "preds"):
        a, b = getattr(res_a, field), getattr(res_b, field)
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    # validation() agreement on the same state
    va = exp_loop.validation()
    vb = exp_scan.validation()
    assert va[0] == pytest.approx(vb[0], rel=1e-5)
    assert va[1] == pytest.approx(vb[1])


def test_no_scan_eval_wins_over_scan_epoch(tmp_path):
    """run.py contract: --no-scan_eval restores the per-batch validation
    path even when --scan_epoch is set (the flags gate independent
    surfaces: scan_epoch = fused train dispatch + scanned collect=True
    test(); scan_eval = scanned collect=False validation)."""
    write_synthetic_uea(str(tmp_path / "data"), "Toy", n_train=16, n_test=8,
                        n_dims=2, length=24, n_classes=2, seed=13)
    cfg = Config(data="UEA", data_root=str(tmp_path / "data"), dataset="Toy",
                 model="SBM", num_shapelet=2, batch_size=8, train_epochs=1,
                 patience=50, log_interval=100, amp=False, use_pallas=False,
                 seed=0, scan_epoch=True, scan_eval=False,
                 checkpoint_dir=str(tmp_path / "ck"),
                 result_dir=str(tmp_path / "ck" / "res"))
    exp = Experiment(cfg, verbose=False)
    exp.train()
    calls = []
    orig = exp.trainer.eval_epoch_staged_scan

    def spy(*args, **kw):
        calls.append(bool(kw.get("collect", False)))
        return orig(*args, **kw)

    exp.trainer.eval_epoch_staged_scan = spy
    exp.validation()                     # collect=False: must NOT scan
    assert calls == []
    exp.test(save_csv=False)             # collect=True: scans (scan_epoch)
    assert calls == [True]
