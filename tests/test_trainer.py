"""End-to-end training tests on synthetic data (the minimum end-to-end slice
from SURVEY.md SS7: .ts load -> collate -> SBM/InterpGN -> jitted train loop ->
early stopping -> accuracy + CSV)."""

import numpy as np
import pytest

from sie_tpu.config import Config
from sie_tpu.data.synthetic import write_synthetic_uea
from sie_tpu.train.experiment import Experiment
from sie_tpu.train.trainer import compute_beta


@pytest.fixture(scope="module")
def uea_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("uea")
    write_synthetic_uea(str(root), "Toy", n_train=32, n_test=16, n_dims=3,
                        length=40, n_classes=2, seed=7)
    return str(root)


def small_cfg(uea_root, tmp_path, **kw):
    base = dict(data="UEA", data_root=uea_root, dataset="Toy",
                model="SBM", dnn_type="FCN", num_shapelet=3,
                shapelet_lengths=(0.1, 0.3),  # 2 banks: compile cost, not coverage
                batch_size=8, train_epochs=8, patience=10, log_interval=100,
                lr=5e-3, seed=0, amp=False, use_pallas=False,
                checkpoint_dir=str(tmp_path / "ckpt"),
                result_dir=str(tmp_path / "result"))
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_sbm_learns_toy_problem(uea_root, tmp_path):
    # full 6-bank capacity: this test certifies LEARNING, not just running
    # (2 banks plateau at ~56% on this toy problem)
    cfg = small_cfg(uea_root, tmp_path,
                    shapelet_lengths=(0.05, 0.1, 0.2, 0.3, 0.5, 0.8))
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, res = exp.test(save_csv=True)
    assert metrics["accuracy"] > 60.0  # well above the 50% baseline
    # CSV summary written with the interpretability stats
    assert "w_gini_abs" in res.summary.columns
    assert "shapelet_score" in res.summary.columns
    assert exp.has_checkpoint()


def test_checkpoint_roundtrip(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, train_epochs=2, seed=1)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    _, m1, _ = exp.test(save_csv=False)

    exp2 = Experiment(cfg, verbose=False)
    assert exp2.load_checkpoint()
    _, m2, _ = exp2.test(save_csv=False)
    assert abs(m1["accuracy"] - m2["accuracy"]) < 1e-9


def test_interpgn_trains(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, model="InterpGN", dnn_type="FCN",
                    train_epochs=3, beta_schedule="cosine", seed=2)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, res = exp.test(save_csv=False)
    assert np.isfinite(loss)
    assert res.eta is not None
    # viz smoke on a REAL trained result (not a synthetic bundle): the full
    # explanation + t-SNE path the reference exercises by hand from the
    # pickled results (utils/shapelet_util.py:44-195)
    from sie_tpu.utils.shapelet_util import plot_tsne, visualize_shapelets
    visualize_shapelets(res, sample_idx=0, top_k=3,
                        save_path=str(tmp_path / "explain.png"))
    plot_tsne(res.p, res.trues, save_path=str(tmp_path / "tsne.png"))
    assert (tmp_path / "explain.png").exists()
    assert (tmp_path / "tsne.png").exists()


def test_dnn_trains(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, model="DNN", dnn_type="FCN",
                    train_epochs=3, seed=3)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, _ = exp.test(save_csv=False)
    assert np.isfinite(loss)


def test_pos_weight_clamps(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, pos_weight=True, train_epochs=2, seed=4)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    import jax
    kernel = np.asarray(jax.device_get(
        exp.state.params)["output_layer"]["kernel"])
    assert (kernel >= 0).all()


def test_grad_accumulation_runs(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, gradient_accumulation_steps=2,
                    gradient_clip=1.0, train_epochs=2, seed=5)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, _ = exp.test(save_csv=False)
    assert np.isfinite(loss)


def test_compute_beta_schedules():
    assert compute_beta(0, 10, "cosine") == 1.0
    assert abs(compute_beta(10, 10, "cosine")) < 1e-9
    assert compute_beta(5, 10, "linear") == 0.5
    assert compute_beta(7, 10, "constant") == 1.0


def test_lr_warmup_schedule(uea_root, tmp_path):
    """Linear warmup ramps the effective lr over the first N epochs and is
    composable with lr_decay; with warmup off the schedule is untouched."""
    import jax.numpy as jnp

    from sie_tpu.train.trainer import make_optimizer

    def lr_at(cfg, step):
        # probe the schedule through a unit-gradient adam step is overkill;
        # re-derive the schedule the way make_optimizer builds it by
        # inspecting the hyperparams via inject — instead just rebuild it
        tx = make_optimizer(cfg, steps_per_epoch=4)
        del tx  # construction must not raise
        accum = max(cfg.gradient_accumulation_steps, 1)
        opt_spe = max(-(-4 // accum), 1)
        base = cfg.lr
        if cfg.lr_decay:
            epoch = step // opt_spe
            base = cfg.lr * 0.5 * (1 + np.cos(np.pi * epoch / cfg.train_epochs))
        if cfg.lr_warmup_epochs > 0:
            warm = max(int(cfg.lr_warmup_epochs * opt_spe), 1)
            base = base * min((step + 1) / warm, 1.0)
        return base

    # behavioral check: warmup actually scales the first update vs no-warmup
    cfg_w = small_cfg(uea_root, tmp_path, lr_warmup_epochs=2.0,
                      train_epochs=4)
    cfg_0 = small_cfg(uea_root, tmp_path, train_epochs=4)
    tx_w = make_optimizer(cfg_w, steps_per_epoch=4)
    tx_0 = make_optimizer(cfg_0, steps_per_epoch=4)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    sw = tx_w.init(params)
    s0 = tx_0.init(params)
    up_w, _ = tx_w.update(grads, sw, params)
    up_0, _ = tx_0.update(grads, s0, params)
    # first warmup step: lr scaled by 1/warmup_steps = 1/8
    ratio = float(jnp.abs(up_w["w"][0]) / jnp.abs(up_0["w"][0]))
    assert abs(ratio - 1.0 / 8.0) < 1e-4, ratio
    assert abs(lr_at(cfg_w, 100) - cfg_w.lr) < 1e-12  # ramp done


def test_lr_warmup_trains(uea_root, tmp_path):
    cfg = small_cfg(uea_root, tmp_path, lr_warmup_epochs=1.0, train_epochs=2)
    exp = Experiment(cfg, verbose=False)
    exp.train()
    loss, metrics, _ = exp.test(save_csv=False)
    assert np.isfinite(loss)
