"""Vectorized multi-seed training (train/ensemble.py): per-seed trajectory
equality with sequential Trainer runs, early-stop freezing, eval shapes."""

import numpy as np
import pytest

import jax

from sie_tpu.config import Config
from sie_tpu.train.ensemble import EnsembleTrainer, stack_seed_batches
from sie_tpu.train.trainer import Trainer


SEEDS = (0, 42, 7)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(model="SBM", data="UEA", seq_len=20, enc_in=3, num_class=2,
                 num_shapelet=2, batch_size=6, dropout=0.0, amp=False,
                 use_pallas=False, lr=1e-2, seed=0)
    rng = np.random.default_rng(3)
    n = 24
    y = rng.integers(0, 2, n).astype(np.int32)
    x = (rng.normal(size=(n, cfg.seq_len, cfg.enc_in))
         + 1.5 * y[:, None, None]).astype(np.float32)
    mask = np.ones((n, cfg.seq_len), np.float32)
    return cfg, x, y, mask


def _seed_batches(x, y, mask, seed, n_steps, bs):
    """Deterministic per-seed shuffles."""
    rng = np.random.default_rng(seed + 100)
    out = []
    for _ in range(n_steps):
        idx = rng.choice(len(x), bs, replace=False)
        out.append((idx, np.ones(bs, np.float32)))
    return out


def test_matches_sequential_trainer(setup):
    cfg, x, y, mask = setup
    n_steps = 6
    et = EnsembleTrainer(cfg, steps_per_epoch=n_steps, seeds=SEEDS)
    sample = (x[:cfg.batch_size], y[:cfg.batch_size],
              mask[:cfg.batch_size], np.ones(cfg.batch_size, np.float32))
    states = et.init_states(sample)

    schedules = {s: _seed_batches(x, y, mask, s, n_steps, cfg.batch_size)
                 for s in SEEDS}
    vec_losses = []
    for k in range(n_steps):
        batches = stack_seed_batches(
            [schedules[s][k] for s in SEEDS], x, y, mask)
        states, loss, _ = et.train_step(states, batches, beta=1.0)
        vec_losses.append(np.asarray(loss))
    vec_losses = np.stack(vec_losses)            # (steps, N)

    for i, s in enumerate(SEEDS):
        tr = Trainer(cfg.replace(seed=s), steps_per_epoch=n_steps)
        st = tr.init_state(sample, seed=s)
        for k in range(n_steps):
            idx, w = schedules[s][k]
            st, loss, _ = tr.train_step(
                st, (x[idx], y[idx], mask[idx], w), beta=1.0)
            assert float(loss) == pytest.approx(
                float(vec_losses[k, i]), abs=2e-4), (s, k)
        # end-state params equal too
        pv = jax.tree.map(lambda a, i=i: np.asarray(a)[i], states.params)
        np.testing.assert_allclose(
            np.concatenate([np.ravel(a) for a in jax.tree.leaves(pv)]),
            np.concatenate([np.ravel(np.asarray(a))
                            for a in jax.tree.leaves(st.params)]),
            atol=5e-4)


def test_alive_mask_freezes_stopped_seeds(setup):
    cfg, x, y, mask = setup
    et = EnsembleTrainer(cfg, steps_per_epoch=4, seeds=SEEDS)
    sample = (x[:cfg.batch_size], y[:cfg.batch_size],
              mask[:cfg.batch_size], np.ones(cfg.batch_size, np.float32))
    states = et.init_states(sample)
    batches = stack_seed_batches(
        [_seed_batches(x, y, mask, s, 1, cfg.batch_size)[0] for s in SEEDS],
        x, y, mask)
    states, _, _ = et.train_step(states, batches, beta=1.0)
    frozen = jax.tree.map(lambda a: np.asarray(a)[0].copy(), states.params)
    alive = np.array([0.0, 1.0, 1.0], np.float32)
    states, _, _ = et.train_step(states, batches, beta=1.0, alive=alive)
    after0 = jax.tree.map(lambda a: np.asarray(a)[0], states.params)
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(after0)):
        np.testing.assert_array_equal(a, b)      # seed 0 untouched
    # alive seeds keep moving: step counter advanced for everyone, and at
    # least one seed-1 leaf differs from its own pre-step value
    assert states.step.tolist() == [2, 2, 2]


def test_eval_step_shapes(setup):
    cfg, x, y, mask = setup
    et = EnsembleTrainer(cfg, steps_per_epoch=1, seeds=SEEDS)
    sample = (x[:4], y[:4], mask[:4], np.ones(4, np.float32))
    states = et.init_states(sample)
    logits, info = et.eval_step(states, sample)
    assert logits.shape == (len(SEEDS), 4, cfg.num_class)
    assert np.isfinite(np.asarray(logits)).all()


def test_alive_mask_freezes_batch_stats():
    """BatchNorm running stats must also freeze for stopped seeds (FCN has
    batch_stats; params-only freezing would let eval drift)."""
    cfg = Config(model="DNN", dnn_type="FCN", data="UEA", seq_len=16,
                 enc_in=3, num_class=2, batch_size=4, dropout=0.0,
                 amp=False, use_pallas=False, seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16, 3)).astype(np.float32)
    y = rng.integers(0, 2, 8).astype(np.int32)
    mask = np.ones((8, 16), np.float32)
    et = EnsembleTrainer(cfg, steps_per_epoch=1, seeds=(0, 1))
    sample = (x[:4], y[:4], mask[:4], np.ones(4, np.float32))
    states = et.init_states(sample)
    batches = (np.stack([x[:4], x[4:]]), np.stack([y[:4], y[4:]]),
               np.stack([mask[:4], mask[4:]]),
               np.ones((2, 4), np.float32))
    states, _, _ = et.train_step(states, batches, beta=0.0)
    stats_before = jax.tree.map(lambda a: np.asarray(a)[0].copy(),
                                states.batch_stats)
    states, _, _ = et.train_step(states, batches, beta=0.0,
                                 alive=np.array([0.0, 1.0], np.float32))
    stats_after = jax.tree.map(lambda a: np.asarray(a)[0],
                               states.batch_stats)
    for a, b in zip(jax.tree.leaves(stats_before),
                    jax.tree.leaves(stats_after)):
        np.testing.assert_array_equal(a, b)


def test_eval_step_gating_values_not_conflated(setup):
    """Programs cache per gating_value — a second gating value must not
    silently reuse the first compiled closure."""
    cfg, x, y, mask = setup
    cfg = cfg.replace(model="InterpGN", dnn_type="FCN", d_model=8)
    et = EnsembleTrainer(cfg, steps_per_epoch=1, seeds=(0, 1))
    sample = (x[:4], y[:4], mask[:4], np.ones(4, np.float32))
    states = et.init_states(sample)
    l_none, _ = et.eval_step(states, sample)
    l_gate, _ = et.eval_step(states, sample, gating_value=0.0)
    assert set(et._eval_step.keys()) == {None, 0.0}
    # tau=0.0 hard-gates every sample to SBM-only logits — must differ from
    # the blended (gating None) output for a random-init InterpGN
    assert np.abs(np.asarray(l_none) - np.asarray(l_gate)).max() > 1e-6


@pytest.mark.slow
def test_ensemble_driver_end_to_end(tmp_path):
    """Full vectorized multi-seed experiment on a separable synthetic UEA
    set: per-seed results, early stopping, vectorized test pass."""
    from sie_tpu.data.synthetic import write_synthetic_uea
    from sie_tpu.train.ensemble_driver import run_ensemble_experiment

    write_synthetic_uea(str(tmp_path), "Toy", n_train=32, n_test=16,
                        n_dims=2, length=24, n_classes=2, seed=5)
    cfg = Config(data="UEA", data_root=str(tmp_path), dataset="Toy",
                 model="InterpGN", dnn_type="FCN", num_shapelet=2,
                 batch_size=8, train_epochs=8, patience=3, min_epochs=0,
                 dropout=0.0, amp=False, use_pallas=False, lr=5e-3,
                 log_interval=100, seed=0, cache_dir=str(tmp_path / "c"))
    results = run_ensemble_experiment(cfg, seeds=(0, 42, 7), verbose=False)
    assert [r["seed"] for r in results] == [0, 42, 7]
    for r in results:
        assert 0.0 <= r["accuracy"] <= 100.0
        assert 0 <= r["epoch_stop"] < 8
    # a separable 2-class toy: the seed ensemble should beat random easily
    assert max(r["accuracy"] for r in results) >= 75.0


@pytest.mark.slow
def test_ensemble_sweep_script_skips_missing(tmp_path):
    """The sweep driver reports and skips datasets whose archive is absent
    (run_uea.sh behavior) and still summarizes the present ones."""
    import importlib
    from sie_tpu.data.synthetic import write_synthetic_uea
    sweep = importlib.import_module("scripts.uea_ensemble_sweep")
    write_synthetic_uea(str(tmp_path), "Here", n_train=16, n_test=8,
                        n_dims=2, length=20, n_classes=2, seed=6)
    summary = sweep.main([
        "--data", "UEA", "--data_root", str(tmp_path),
        "--datasets", "Here", "Missing",
        "--model", "SBM", "--num_shapelet", "2", "--batch_size", "8",
        "--train_epochs", "2", "--patience", "2", "--seed", "0",
        "--no-amp", "--no_pallas", "--cache_dir", str(tmp_path / "c")])
    assert "Here" in summary and "Missing" not in summary
