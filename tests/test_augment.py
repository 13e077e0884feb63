"""Train-time on-device augmentation (data/augment.py): semantics of each
transform, train-only application, reproducibility, CLI wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sie_tpu.config import Config
from sie_tpu.data.augment import apply_augmentations, validate


def _cfg(**kw):
    return Config(model="SBM", seq_len=32, enc_in=4, num_class=2,
                  num_shapelet=2, batch_size=4, dropout=0.0, amp=False,
                  use_pallas=False, seed=0, **kw)


@pytest.fixture
def xm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 4)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(4, 32)) > 0.2)
                       .astype(np.float32))
    return x, mask


def test_validate_rejects_unknown():
    with pytest.raises(ValueError, match="unknown augmentations"):
        validate(("noise", "nope"))


def test_noise_scale_magnitudes(xm):
    x, mask = xm
    cfg = _cfg(augment=("noise",), augment_noise_std=0.1)
    xa, ma = apply_augmentations(cfg, jax.random.key(0), x, mask)
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mask))
    delta = np.asarray(xa - x)
    per_sample_std = np.asarray(jnp.std(x, axis=(1, 2)))
    ratio = delta.std(axis=(1, 2)) / per_sample_std
    assert (np.abs(ratio - 0.1) < 0.03).all()     # sigma ~ 0.1 x std


def test_chdrop_zeroes_whole_channels(xm):
    x, mask = xm
    cfg = _cfg(augment=("chdrop",), augment_chdrop_prob=0.5)
    xa, _ = apply_augmentations(cfg, jax.random.key(1), x, mask)
    xa = np.asarray(xa)
    for b in range(4):
        for c in range(4):
            col = xa[b, :, c]
            ref = np.asarray(x)[b, :, c]
            # either fully zeroed or exactly compensated by 1/(1-p)
            assert (col == 0).all() or np.allclose(col, ref * 2.0)


def test_tshift_rolls_data_and_mask_together(xm):
    x, mask = xm
    cfg = _cfg(augment=("tshift",), augment_tshift_max=5)
    xa, ma = apply_augmentations(cfg, jax.random.key(2), x, mask)
    xa, ma = np.asarray(xa), np.asarray(ma)
    for b in range(4):
        # recover the offset from the data roll, then the mask must match it
        found = None
        for off in range(-5, 6):
            if np.allclose(xa[b], np.roll(np.asarray(x)[b], off, axis=0)):
                found = off
                break
        assert found is not None
        np.testing.assert_array_equal(
            ma[b], np.roll(np.asarray(mask)[b], found, axis=0))


def test_reproducible_and_stackable(xm):
    x, mask = xm
    cfg = _cfg(augment=("noise", "scale", "chdrop", "tshift"))
    a1 = apply_augmentations(cfg, jax.random.key(3), x, mask)
    a2 = apply_augmentations(cfg, jax.random.key(3), x, mask)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    a3 = apply_augmentations(cfg, jax.random.key(4), x, mask)
    assert np.abs(np.asarray(a1[0]) - np.asarray(a3[0])).max() > 0


def test_train_step_applies_eval_does_not(xm):
    """Augmented train steps produce different losses per step even on a
    FIXED batch (fresh rng per step); eval logits are bit-identical with
    and without cfg.augment."""
    from sie_tpu.train.trainer import Trainer
    x, mask = xm
    y = np.array([0, 1, 0, 1], np.int32)
    batch = (np.asarray(x), y, np.asarray(mask), np.ones(4, np.float32))
    cfg = _cfg(augment=("noise",), augment_noise_std=0.5)
    tr = Trainer(cfg, steps_per_epoch=1)
    st = tr.init_state(batch, seed=0)
    logits_aug, _ = tr.eval_step(st, batch)
    tr0 = Trainer(_cfg(), steps_per_epoch=1)
    st0 = tr0.init_state(batch, seed=0)
    logits_plain, _ = tr0.eval_step(st0, batch)
    np.testing.assert_array_equal(np.asarray(logits_aug),
                                  np.asarray(logits_plain))
    # fixed batch, fresh augmentation rng per step: consecutive step losses
    # differ (the plain trainer would see the identical batch twice)
    st, l1, _ = tr.train_step(st, batch, beta=1.0)
    _, l2, _ = tr.train_step(st, batch, beta=1.0)
    assert float(l1) != float(l2)


def test_cli_augment_parsing():
    import run as run_cli
    args = run_cli.get_args(["--augment", "noise,tshift",
                             "--augment_tshift_max", "7"])
    cfg = run_cli.args_to_config(args, seed=0)
    assert cfg.augment == ("noise", "tshift")
    assert cfg.augment_tshift_max == 7
    assert run_cli.args_to_config(
        run_cli.get_args([]), seed=0).augment == ()


def test_noise_respects_padding(xm):
    """Noise sigma comes from the valid region and padded timesteps stay
    exactly zero (models scanning raw x must not see garbage there)."""
    x, _ = xm
    mask = np.ones((4, 32), np.float32)
    mask[:, 20:] = 0.0
    xp = np.asarray(x).copy()
    xp[:, 20:, :] = 0.0                      # zero-padded region
    cfg = _cfg(augment=("noise",), augment_noise_std=0.3)
    xa, _ = apply_augmentations(cfg, jax.random.key(7),
                                jnp.asarray(xp), jnp.asarray(mask))
    xa = np.asarray(xa)
    assert (xa[:, 20:, :] == 0.0).all()
    assert np.abs(xa[:, :20, :] - xp[:, :20, :]).max() > 0


def test_cli_rejects_unknown_augment_at_parse():
    import run as run_cli
    with pytest.raises(ValueError, match="unknown augmentations"):
        run_cli.args_to_config(run_cli.get_args(["--augment", "nois"]),
                               seed=0)
