"""On-device training-time data augmentation (opt-in, beyond reference).

The reference trains on raw trials with no augmentation anywhere
(exp/experiment_classification.py:295-378). EEG decoding pipelines commonly
benefit from cheap stochastic augmentation; this module provides the
standard family as pure jittable functions applied INSIDE the compiled
train step (trainer.py:_update) — they fuse into the step program, cost a
few elementwise passes on device, and never touch the host data path or
eval/test semantics (train-only; off by default, so parity configs are
bit-identical).

Augmentations (select by name via `--augment`, comma-separated):

- `noise`:   additive Gaussian noise, sigma = augment_noise_std * per-sample
             std of the VALID (mask=1) region, injected only at valid
             timesteps — padding stays exactly zero and a heavily padded
             sample's sigma is not diluted by its padding
- `scale`:   per-sample amplitude scaling ~ N(1, augment_scale_std)
- `chdrop`:  per-sample channel dropout with prob augment_chdrop_prob,
             compensated by 1/(1-p) like inverted dropout
- `tshift`:  circular time shift by a per-sample uniform offset in
             [-augment_tshift_max, +augment_tshift_max] steps (static-shape
             roll via gather; the padding mask is rolled with the data)

All randomness derives from the train step's fold_in rng, so runs are
bit-reproducible per (seed, step).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

KNOWN = ("noise", "scale", "chdrop", "tshift")


def validate(names: Tuple[str, ...]) -> Tuple[str, ...]:
    bad = [n for n in names if n not in KNOWN]
    if bad:
        raise ValueError(f"unknown augmentations {bad}; known: {KNOWN}")
    return names


def apply_augmentations(cfg, rng: jax.Array, x: jax.Array,
                        mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, C) f32, mask: (B, T). Returns augmented (x, mask)."""
    names = validate(tuple(cfg.augment))
    b, t, c = x.shape
    for i, name in enumerate(names):
        key = jax.random.fold_in(rng, i + 101)
        if name == "noise":
            m = mask[:, :, None].astype(x.dtype)
            n_valid = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * c,
                                  1.0)
            mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / n_valid
            var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2),
                          keepdims=True) / n_valid
            x = x + (cfg.augment_noise_std * jnp.sqrt(var) * m
                     * jax.random.normal(key, x.shape, x.dtype))
        elif name == "scale":
            s = 1.0 + cfg.augment_scale_std * jax.random.normal(
                key, (b, 1, 1), x.dtype)
            x = x * s
        elif name == "chdrop":
            p = cfg.augment_chdrop_prob
            keep = jax.random.bernoulli(key, 1.0 - p, (b, 1, c))
            x = jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)
        elif name == "tshift":
            m = int(cfg.augment_tshift_max)
            off = jax.random.randint(key, (b,), -m, m + 1)
            idx = (jnp.arange(t)[None, :] - off[:, None]) % t
            x = jnp.take_along_axis(x, idx[:, :, None], axis=1)
            mask = jnp.take_along_axis(mask, idx, axis=1)
    return x, mask
