"""Forecast losses (reference utils/losses.py:35-89 — N-BEATS mape/smape/mase).

Kept for capability parity with the reference's forecasting toolkit; jnp-based
and divide-by-zero-safe like the reference's divide_no_nan.
"""

from __future__ import annotations

import jax.numpy as jnp


def _div_no_nan(a, b):
    out = a / b
    return jnp.where(jnp.isfinite(out), out, 0.0)


def mape_loss(forecast, target, mask=1.0):
    weights = _div_no_nan(mask, target)
    return jnp.mean(jnp.abs((forecast - target) * weights))


def smape_loss(forecast, target, mask=1.0):
    return 200.0 * jnp.mean(
        _div_no_nan(jnp.abs(forecast - target),
                    jnp.abs(forecast) + jnp.abs(target)) * mask)


def mase_loss(insample, freq, forecast, target, mask=1.0):
    masep = jnp.mean(jnp.abs(insample[:, freq:] - insample[:, :-freq]), axis=1)
    return jnp.mean(jnp.abs(target - forecast) * _div_no_nan(mask, masep[:, None]))
