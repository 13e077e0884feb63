"""Batched JAX EEG preprocessing — the TPU replacement for the reference's
per-trial scipy/numpy loop (`data_factory/eeg_processor.py:258-381`).

Faithfully reproduces the reference pipeline *including its quirks*
(SURVEY.md SS6 'Hard parts'):

1. "Downsample" 500 -> 256 Hz: `int(500/256) == 1`, and scipy.signal.decimate
   with q=1 raises inside firwin (cutoff == Nyquist), so the reference falls
   back to stride-1 indexing — an identity. We implement the identity.
2. Channel crop / zero-pad to target_channels (eeg_processor.py:323-336).
3. Time: crop to target_timepoints if longer (the CHISCO case: 1651 -> first
   845 samples); if shorter, Fourier resample upward exactly like
   scipy.signal.resample (eeg_processor.py:339-367).
4. Scale volts -> microvolts (x 1e6) and cast float32 (eeg_processor.py:370-373).
5. Per-channel z-score over time with the pandas ddof=1 std
   (reference eeg.py:352-367 via Normalizer('per_sample_std')).

The whole chain is jit-compiled and runs on batches of trials: one fused XLA
program instead of N_trials * 5 numpy passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fourier_resample(x: jax.Array, num: int, axis: int = -1) -> jax.Array:
    """scipy.signal.resample parity (real input path) in JAX.

    Truncates/zero-pads the rfft spectrum to the new length, with the
    half-Nyquist special cases scipy applies, then scales by num/n.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    xf = jnp.fft.rfft(x.astype(jnp.float64) if x.dtype == jnp.float64
                      else x.astype(jnp.float32), axis=-1)
    nyq_out = num // 2 + 1
    nyq_in = n // 2 + 1
    if num < n:  # downsample: truncate spectrum
        yf = xf[..., :nyq_out]
        if num % 2 == 0:  # fold the energy above the new Nyquist (scipy: *= 2)
            yf = yf.at[..., -1].set(yf[..., -1] * 2.0)
    elif num > n:  # upsample: zero-pad spectrum
        pad = nyq_out - nyq_in
        yf = jnp.pad(xf, [(0, 0)] * (xf.ndim - 1) + [(0, pad)])
        if n % 2 == 0:  # split the old Nyquist bin (scipy: *= 0.5)
            yf = yf.at[..., nyq_in - 1].set(yf[..., nyq_in - 1] * 0.5)
    else:
        yf = xf
    y = jnp.fft.irfft(yf, num, axis=-1) * (num / n)
    return jnp.moveaxis(y.astype(x.dtype), -1, axis)


def _crop_or_pad_axis(x: jax.Array, target: int, axis: int) -> jax.Array:
    cur = x.shape[axis]
    if cur > target:
        return jax.lax.slice_in_dim(x, 0, target, axis=axis)
    if cur < target:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, target - cur)
        return jnp.pad(x, pads)
    return x


def preprocess_trials_host(raw, target_channels: int = 122,
                           target_timepoints: int = 845,
                           resample_short: bool = True,
                           normalize: bool = True):
    """Run the batched preprocessing program on the HOST CPU backend: the raw
    float64 trials never cross the accelerator link (which would dominate —
    the processed float32 output is ~4x smaller and is uploaded once by the
    device-resident training pipeline). One fused XLA:CPU program still
    replaces the reference's N_trials x 5 numpy/pandas passes."""
    # local_devices, not devices: in a multi-process (jax.distributed) run the
    # global list starts with process 0's device, which other processes
    # cannot fetch from.
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        raw32 = jnp.asarray(np.asarray(raw, dtype=np.float32))
        return preprocess_trials(raw32, target_channels, target_timepoints,
                                 resample_short, normalize)


@functools.partial(jax.jit, static_argnames=("target_channels",
                                             "target_timepoints",
                                             "resample_short", "normalize"))
def preprocess_trials(raw: jax.Array, target_channels: int = 122,
                      target_timepoints: int = 845,
                      resample_short: bool = True,
                      normalize: bool = True) -> jax.Array:
    """raw: (N, C_raw, T_raw) volts -> (N, target_channels, target_timepoints)
    microvolt z-scored float32. One fused XLA program for the whole batch."""
    x = raw.astype(jnp.float32)
    # (1) identity "downsample" (see module docstring) — nothing to do.
    # (2) channels
    x = _crop_or_pad_axis(x, target_channels, axis=1)
    # (3) timepoints
    t = x.shape[2]
    if t > target_timepoints:
        x = jax.lax.slice_in_dim(x, 0, target_timepoints, axis=2)
    elif t < target_timepoints:
        if resample_short:
            x = fourier_resample(x, target_timepoints, axis=2)
        else:
            x = _crop_or_pad_axis(x, target_timepoints, axis=2)
    # (4) scale to microvolts
    x = x * 1e6
    # (5) per-channel z-score, ddof=1 (pandas std)
    if normalize:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        tt = x.shape[-1]
        var = jnp.var(x, axis=-1, keepdims=True) * (tt / max(tt - 1, 1))
        x = (x - mean) / jnp.sqrt(var)
    return x


def validate_trials(x: np.ndarray) -> np.ndarray:
    """Vectorized data-QA (reference eeg_processor.py:402-426): per-trial,
    require a nonzero |mean| somewhere, all |mean| < 1e5, a nonzero std
    somewhere, all std < 1e5. Returns a boolean keep-mask per trial."""
    mean = np.abs(x.mean(axis=-1))       # (N, C)
    std = x.std(axis=-1)                 # (N, C)
    ok = ((mean.max(axis=1) > 0)
          & (mean < 1e5).all(axis=1)
          & (std.max(axis=1) > 0)
          & (std < 1e5).all(axis=1))
    return ok
