"""Attention masks (reference utils/masking.py:4-27).

In JAX masks are plain boolean arrays; builders mirror the reference classes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def triangular_causal_mask(b: int, l: int) -> jnp.ndarray:
    """True where attention is DISALLOWED (upper triangle), shape (B, 1, L, L)."""
    mask = np.triu(np.ones((l, l), bool), k=1)
    return jnp.asarray(np.broadcast_to(mask, (b, 1, l, l)))


def prob_mask(b: int, h: int, l: int, index, scores) -> jnp.ndarray:
    """ProbSparse attention mask (Informer); True = disallowed."""
    upper = jnp.triu(jnp.ones((l, scores.shape[-1]), bool), k=1)
    full = jnp.broadcast_to(upper[None, None], (b, h, l, scores.shape[-1]))
    return full[jnp.arange(b)[:, None, None], jnp.arange(h)[None, :, None],
                index, :]
