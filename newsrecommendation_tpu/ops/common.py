"""Elementwise building blocks shared across ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x):
    """x @ W + b with params {'w': (in, out), 'b': (out,)}."""
    return jnp.matmul(x, params["w"].astype(x.dtype)) + params["b"].astype(x.dtype)


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout matching F.dropout train semantics (scale by 1/keep).

    The reference applies dropout to word vectors and attention outputs
    (NRMS.py:28-34, NAML.py:51-53). ``deterministic`` (eval) is identity.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
