"""Elementwise building blocks shared across ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x):
    """x @ W + b with params {'w': (in, out), 'b': (out,)}.

    >2-D inputs contract on the flattened-2D view: XLA gives a plain 2-D
    dot a row-major output that bitcasts back to the n-D row-major shape,
    where the batched 3-D formulation picks a batch-minor dot layout and
    inserts full relayout copies of the activations (docs/PERF.md).
    """
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    if x.ndim <= 2:
        return jnp.matmul(x, w) + b
    lead = x.shape[:-1]
    y = jnp.matmul(x.reshape(-1, x.shape[-1]), w) + b
    return y.reshape(*lead, w.shape[1])


def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout matching F.dropout train semantics (scale by 1/keep).

    The reference applies dropout to word vectors and attention outputs
    (NRMS.py:28-34, NAML.py:51-53). ``deterministic`` (eval) is identity.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    # Draw the mask on the flattened-2D shape: XLA gives a >2-D
    # rng-bit-generator a batch-minor layout and then inserts full relayout
    # copies of the u32 bit tensors to feed the row-major dropout fusion
    # (1.6 ms/step at the bench shape — docs/PERF.md); the 2-D draw comes
    # out row-major and the reshape is a free bitcast. Same distribution,
    # same element count — only the bit-to-element assignment differs.
    shape2d = (x.size // x.shape[-1], x.shape[-1]) if x.ndim > 2 else x.shape
    mask = jax.random.bernoulli(key, keep, shape2d).reshape(x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
