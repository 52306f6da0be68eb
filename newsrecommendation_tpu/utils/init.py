"""Parameter initializers reproducing the reference's effective init laws.

Matching the init *distributions* (not the torch code) matters for hitting
accuracy parity with the same epoch budget:
  - torch nn.Linear / nn.Conv1d default: weight & bias ~ U(-1/sqrt(fan_in),
    1/sqrt(fan_in)) (kaiming_uniform(a=sqrt(5)) reduces to exactly this).
  - the reference's MHSA re-inits its projection weights xavier_uniform with
    gain 1 while leaving biases at the Linear default (model_utils.py:73-76).
  - the user encoder's pad_doc is U(-1, 1) (NRMS.py:47, NAML.py:83).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """(weight (fan_in, fan_out), bias (fan_out,)) with torch Linear defaults.

    Note the weight is stored input-major (x @ W + b), the natural layout for
    XLA matmuls, not torch's (out, in).
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": uniform(kw, (fan_in, fan_out), bound, dtype),
        "b": uniform(kb, (fan_out,), bound, dtype),
    }


def xavier_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Linear with xavier_uniform weight (gain 1) + torch-default bias."""
    kw, kb = jax.random.split(key)
    w_bound = math.sqrt(6.0 / (fan_in + fan_out))
    b_bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": uniform(kw, (fan_in, fan_out), w_bound, dtype),
        "b": uniform(kb, (fan_out,), b_bound, dtype),
    }


def torch_conv1d(key, in_channels: int, out_channels: int, kernel_size: int,
                 dtype=jnp.float32):
    """Conv1d params with torch defaults; weight layout (width, in, out) = WIO."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": uniform(kw, (kernel_size, in_channels, out_channels), bound, dtype),
        "b": uniform(kb, (out_channels,), bound, dtype),
    }


def embedding(key, num_embeddings: int, dim: int, dtype=jnp.float32,
              padding_idx0: bool = True):
    """nn.Embedding default init N(0,1); row 0 zeroed when padding_idx0."""
    table = jax.random.normal(key, (num_embeddings, dim), dtype)
    if padding_idx0:
        table = table.at[0].set(0.0)
    return table
