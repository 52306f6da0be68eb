"""Experimental in-kernel attention formulations (forward only).

The production kernels (fused_attention.py) loop heads and issue bn-batched
(T,d)x(d,T) dots — MXU-latency-bound at the NRMS shape (T=d=20, H=20). The
variants here explore layouts that keep the VPU's 128 lanes full instead:

- ``exp_mhsa_qkv_blanes``: transpose each block to batch-minor (T, W, bn)
  so every elementwise/reduce op runs with bn=block_rows in the lane
  dimension (zero lane waste); per head the score/context contractions are
  broadcast-multiply-reduce over tiny (20,20,20,bn) tensors in VMEM.

Used by tools/kbench_attention.py; promoted into the production path only
if measured faster on hardware.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsrecommendation_tpu.ops.pallas.config import pallas_interpret

_EPS = 1e-8


def _blanes_fwd_kernel(qkv_ref, o_ref, *, n_heads, d_head):
    hd = n_heads * d_head
    # (bn, T, 3HD) -> (T, 3HD, bn): lanes now carry the batch dim
    xt = jnp.transpose(qkv_ref[...], (1, 2, 0))
    t = xt.shape[0]
    inv = 1.0 / math.sqrt(d_head)
    outs = []
    for h in range(n_heads):
        qh = xt[:, h * d_head:(h + 1) * d_head, :]            # (T, d, bn)
        kh = xt[:, hd + h * d_head:hd + (h + 1) * d_head, :]
        vh = xt[:, 2 * hd + h * d_head:2 * hd + (h + 1) * d_head, :]
        prod = (qh[:, None, :, :].astype(jnp.float32)
                * kh[None, :, :, :].astype(jnp.float32))      # (Tq,Tk,d,bn)
        s = jnp.sum(prod, axis=2) * inv                        # (Tq,Tk,bn)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        ctx = jnp.sum(a[:, :, None, :] * vh[None, :, :, :].astype(jnp.float32),
                      axis=1)                                  # (Tq, d, bn)
        outs.append(ctx)
    oct_ = jnp.concatenate(outs, axis=1)                       # (T, HD, bn)
    o_ref[...] = jnp.transpose(oct_, (2, 0, 1)).astype(o_ref.dtype)
    del t


def _block_rows(n: int, target: int) -> int:
    b = min(n, target)
    while n % b:
        b -= 1
    return b


@functools.partial(jax.jit, static_argnums=(1, 2))
def exp_mhsa_qkv_blanes(qkv, n_heads: int, block_rows: int = 128):
    """Forward-only batch-in-lanes variant of exp_mhsa_qkv."""
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    d_head = w1 // n_heads
    bn = _block_rows(n, block_rows)
    qkv_spec = pl.BlockSpec((bn, t, w3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, t, w1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_blanes_fwd_kernel, n_heads=n_heads,
                          d_head=d_head),
        out_shape=jax.ShapeDtypeStruct((n, t, w1), qkv.dtype),
        grid=(n // bn,),
        in_specs=[qkv_spec],
        out_specs=o_spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=(qkv.size + n * t * w1) * qkv.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(qkv)
