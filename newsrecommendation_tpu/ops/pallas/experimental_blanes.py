"""Alternative in-kernel attention layout: batch-in-lanes ("blanes").

The default kernels (fused_attention.py, layout "headloop") loop heads and
issue bn-batched (T,d)x(d,T) dots — MXU-latency-bound at the NRMS shape
(T=d=20, H=20). The variants here keep the VPU's 128 lanes full instead:

- ``exp_mhsa_qkv_blanes`` / ``exp_mhsa_qkv_blanes_masked``: transpose each
  block to batch-minor (T, W, bn) so every elementwise/reduce op runs with
  bn=block_rows in the lane dimension (zero lane waste); per head the
  score/context contractions are broadcast-multiply-reduce over tiny
  (20,20,20,bn) tensors in VMEM. Both carry full custom VJPs
  (full-recompute backward, same contract as the headloop kernels).

Production routing is config-gated: ``set_attention_layout("blanes")``
(ops/pallas/config.py) switches ``_mhsa_from_qkv`` to these kernels; the
switch must be flipped BEFORE the first jitted call (see
ops/attention.py docstring). tools/kbench_attention.py A/Bs the layouts
per-kernel and over the full train step.

Numerics: attention weights and ds are rounded to the input dtype before
the v/k/q contractions (accumulation in f32), mirroring the headloop
kernels' ``a.astype(vh.dtype)`` / ``ds.astype(kh.dtype)`` MXU downcasts, so
bf16 layout A/Bs compare like for like (reduction order still differs —
VPU tree-reduce vs MXU — so agreement is close, not bitwise).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsrecommendation_tpu.ops.pallas.config import pallas_interpret
from newsrecommendation_tpu.ops.pallas.fused_attention import _block_rows

_EPS = 1e-8


def _blanes_attn(xt, mt, h, n_heads, d_head):
    """Per-head attention weights in the transposed layout.

    xt: (T, 3HD, bn) transposed qkv block; mt: (Tk, bn) key mask or None.
    Returns (qh, kh, vh, a) with a the (Tq, Tk, bn) attention weights —
    exact exp→(mask)→normalize(+eps) math of fused_attention.py.
    """
    hd = n_heads * d_head
    qh = xt[:, h * d_head:(h + 1) * d_head, :]                # (T, d, bn)
    kh = xt[:, hd + h * d_head:hd + (h + 1) * d_head, :]
    vh = xt[:, 2 * hd + h * d_head:2 * hd + (h + 1) * d_head, :]
    inv = 1.0 / math.sqrt(d_head)
    prod = (qh[:, None, :, :].astype(jnp.float32)
            * kh[None, :, :, :].astype(jnp.float32))          # (Tq,Tk,d,bn)
    s = jnp.sum(prod, axis=2) * inv                            # (Tq,Tk,bn)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    if mt is not None:
        e = e * mt[None, :, :]
    den = jnp.sum(e, axis=1, keepdims=True) + _EPS * jnp.exp(-m)
    return qh, kh, vh, e / den


def _blanes_fwd_kernel(qkv_ref, o_ref, *, n_heads, d_head, mask_ref=None):
    # (bn, T, 3HD) -> (T, 3HD, bn): lanes now carry the batch dim
    xt = jnp.transpose(qkv_ref[...], (1, 2, 0))
    mt = (None if mask_ref is None
          else jnp.transpose(mask_ref[...].astype(jnp.float32), (1, 0)))
    outs = []
    for h in range(n_heads):
        _, _, vh, a = _blanes_attn(xt, mt, h, n_heads, d_head)
        # round a to the value dtype first (the headloop kernels feed
        # a.astype(vh.dtype) to the MXU), then accumulate in f32
        al = a.astype(vh.dtype).astype(jnp.float32)
        ctx = jnp.sum(al[:, :, None, :] * vh[None, :, :, :].astype(jnp.float32),
                      axis=1)                                  # (Tq, d, bn)
        outs.append(ctx)
    oct_ = jnp.concatenate(outs, axis=1)                       # (T, HD, bn)
    o_ref[...] = jnp.transpose(oct_, (2, 0, 1)).astype(o_ref.dtype)


def _blanes_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, n_heads, d_head,
                       mask_ref=None):
    """Full-recompute backward in the batch-in-lanes layout; emits fused
    dqkv (bn, T, 3HD). Same math as fused_attention._qkv_bwd_kernel."""
    xt = jnp.transpose(qkv_ref[...], (1, 2, 0))               # (T, 3HD, bn)
    gt = jnp.transpose(g_ref[...], (1, 2, 0))                 # (T, HD, bn)
    mt = (None if mask_ref is None
          else jnp.transpose(mask_ref[...].astype(jnp.float32), (1, 0)))
    inv = 1.0 / math.sqrt(d_head)
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        qh, kh, vh, a = _blanes_attn(xt, mt, h, n_heads, d_head)
        gh_raw = gt[:, h * d_head:(h + 1) * d_head, :]
        gh = gh_raw.astype(jnp.float32)
        vf = vh.astype(jnp.float32)
        qf = qh.astype(jnp.float32)
        kf = kh.astype(jnp.float32)
        # a/ds rounded to the input dtype before the contractions, f32
        # accumulate — mirrors the headloop a.astype(gh.dtype) /
        # ds.astype(kh.dtype) MXU downcasts (see module docstring)
        al = a.astype(gh_raw.dtype).astype(jnp.float32)
        # dV[k,d,b] = sum_q a[q,k,b] g[q,d,b]
        dv = jnp.sum(al[:, :, None, :] * gh[:, None, :, :], axis=0)
        # dA[q,k,b] = sum_d g[q,d,b] v[k,d,b]
        da = jnp.sum(gh[:, None, :, :] * vf[None, :, :, :], axis=2)
        # a carries the mask (a=0 on masked keys) — unmasked formula exact
        ds = (da - jnp.sum(da * a, axis=1, keepdims=True)) * a * inv
        dsl = ds.astype(kh.dtype).astype(jnp.float32)
        # dQ[q,d,b] = sum_k ds[q,k,b] k[k,d,b]; dK[k,d,b] = sum_q ds q
        dq = jnp.sum(dsl[:, :, None, :] * kf[None, :, :, :], axis=1)
        dk = jnp.sum(dsl[:, :, None, :] * qf[:, None, :, :], axis=0)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dxt = jnp.concatenate(dqs + dks + dvs, axis=1)            # (T, 3HD, bn)
    dqkv_ref[...] = jnp.transpose(dxt, (2, 0, 1)).astype(dqkv_ref.dtype)


def _blanes_specs(n, t, w3, bn):
    w1 = w3 // 3
    qkv_spec = pl.BlockSpec((bn, t, w3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, t, w1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return qkv_spec, o_spec, m_spec


def _blanes_fwd_masked(qkv_ref, mask_ref, o_ref, *, n_heads, d_head):
    _blanes_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                       mask_ref=mask_ref)


def _blanes_bwd_masked(qkv_ref, mask_ref, g_ref, dqkv_ref, *, n_heads,
                       d_head):
    _blanes_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_heads=n_heads,
                       d_head=d_head, mask_ref=mask_ref)


def _blanes_fwd_call(qkv, mask, n_heads, block_rows):
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    d_head = w1 // n_heads
    bn = _block_rows(n, block_rows)
    qkv_spec, o_spec, m_spec = _blanes_specs(n, t, w3, bn)
    kernel = (functools.partial(_blanes_fwd_kernel, n_heads=n_heads,
                                d_head=d_head) if mask is None else
              functools.partial(_blanes_fwd_masked, n_heads=n_heads,
                                d_head=d_head))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, w1), qkv.dtype),
        grid=(n // bn,),
        in_specs=([qkv_spec] if mask is None else [qkv_spec, m_spec]),
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
    )(*((qkv,) if mask is None else (qkv, mask)))


def _blanes_bwd_call(qkv, mask, g, n_heads, block_rows):
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    d_head = w1 // n_heads
    bn = _block_rows(n, max(block_rows // 2, 1))
    qkv_spec, o_spec, m_spec = _blanes_specs(n, t, w3, bn)
    kernel = (functools.partial(_blanes_bwd_kernel, n_heads=n_heads,
                                d_head=d_head) if mask is None else
              functools.partial(_blanes_bwd_masked, n_heads=n_heads,
                                d_head=d_head))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(n // bn,),
        in_specs=([qkv_spec, o_spec] if mask is None
                  else [qkv_spec, m_spec, o_spec]),
        out_specs=qkv_spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n_heads * t * t * d_head,
            bytes_accessed=(2 * qkv.size + 2 * n * t * w1)
            * qkv.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(*((qkv, g) if mask is None else (qkv, mask, g)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def exp_mhsa_qkv_blanes(qkv, n_heads: int, block_rows: int = 128):
    """Batch-in-lanes variant of exp_mhsa_qkv (same contract/math)."""
    return _blanes_fwd_call(qkv, None, n_heads, block_rows)


def _blanes_vjp_fwd(qkv, n_heads, block_rows):
    return _blanes_fwd_call(qkv, None, n_heads, block_rows), (qkv,)


def _blanes_vjp_bwd(n_heads, block_rows, res, g):
    (qkv,) = res
    return (_blanes_bwd_call(qkv, None, g.astype(qkv.dtype), n_heads,
                             block_rows),)


exp_mhsa_qkv_blanes.defvjp(_blanes_vjp_fwd, _blanes_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def exp_mhsa_qkv_blanes_masked(qkv, key_mask, n_heads: int,
                               block_rows: int = 128):
    """Key-masked batch-in-lanes variant (exp_mhsa_qkv_masked contract)."""
    return _blanes_fwd_call(qkv, key_mask, n_heads, block_rows)


def _blanes_masked_vjp_fwd(qkv, key_mask, n_heads, block_rows):
    out = _blanes_fwd_call(qkv, key_mask, n_heads, block_rows)
    return out, (qkv, key_mask)


def _blanes_masked_vjp_bwd(n_heads, block_rows, res, g):
    qkv, key_mask = res
    dqkv = _blanes_bwd_call(qkv, key_mask, g.astype(qkv.dtype), n_heads,
                            block_rows)
    return dqkv, jnp.zeros_like(key_mask)


exp_mhsa_qkv_blanes_masked.defvjp(_blanes_masked_vjp_fwd,
                                  _blanes_masked_vjp_bwd)
