"""Fused multi-head exp-normalized self-attention — Pallas TPU kernel.

The NAML/NRMS attention regime (sequences of 20-50 tokens, 20 heads of
d=20) is hostile to both the MXU (3% utilization on 20x20x20 matmuls) and
to unfused XLA (the (N,T,T,H) score tensor makes every op HBM-bound). This
kernel keeps one block of rows entirely in VMEM: per head it computes
scores, the reference's exp/normalize (model_utils.py:47-53 semantics,
max-shifted with the epsilon scaled by exp(-max) — algebraically identical,
see ops/attention.py), and the context matmul, so HBM traffic is exactly
q/k/v in + context out.

Backward uses full recomputation (custom VJP): the backward kernel re-derives
scores and attention weights from q/k/v in VMEM and emits dq/dk/dv in one
pass — nothing but the inputs is saved between passes.

Layout: q, k, v are (N, T, H*D) — head h owns the contiguous lane slice
[h*D, (h+1)*D). All slices are static (the head loop is unrolled), so Mosaic
sees static lane offsets.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsrecommendation_tpu.ops.pallas.config import (
    bwd_residuals,
    pallas_interpret,
)

_EPS = 1e-8


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads, d_head):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        # raw-dtype operands: bf16 inputs drive the MXU natively (a forced
        # f32 upcast makes every matmul take the slow f32 path); the f32
        # accumulate comes from preferred_element_type.
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv                                       # (BN, T, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        vh = v[:, :, sl]
        # a in the value dtype mirrors the XLA path's attn.astype(v.dtype)
        ctx = jax.lax.dot_general(
            a.astype(vh.dtype), vh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (BN, T, D)
        o_ref[:, :, sl] = ctx.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, n_heads, d_head):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        gh = g[:, :, sl]
        # recompute forward attention (raw-dtype matmul operands, f32
        # accumulate — see _fwd_kernel)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        al = a.astype(gh.dtype)
        # dV_h = a^T @ g_h : contract over the query axis
        dv = jax.lax.dot_general(
            al, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (BN, T_k, D)
        # dA[q,k] = g_h[q,:] . v_h[k,:]
        da = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (BN, T_q, T_k)
        # normalization backward: dE = (dA - sum_k dA*a) / den; dS = dE*e
        ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * inv
        dsl = ds.astype(kh.dtype)
        # dQ_h = dS @ K_h ; dK_h = dS^T @ Q_h
        dq = jax.lax.dot_general(
            dsl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _masked_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, n_heads,
                       d_head):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    mask = mask_ref[...].astype(jnp.float32)[:, None, :]  # (BN, 1, T_k)
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv                                       # (BN, T, T)
        # reference semantics: mask multiplies AFTER the exp
        # (model_utils.py:48-53); max over ALL keys matches
        # ops/attention.py:masked_exp_normalize.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m) * mask
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        vh = v[:, :, sl]
        ctx = jax.lax.dot_general(
            a.astype(vh.dtype), vh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = ctx.astype(o_ref.dtype)


def _masked_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, *, n_heads, d_head):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    mask = mask_ref[...].astype(jnp.float32)[:, None, :]
    g = g_ref[...]
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        gh = g[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m) * mask
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        al = a.astype(gh.dtype)
        dv = jax.lax.dot_general(
            al, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # a already carries the mask (a=0 on masked keys), so the unmasked
        # normalization-backward formula is exact here too.
        ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * inv
        dsl = ds.astype(kh.dtype)
        dq = jax.lax.dot_general(
            dsl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _qkv_fwd_kernel(qkv_ref, o_ref, *, n_heads, d_head, mask_ref=None,
                    bias_ref=None, probs_ref=None):
    """Forward over FUSED qkv (BN, T, 3*H*D): head h's q/k/v live at lane
    offsets h*D, H*D + h*D, 2*H*D + h*D. Keeping the projection output fused
    means XLA never materializes separate q/k/v in HBM — the profile showed
    those splits (async slice + relayout copies of (N,T,H*D) tensors) costing
    more than the attention math itself.

    bias_ref (optional, (1, 3*H*D)): the QKV projection bias, added in VMEM
    after load — folding it here removes the standalone (N,T,3·H·D)
    broadcast-add HBM round trip (measured 1.4 ms/step at the bench shape)."""
    qkv = qkv_ref[...]
    if bias_ref is not None:
        # same-dtype add == the XLA path's `matmul(x, w) + bias` bit-for-bit
        qkv = qkv + bias_ref[...][None]
    mask = (None if mask_ref is None
            else mask_ref[...].astype(jnp.float32)[:, None, :])
    hd = n_heads * d_head
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        q_sl = slice(h * d_head, (h + 1) * d_head)
        k_sl = slice(hd + h * d_head, hd + (h + 1) * d_head)
        v_sl = slice(2 * hd + h * d_head, 2 * hd + (h + 1) * d_head)
        qh = qkv[:, :, q_sl]
        kh = qkv[:, :, k_sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        if mask is not None:
            e = e * mask
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        if probs_ref is not None:
            t = a.shape[1]
            probs_ref[:, :, h * t:(h + 1) * t] = a.astype(probs_ref.dtype)
        vh = qkv[:, :, v_sl]
        ctx = jax.lax.dot_general(
            a.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, q_sl] = ctx.astype(o_ref.dtype)


def _qkv_bwd_probs_kernel(qkv_ref, probs_ref, g_ref, dqkv_ref, *, n_heads,
                          d_head, bias_ref=None):
    """Backward from SAVED attention probs: no score matmul, no exp/
    normalize, no mask operand (the probs already carry the mask — a
    masked key's prob is exactly 0, so its ds contribution vanishes).
    The probs are the f32 values the forward derived, so gradients are
    bit-identical to the recompute kernel's. qkv (+bias) is still needed
    for the biased q/k/v values in the dq/dk/dv matmuls."""
    qkv = qkv_ref[...]
    if bias_ref is not None:
        qkv = qkv + bias_ref[...][None]
    g = g_ref[...]
    probs = probs_ref[...]
    hd = n_heads * d_head
    t = g.shape[1]
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        q_sl = slice(h * d_head, (h + 1) * d_head)
        k_sl = slice(hd + h * d_head, hd + (h + 1) * d_head)
        v_sl = slice(2 * hd + h * d_head, 2 * hd + (h + 1) * d_head)
        qh = qkv[:, :, q_sl]
        kh = qkv[:, :, k_sl]
        vh = qkv[:, :, v_sl]
        gh = g[:, :, q_sl]
        a = probs[:, :, h * t:(h + 1) * t].astype(jnp.float32)
        al = a.astype(gh.dtype)
        dv = jax.lax.dot_general(
            al, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * inv
        dsl = ds.astype(kh.dtype)
        dq = jax.lax.dot_general(
            dsl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, q_sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, k_sl] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, v_sl] = dv.astype(dqkv_ref.dtype)


def _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, n_heads, d_head,
                    mask_ref=None, bias_ref=None):
    """Backward emitting FUSED dqkv — the projection backward then consumes
    one contiguous buffer (dx = dqkv @ W^T, dW = x^T @ dqkv) with no HBM
    concatenation of dq/dk/dv. With bias_ref the forward recompute adds the
    bias in VMEM (d(bias) itself is a plain reduce of dqkv, left to XLA)."""
    qkv = qkv_ref[...]
    if bias_ref is not None:
        qkv = qkv + bias_ref[...][None]
    g = g_ref[...]
    mask = (None if mask_ref is None
            else mask_ref[...].astype(jnp.float32)[:, None, :])
    hd = n_heads * d_head
    inv = 1.0 / math.sqrt(d_head)
    for h in range(n_heads):
        q_sl = slice(h * d_head, (h + 1) * d_head)
        k_sl = slice(hd + h * d_head, hd + (h + 1) * d_head)
        v_sl = slice(2 * hd + h * d_head, 2 * hd + (h + 1) * d_head)
        qh = qkv[:, :, q_sl]
        kh = qkv[:, :, k_sl]
        vh = qkv[:, :, v_sl]
        gh = g[:, :, q_sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        if mask is not None:
            e = e * mask
        den = jnp.sum(e, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
        a = e / den
        al = a.astype(gh.dtype)
        dv = jax.lax.dot_general(
            al, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (da - jnp.sum(da * a, axis=-1, keepdims=True)) * a * inv
        dsl = ds.astype(kh.dtype)
        dq = jax.lax.dot_general(
            dsl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, q_sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, k_sl] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, v_sl] = dv.astype(dqkv_ref.dtype)


def _block_rows(n: int, target: int) -> int:
    """Mosaic-legal row-block size: the largest divisor of n that is <=
    target AND divisible by 8 (the sublane tiling requirement when the row
    dim lands second-to-last in a 2-D block, e.g. the key mask), falling
    back to the whole array (block == array is always legal)."""
    b = min(n, target)
    while b >= 8:
        if n % b == 0 and b % 8 == 0:
            return b
        b -= 1
    return n


# Per-block VMEM working-set budget. The kernels run with a 100 MiB
# vmem_limit; the budget must leave room for Mosaic's double buffering and
# per-head stack temporaries (an f32[512,50,400] ctx stack allocation once
# blew the limit at the eval shape — block rows must shrink as T and the
# dtype grow, not stay pinned at the target). Calibrated round 3: a
# 49.6 MB estimated block (f32 (256,20,1200) fwd) produced a measured
# 110.4 MB scoped allocation — ~2.2x the estimate — so 40 MiB keeps the
# true usage under the limit with ~12% margin (f32 shapes fall back to
# 128-row blocks; bf16 keeps 256).
_VMEM_BLOCK_BUDGET = 40 * 1024 * 1024


def _capped_block_rows(n: int, target: int, t: int, w_in: int, w_out: int,
                       itemsize: int, extra_row_bytes: int = 0) -> int:
    """block_rows capped so the block's VMEM working set fits the budget.

    Per-row estimate: the input/output blocks at their dtype plus the f32
    intermediates the per-head loop materializes (scores (t, t) and the
    f32 context/grad accumulators, ~2x the output width).
    extra_row_bytes: additional per-row block bytes (e.g. a saved-probs
    operand/output) not covered by the base estimate.
    """
    row_bytes = (t * (w_in + w_out) * itemsize + 4 * t * (t + 2 * w_out)
                 + extra_row_bytes)
    cap = max(_VMEM_BLOCK_BUDGET // max(row_bytes, 1), 8)
    return _block_rows(n, min(target, cap))


def _fwd_call(q, k, v, n_heads, d_head, block_rows):
    n, t, hd = q.shape
    bn = _capped_block_rows(n, block_rows, t, 3 * hd, hd, q.dtype.itemsize)
    grid = (n // bn,)
    spec = pl.BlockSpec((bn, t, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, d_head=d_head),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(q, k, v)


def _bwd_call(q, k, v, g, n_heads, d_head, block_rows):
    n, t, hd = q.shape
    # half-size blocks: backward holds 7 buffers in VMEM vs forward's 4,
    # and full-size blocks blow up Mosaic compile time
    bn = _capped_block_rows(n, max(block_rows // 2, 1), t, 7 * hd, hd,
                            q.dtype.itemsize)
    grid = (n // bn,)
    spec = pl.BlockSpec((bn, t, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shapes = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, d_head=d_head),
        out_shape=(shapes, shapes, shapes),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n_heads * t * t * d_head,
            bytes_accessed=7 * q.size * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(q, k, v, g)


def _masked_fwd_call(q, k, v, mask, n_heads, d_head, block_rows):
    n, t, hd = q.shape
    bn = _capped_block_rows(n, block_rows, t, 3 * hd, hd, q.dtype.itemsize)
    grid = (n // bn,)
    spec = pl.BlockSpec((bn, t, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_fwd_kernel, n_heads=n_heads, d_head=d_head),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, mspec],
        out_specs=spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(q, k, v, mask)


def _masked_bwd_call(q, k, v, mask, g, n_heads, d_head, block_rows):
    n, t, hd = q.shape
    bn = _capped_block_rows(n, max(block_rows // 2, 1), t, 7 * hd, hd,
                            q.dtype.itemsize)
    grid = (n // bn,)
    spec = pl.BlockSpec((bn, t, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shapes = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_masked_bwd_kernel, n_heads=n_heads, d_head=d_head),
        out_shape=(shapes, shapes, shapes),
        grid=grid,
        in_specs=[spec, spec, spec, mspec, spec],
        out_specs=(spec, spec, spec),
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n_heads * t * t * d_head,
            bytes_accessed=7 * q.size * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(q, k, v, mask, g)


def _qkv_fwd_unmasked(qkv_ref, o_ref, *, n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head)


def _qkv_fwd_masked(qkv_ref, mask_ref, o_ref, *, n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref)


def _qkv_fwd_bias(qkv_ref, bias_ref, o_ref, *, n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    bias_ref=bias_ref)


def _qkv_fwd_bias_masked(qkv_ref, bias_ref, mask_ref, o_ref, *, n_heads,
                         d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref, bias_ref=bias_ref)


def _qkv_bwd_unmasked(qkv_ref, g_ref, dqkv_ref, *, n_heads, d_head):
    _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_heads=n_heads, d_head=d_head)


def _qkv_bwd_masked(qkv_ref, mask_ref, g_ref, dqkv_ref, *, n_heads, d_head):
    _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref)


def _qkv_bwd_bias(qkv_ref, bias_ref, g_ref, dqkv_ref, *, n_heads, d_head):
    _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_heads=n_heads, d_head=d_head,
                    bias_ref=bias_ref)


def _qkv_bwd_bias_masked(qkv_ref, bias_ref, mask_ref, g_ref, dqkv_ref, *,
                         n_heads, d_head):
    _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref, bias_ref=bias_ref)


def _qkv_specs(n, t, w3, w1, bn):
    qkv_spec = pl.BlockSpec((bn, t, w3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, t, w1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, w3), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return qkv_spec, o_spec, m_spec, b_spec


_QKV_FWD = {  # (has_bias, has_mask) -> kernel fn
    (False, False): _qkv_fwd_unmasked,
    (False, True): _qkv_fwd_masked,
    (True, False): _qkv_fwd_bias,
    (True, True): _qkv_fwd_bias_masked,
}
_QKV_BWD = {
    (False, False): _qkv_bwd_unmasked,
    (False, True): _qkv_bwd_masked,
    (True, False): _qkv_bwd_bias,
    (True, True): _qkv_bwd_bias_masked,
}


def _qkv_fwd_probs_unmasked(qkv_ref, o_ref, p_ref, *, n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    probs_ref=p_ref)


def _qkv_fwd_probs_masked(qkv_ref, mask_ref, o_ref, p_ref, *, n_heads,
                          d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref, probs_ref=p_ref)


def _qkv_fwd_probs_bias(qkv_ref, bias_ref, o_ref, p_ref, *, n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    bias_ref=bias_ref, probs_ref=p_ref)


def _qkv_fwd_probs_bias_masked(qkv_ref, bias_ref, mask_ref, o_ref, p_ref, *,
                               n_heads, d_head):
    _qkv_fwd_kernel(qkv_ref, o_ref, n_heads=n_heads, d_head=d_head,
                    mask_ref=mask_ref, bias_ref=bias_ref, probs_ref=p_ref)


_QKV_FWD_PROBS = {
    (False, False): _qkv_fwd_probs_unmasked,
    (False, True): _qkv_fwd_probs_masked,
    (True, False): _qkv_fwd_probs_bias,
    (True, True): _qkv_fwd_probs_bias_masked,
}


def _qkv_bwd_probs_nobias(qkv_ref, p_ref, g_ref, dqkv_ref, *, n_heads,
                          d_head):
    _qkv_bwd_probs_kernel(qkv_ref, p_ref, g_ref, dqkv_ref, n_heads=n_heads,
                          d_head=d_head)


def _qkv_bwd_probs_bias(qkv_ref, bias_ref, p_ref, g_ref, dqkv_ref, *,
                        n_heads, d_head):
    _qkv_bwd_probs_kernel(qkv_ref, p_ref, g_ref, dqkv_ref, n_heads=n_heads,
                          d_head=d_head, bias_ref=bias_ref)


def _qkv_fwd_probs_call(qkv, mask, n_heads, d_head, block_rows, bias=None):
    """Forward that ALSO emits the f32 attention probs (N, T, H*T) —
    head h's (T, T) prob block lives at lane slice [h*T, (h+1)*T)."""
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    wp = n_heads * t
    bn = _capped_block_rows(n, block_rows, t, w3, w1, qkv.dtype.itemsize,
                            extra_row_bytes=4 * t * wp)
    qkv_spec, o_spec, m_spec, b_spec = _qkv_specs(n, t, w3, w1, bn)
    p_spec = pl.BlockSpec((bn, t, wp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _QKV_FWD_PROBS[(bias is not None, mask is not None)],
        n_heads=n_heads, d_head=d_head)
    in_specs, args = [qkv_spec], [qkv]
    if bias is not None:
        in_specs.append(b_spec)
        args.append(bias.reshape(1, w3).astype(qkv.dtype))
    if mask is not None:
        in_specs.append(m_spec)
        args.append(mask)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, t, w1), qkv.dtype),
                   jax.ShapeDtypeStruct((n, t, wp), jnp.float32)),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=(o_spec, p_spec),
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=(qkv.size + n * t * w1) * qkv.dtype.itemsize
            + 4 * n * t * wp,
            transcendentals=n * n_heads * t * t,
        ),
    )(*args)


def _qkv_bwd_probs_call(qkv, probs, g, n_heads, d_head, block_rows,
                        bias=None):
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    wp = n_heads * t
    bn = _capped_block_rows(n, max(block_rows // 2, 1), t, 2 * w3 + w1, w1,
                            qkv.dtype.itemsize, extra_row_bytes=4 * t * wp)
    qkv_spec, o_spec, m_spec, b_spec = _qkv_specs(n, t, w3, w1, bn)
    p_spec = pl.BlockSpec((bn, t, wp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _qkv_bwd_probs_bias if bias is not None else _qkv_bwd_probs_nobias,
        n_heads=n_heads, d_head=d_head)
    in_specs, args = [qkv_spec], [qkv]
    if bias is not None:
        in_specs.append(b_spec)
        args.append(bias.reshape(1, w3).astype(qkv.dtype))
    in_specs.extend([p_spec, o_spec])
    args.extend([probs, g])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * n_heads * t * t * d_head,
            bytes_accessed=(2 * qkv.size + 2 * n * t * w1)
            * qkv.dtype.itemsize + 4 * n * t * wp,
            transcendentals=0,
        ),
    )(*args)


def _qkv_fwd_call(qkv, mask, n_heads, d_head, block_rows, bias=None):
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    bn = _capped_block_rows(n, block_rows, t, w3, w1, qkv.dtype.itemsize)
    qkv_spec, o_spec, m_spec, b_spec = _qkv_specs(n, t, w3, w1, bn)
    kernel = functools.partial(_QKV_FWD[(bias is not None, mask is not None)],
                               n_heads=n_heads, d_head=d_head)
    in_specs, args = [qkv_spec], [qkv]
    if bias is not None:
        in_specs.append(b_spec)
        args.append(bias.reshape(1, w3).astype(qkv.dtype))
    if mask is not None:
        in_specs.append(m_spec)
        args.append(mask)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, w1), qkv.dtype),
        grid=(n // bn,),
        in_specs=in_specs,
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
    )(*args)


def _qkv_bwd_call(qkv, mask, g, n_heads, d_head, block_rows, bias=None):
    n, t, w3 = qkv.shape
    w1 = w3 // 3
    bn = _capped_block_rows(n, max(block_rows // 2, 1), t, 2 * w3 + w1, w1,
                            qkv.dtype.itemsize)
    qkv_spec, o_spec, m_spec, b_spec = _qkv_specs(n, t, w3, w1, bn)
    kernel = functools.partial(_QKV_BWD[(bias is not None, mask is not None)],
                               n_heads=n_heads, d_head=d_head)
    in_specs, args = [qkv_spec], [qkv]
    if bias is not None:
        in_specs.append(b_spec)
        args.append(bias.reshape(1, w3).astype(qkv.dtype))
    if mask is not None:
        in_specs.append(m_spec)
        args.append(mask)
    in_specs.append(o_spec)
    args.append(g)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(n // bn,),
        in_specs=in_specs,
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
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def exp_mhsa_qkv(qkv, n_heads: int, block_rows: int = 128):
    """Fused exp-MHSA over a FUSED qkv tensor (N, T, 3*H*D), lanes laid out
    [q | k | v]. Returns context (N, T, H*D). Exact math of exp_mhsa, but
    q/k/v are sliced per head in VMEM, so the (N,T,H*D)-sized HBM splits of
    the projection output (and the matching concats in backward) disappear.
    """
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _qkv_fwd_call(qkv, None, n_heads, d_head, block_rows)


def _exp_mhsa_qkv_fwd(qkv, n_heads, block_rows):
    d_head = qkv.shape[-1] // (3 * n_heads)
    if bwd_residuals() == "probs":
        out, probs = _qkv_fwd_probs_call(qkv, None, n_heads, d_head,
                                         block_rows)
        return out, (qkv, probs)
    return _qkv_fwd_call(qkv, None, n_heads, d_head, block_rows), (qkv, None)


def _exp_mhsa_qkv_bwd(n_heads, block_rows, res, g):
    qkv, probs = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    if probs is not None:
        return (_qkv_bwd_probs_call(qkv, probs, g.astype(qkv.dtype), n_heads,
                                    d_head, block_rows),)
    return (_qkv_bwd_call(qkv, None, g.astype(qkv.dtype), n_heads, d_head,
                          block_rows),)


exp_mhsa_qkv.defvjp(_exp_mhsa_qkv_fwd, _exp_mhsa_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def exp_mhsa_qkv_masked(qkv, key_mask, n_heads: int, block_rows: int = 128):
    """Key-masked variant of exp_mhsa_qkv (exact exp_mhsa_masked math)."""
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _qkv_fwd_call(qkv, key_mask, n_heads, d_head, block_rows)


def _exp_mhsa_qkv_masked_fwd(qkv, key_mask, n_heads, block_rows):
    d_head = qkv.shape[-1] // (3 * n_heads)
    if bwd_residuals() == "probs":
        out, probs = _qkv_fwd_probs_call(qkv, key_mask, n_heads, d_head,
                                         block_rows)
        return out, (qkv, key_mask, probs)
    out = _qkv_fwd_call(qkv, key_mask, n_heads, d_head, block_rows)
    return out, (qkv, key_mask, None)


def _exp_mhsa_qkv_masked_bwd(n_heads, block_rows, res, g):
    qkv, key_mask, probs = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    if probs is not None:
        # the probs carry the mask (masked keys have prob 0) — the
        # backward needs no mask operand at all
        dqkv = _qkv_bwd_probs_call(qkv, probs, g.astype(qkv.dtype), n_heads,
                                   d_head, block_rows)
    else:
        dqkv = _qkv_bwd_call(qkv, key_mask, g.astype(qkv.dtype), n_heads,
                             d_head, block_rows)
    return dqkv, jnp.zeros_like(key_mask)


exp_mhsa_qkv_masked.defvjp(_exp_mhsa_qkv_masked_fwd, _exp_mhsa_qkv_masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def exp_mhsa_qkv_bias(qkv, bias, n_heads: int, block_rows: int = 128):
    """exp_mhsa_qkv over an UN-biased projection output plus its bias.

    Identical math to ``exp_mhsa_qkv(qkv + bias, ...)`` (the bias add runs
    in VMEM at the input dtype), but the (N, T, 3·H·D) biased tensor never
    exists in HBM: the projection matmul's output feeds the kernel
    directly. bias: (3*H*D,). d(bias) is the plain row-sum of d(qkv),
    computed by XLA outside the kernel (same reduce it already emits for
    the unfused bias add's backward).
    """
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _qkv_fwd_call(qkv, None, n_heads, d_head, block_rows, bias=bias)


def _exp_mhsa_qkv_bias_fwd(qkv, bias, n_heads, block_rows):
    d_head = qkv.shape[-1] // (3 * n_heads)
    if bwd_residuals() == "probs":
        out, probs = _qkv_fwd_probs_call(qkv, None, n_heads, d_head,
                                         block_rows, bias=bias)
        return out, (qkv, bias, probs)
    out = _qkv_fwd_call(qkv, None, n_heads, d_head, block_rows, bias=bias)
    return out, (qkv, bias, None)


def _exp_mhsa_qkv_bias_bwd(n_heads, block_rows, res, g):
    qkv, bias, probs = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    if probs is not None:
        dqkv = _qkv_bwd_probs_call(qkv, probs, g.astype(qkv.dtype), n_heads,
                                   d_head, block_rows, bias=bias)
    else:
        dqkv = _qkv_bwd_call(qkv, None, g.astype(qkv.dtype), n_heads, d_head,
                             block_rows, bias=bias)
    dbias = jnp.sum(dqkv, axis=(0, 1)).astype(bias.dtype)
    return dqkv, dbias


exp_mhsa_qkv_bias.defvjp(_exp_mhsa_qkv_bias_fwd, _exp_mhsa_qkv_bias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def exp_mhsa_qkv_bias_masked(qkv, bias, key_mask, n_heads: int,
                             block_rows: int = 128):
    """Key-masked variant of exp_mhsa_qkv_bias."""
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _qkv_fwd_call(qkv, key_mask, n_heads, d_head, block_rows,
                         bias=bias)


def _exp_mhsa_qkv_bias_masked_fwd(qkv, bias, key_mask, n_heads, block_rows):
    d_head = qkv.shape[-1] // (3 * n_heads)
    if bwd_residuals() == "probs":
        out, probs = _qkv_fwd_probs_call(qkv, key_mask, n_heads, d_head,
                                         block_rows, bias=bias)
        return out, (qkv, bias, key_mask, probs)
    out = _qkv_fwd_call(qkv, key_mask, n_heads, d_head, block_rows, bias=bias)
    return out, (qkv, bias, key_mask, None)


def _exp_mhsa_qkv_bias_masked_bwd(n_heads, block_rows, res, g):
    qkv, bias, key_mask, probs = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    if probs is not None:
        dqkv = _qkv_bwd_probs_call(qkv, probs, g.astype(qkv.dtype), n_heads,
                                   d_head, block_rows, bias=bias)
    else:
        dqkv = _qkv_bwd_call(qkv, key_mask, g.astype(qkv.dtype), n_heads,
                             d_head, block_rows, bias=bias)
    dbias = jnp.sum(dqkv, axis=(0, 1)).astype(bias.dtype)
    return dqkv, dbias, jnp.zeros_like(key_mask)


exp_mhsa_qkv_bias_masked.defvjp(_exp_mhsa_qkv_bias_masked_fwd,
                                _exp_mhsa_qkv_bias_masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def exp_mhsa_masked(q, k, v, key_mask, n_heads: int, block_rows: int = 128):
    """Fused key-masked exp-normalized MHSA.

    q, k, v: (N, T, n_heads*d_head); key_mask: (N, T) 0/1 float over keys.
    Exact math of scaled_dot_product_attention with a key mask
    (model_utils.py:47-53: mask multiplies after the exp, +1e-8 denominator;
    a fully-masked row yields zeros, not uniform attention).
    """
    d_head = q.shape[-1] // n_heads
    return _masked_fwd_call(q, k, v, key_mask, n_heads, d_head, block_rows)


def _exp_mhsa_masked_fwd(q, k, v, key_mask, n_heads, block_rows):
    d_head = q.shape[-1] // n_heads
    out = _masked_fwd_call(q, k, v, key_mask, n_heads, d_head, block_rows)
    return out, (q, k, v, key_mask)


def _exp_mhsa_masked_bwd(n_heads, block_rows, res, g):
    q, k, v, key_mask = res
    d_head = q.shape[-1] // n_heads
    dq, dk, dv = _masked_bwd_call(q, k, v, key_mask, g.astype(q.dtype),
                                  n_heads, d_head, block_rows)
    # masks are 0/1 batch data, never on a differentiable path
    return dq, dk, dv, jnp.zeros_like(key_mask)


exp_mhsa_masked.defvjp(_exp_mhsa_masked_fwd, _exp_mhsa_masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def exp_mhsa(q, k, v, n_heads: int, block_rows: int = 128):
    """Fused unmasked exp-normalized MHSA.

    q, k, v: (N, T, n_heads*d_head). Returns context (N, T, n_heads*d_head)
    — the exact math of scaled_dot_product_attention with mask=None
    (model_utils.py:47-53), all heads fused in VMEM.
    """
    d_head = q.shape[-1] // n_heads
    return _fwd_call(q, k, v, n_heads, d_head, block_rows)


def _exp_mhsa_fwd(q, k, v, n_heads, block_rows):
    d_head = q.shape[-1] // n_heads
    return _fwd_call(q, k, v, n_heads, d_head, block_rows), (q, k, v)


def _exp_mhsa_bwd(n_heads, block_rows, res, g):
    q, k, v = res
    d_head = q.shape[-1] // n_heads
    dq, dk, dv = _bwd_call(q, k, v, g.astype(q.dtype), n_heads, d_head,
                           block_rows)
    return dq, dk, dv


exp_mhsa.defvjp(_exp_mhsa_fwd, _exp_mhsa_bwd)
