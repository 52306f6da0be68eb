"""Fused encoder tail — exp-MHSA + dropout + additive attention pooling in
one Pallas TPU kernel.

The NRMS encoder tail (reference NRMS.py:23-36 news encoder, NRMS.py:49-63
user encoder) is MHSA -> dropout -> AttentionPooling. Composed from separate
ops, the (N, T, H*D) context tensor makes three HBM round trips (kernel out,
dropout in/out, pooling in x2) plus a dropout-mask stream and the (N, T, Q)
tanh intermediate. This kernel keeps the entire tail in VMEM: HBM traffic is
exactly qkv in + pooled (N, H*D) out.

Dropout bits come from a stateless counter hash over (element index, seed,
grid block id) — see _keep_mask — so the backward kernel regenerates the
identical keep mask and nothing is saved between passes: the custom VJP
recomputes attention, dropout, and pooling from qkv alone.

Pooling math is the reference AttentionPooling (model_utils.py:21-29):
alpha = exp_normalize(w2.tanh(W1 ctx + b1) + b2), out = sum_t alpha_t ctx_t,
with the +1e-8 denominator, applied to the POST-dropout context exactly like
the composed path. Attention math matches fused_attention.py (exp-normalize
with the epsilon scaled by exp(-max); key mask multiplies after the exp).

Gradients for the pooling parameters (W1, b1, w2, b2) are accumulated across
the sequential TPU grid into single output blocks (init at block 0, += after)
— the standard revisited-output reduction pattern.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsrecommendation_tpu.ops.pallas.config import pallas_interpret
from newsrecommendation_tpu.ops.pallas.fused_attention import _block_rows

_EPS = 1e-8


def _attention_ctx(qkv, mask, n_heads, d_head):
    """Per-head exp-MHSA in VMEM; returns (ctx_f32, per-head residuals)."""
    hd = n_heads * d_head
    inv = 1.0 / math.sqrt(d_head)
    outs = []
    residuals = []
    for h in range(n_heads):
        q_sl = slice(h * d_head, (h + 1) * d_head)
        k_sl = slice(hd + h * d_head, hd + (h + 1) * d_head)
        v_sl = slice(2 * hd + h * d_head, 2 * hd + (h + 1) * d_head)
        qh = qkv[:, :, q_sl]
        kh = qkv[:, :, k_sl]
        vh = qkv[:, :, v_sl]
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
        ctx_h = jax.lax.dot_general(
            a.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(ctx_h)
        residuals.append((qh, kh, vh, a))
    return jnp.concatenate(outs, axis=-1), residuals


def _keep_mask(shape, drop_rate, seed, block_id):
    """Regenerable dropout keep/scale mask.

    Stateless counter-based bits: SplitMix32-style avalanche over the
    element's GLOBAL flat index (block_id folds into the row index, so the
    mask is independent of the grid blocking — forward and backward run
    with different block sizes) mixed with the per-call seed. Pure VPU
    integer ops — identical results compiled and under interpret mode (the
    pltpu hardware PRNG has no interpret implementation), and trivially
    regenerated in the backward kernel with the same seed.
    """
    bn, t, hd = shape
    i0 = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    i2 = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    row = block_id.astype(jnp.uint32) * np.uint32(bn) + i0
    x = (row * np.uint32(t * hd) + i1 * np.uint32(hd) + i2)
    x = x + seed.astype(jnp.uint32) * np.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thr = np.uint32(min(int(round(drop_rate * 2.0**32)), 2**32 - 1))
    keep = (x >= thr).astype(jnp.float32)
    return keep * (1.0 / (1.0 - drop_rate))


def _pool_fwd(ctx, mask, w1, b1, w2, b2):
    """Additive attention pooling on f32 ctx; returns (out, e, alpha)."""
    ctx_l = ctx.astype(w1.dtype)
    z = jax.lax.dot_general(
        ctx_l, w1, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1[0]
    e = jnp.tanh(z)
    a = jax.lax.dot_general(
        e.astype(w2.dtype), w2, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0] + b2[0, 0]                                # (bn, T)
    m = jnp.max(a, axis=-1, keepdims=True)
    en = jnp.exp(a - m)
    if mask is not None:
        en = en * mask
    den = jnp.sum(en, axis=-1, keepdims=True) + _EPS * jnp.exp(-m)
    alpha = en / den
    out = jax.lax.dot_general(
        alpha[:, None, :].astype(ctx.dtype), ctx,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                          # (bn, HD)
    return out, e, alpha


def _fwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                n_heads, d_head, drop_rate, deterministic, mask_ref=None):
    qkv = qkv_ref[...]
    mask = (None if mask_ref is None
            else mask_ref[...].astype(jnp.float32)[:, None, :])
    ctx, _ = _attention_ctx(qkv, mask, n_heads, d_head)
    if not deterministic and drop_rate > 0.0:
        ctx = ctx * _keep_mask(ctx.shape, drop_rate, seed_ref[0],
                               pl.program_id(0))
    pmask = None if mask_ref is None else mask[:, 0, :]
    out, _, _ = _pool_fwd(ctx, pmask, w1_ref[...], b1_ref[...], w2_ref[...],
                          b2_ref[...])
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dqkv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                n_heads, d_head, drop_rate, deterministic, mask_ref=None):
    qkv = qkv_ref[...]
    mask = (None if mask_ref is None
            else mask_ref[...].astype(jnp.float32)[:, None, :])
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    g = g_ref[...].astype(jnp.float32)                  # (bn, HD)
    inv = 1.0 / math.sqrt(d_head)

    # ---- recompute forward up to pooling ----
    ctx_pre, residuals = _attention_ctx(qkv, mask, n_heads, d_head)
    if not deterministic and drop_rate > 0.0:
        keep = _keep_mask(ctx_pre.shape, drop_rate, seed_ref[0],
                          pl.program_id(0))
        ctx = ctx_pre * keep
    else:
        keep = None
        ctx = ctx_pre
    pmask = None if mask_ref is None else mask[:, 0, :]
    _, e, alpha = _pool_fwd(ctx, pmask, w1, b1_ref[...], w2, b2_ref[...])

    # ---- pooling backward ----
    # out = sum_t alpha_t ctx_t
    d_alpha = jax.lax.dot_general(
        ctx, g, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # (bn, T)
    d_ctx = alpha[:, :, None] * g[:, None, :]           # (bn, T, HD)
    # exp-normalize backward (m is stop_gradient; alpha carries the mask)
    d_a = (d_alpha - jnp.sum(d_alpha * alpha, axis=-1, keepdims=True)) * alpha
    # a = e @ w2 + b2
    # Param grads contract over BOTH (bn, t); Mosaic's tpu.matmul only
    # supports a single contracting dim, so dw2 runs as a VPU
    # multiply+reduce and dw1 accumulates t single-contraction dots.
    d_e = d_a[:, :, None] * w2[:, 0][None, None, :].astype(jnp.float32)
    dw2 = jnp.sum(e * d_a[:, :, None], axis=(0, 1))[:, None]   # (Q, 1)
    db2 = jnp.sum(d_a)[None, None]                      # (1, 1)
    # e = tanh(ctx @ w1 + b1)
    d_z = d_e * (1.0 - e * e)
    db1 = jnp.sum(d_z, axis=(0, 1))[None, :]            # (1, Q)
    ctx_l = ctx.astype(d_z.dtype)
    dw1 = jnp.zeros((ctx.shape[2], d_z.shape[2]), jnp.float32)  # (HD, Q)
    for i in range(ctx.shape[1]):
        dw1 = dw1 + jax.lax.dot_general(
            ctx_l[:, i, :], d_z[:, i, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    d_ctx = d_ctx + jax.lax.dot_general(
        d_z.astype(w1.dtype), w1, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if keep is not None:
        d_ctx = d_ctx * keep

    # ---- attention backward (exact fused_attention.py math) ----
    hd = n_heads * d_head
    d_ctx = d_ctx.astype(qkv.dtype)
    for h in range(n_heads):
        q_sl = slice(h * d_head, (h + 1) * d_head)
        k_sl = slice(hd + h * d_head, hd + (h + 1) * d_head)
        v_sl = slice(2 * hd + h * d_head, 2 * hd + (h + 1) * d_head)
        qh, kh, vh, a = residuals[h]
        gh = d_ctx[:, :, q_sl]
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

    # ---- accumulate pooling-param grads across the sequential grid ----
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dw1_ref[...] += dw1.astype(dw1_ref.dtype)
    db1_ref[...] += db1.astype(db1_ref.dtype)
    dw2_ref[...] += dw2.astype(dw2_ref.dtype)
    db2_ref[...] += db2.astype(db2_ref.dtype)


def _param_specs(hd, q):
    whole = lambda i: (0, 0)
    return [
        pl.BlockSpec((hd, q), whole, memory_space=pltpu.VMEM),    # w1
        pl.BlockSpec((1, q), whole, memory_space=pltpu.VMEM),     # b1
        pl.BlockSpec((q, 1), whole, memory_space=pltpu.VMEM),     # w2
        pl.BlockSpec((1, 1), whole, memory_space=pltpu.VMEM),     # b2
    ]


def _fwd_call(qkv, key_mask, w1, b1, w2, b2, seed, n_heads, d_head,
              drop_rate, deterministic, block_rows):
    n, t, w3 = qkv.shape
    hd = w3 // 3
    q = w1.shape[1]
    bn = _block_rows(n, block_rows)
    qkv_spec = pl.BlockSpec((bn, t, w3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, hd), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM), qkv_spec]
                + _param_specs(hd, q)
                + ([] if key_mask is None else [m_spec]))
    kernel = functools.partial(
        _fwd_kernel if key_mask is None else _masked_fwd_kernel,
        n_heads=n_heads, d_head=d_head, drop_rate=drop_rate,
        deterministic=deterministic)
    args = ((seed, qkv, w1, b1, w2, b2) if key_mask is None
            else (seed, qkv, w1, b1, w2, b2, key_mask))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hd), qkv.dtype),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=o_spec,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head + 4 * n * t * hd * q,
            bytes_accessed=(qkv.size + n * hd) * qkv.dtype.itemsize,
            transcendentals=n * (n_heads + 1) * t * t,
        ),
    )(*args)


def _masked_fwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       mask_ref, o_ref, **kw):
    _fwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                mask_ref=mask_ref, **kw)


def _masked_bwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       mask_ref, g_ref, dqkv_ref, dw1_ref, db1_ref, dw2_ref,
                       db2_ref, **kw):
    _bwd_kernel(seed_ref, qkv_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dqkv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                mask_ref=mask_ref, **kw)


def _bwd_call(qkv, key_mask, w1, b1, w2, b2, seed, g, n_heads, d_head,
              drop_rate, deterministic, block_rows):
    n, t, w3 = qkv.shape
    hd = w3 // 3
    q = w1.shape[1]
    bn = _block_rows(n, max(block_rows // 2, 1))
    qkv_spec = pl.BlockSpec((bn, t, w3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((bn, hd), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, t), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspecs = _param_specs(hd, q)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM), qkv_spec] + pspecs
                + ([] if key_mask is None else [m_spec]) + [g_spec])
    # param-grad outputs revisit block (0,0) every grid step: accumulated
    out_specs = (qkv_spec, *pspecs)
    out_shape = (
        jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
    )
    kernel = functools.partial(
        _bwd_kernel if key_mask is None else _masked_bwd_kernel,
        n_heads=n_heads, d_head=d_head, drop_rate=drop_rate,
        deterministic=deterministic)
    args = ((seed, qkv, w1, b1, w2, b2, g) if key_mask is None
            else (seed, qkv, w1, b1, w2, b2, key_mask, g))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n_heads * t * t * d_head + 12 * n * t * hd * q,
            bytes_accessed=(2 * qkv.size + n * hd) * qkv.dtype.itemsize,
            transcendentals=n * (n_heads + 1) * t * t,
        ),
    )(*args)


def _int_zero_tangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def exp_mhsa_pool(qkv, w1, b1, w2, b2, seed, n_heads: int,
                  drop_rate: float, deterministic: bool,
                  block_rows: int = 128):
    """Fused unmasked encoder tail.

    qkv: (N, T, 3*H*D) fused projection output; w1 (H*D, Q), b1 (1, Q),
    w2 (Q, 1), b2 (1, 1) pooling params; seed (1,) int32 dropout stream.
    Returns pooled news vectors (N, H*D) in qkv's dtype.
    """
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _fwd_call(qkv, None, w1, b1, w2, b2, seed, n_heads, d_head,
                     drop_rate, deterministic, block_rows)


def _pool_fwd_rule(qkv, w1, b1, w2, b2, seed, n_heads, drop_rate,
                   deterministic, block_rows):
    out = exp_mhsa_pool(qkv, w1, b1, w2, b2, seed, n_heads, drop_rate,
                        deterministic, block_rows)
    return out, (qkv, w1, b1, w2, b2, seed)


def _pool_bwd_rule(n_heads, drop_rate, deterministic, block_rows, res, g):
    qkv, w1, b1, w2, b2, seed = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    dqkv, dw1, db1, dw2, db2 = _bwd_call(
        qkv, None, w1, b1, w2, b2, seed, g.astype(qkv.dtype), n_heads,
        d_head, drop_rate, deterministic, block_rows)
    return (dqkv, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            _int_zero_tangent(seed))


exp_mhsa_pool.defvjp(_pool_fwd_rule, _pool_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def exp_mhsa_pool_masked(qkv, key_mask, w1, b1, w2, b2, seed, n_heads: int,
                         drop_rate: float, deterministic: bool,
                         block_rows: int = 128):
    """Key-masked fused encoder tail: the 0/1 key_mask (N, T) multiplies
    after the exp in BOTH the MHSA scores and the pooling scores (reference
    NRMS.py:49-63 user-encoder semantics)."""
    d_head = qkv.shape[-1] // (3 * n_heads)
    return _fwd_call(qkv, key_mask, w1, b1, w2, b2, seed, n_heads, d_head,
                     drop_rate, deterministic, block_rows)


def _pool_masked_fwd_rule(qkv, key_mask, w1, b1, w2, b2, seed, n_heads,
                          drop_rate, deterministic, block_rows):
    out = exp_mhsa_pool_masked(qkv, key_mask, w1, b1, w2, b2, seed, n_heads,
                               drop_rate, deterministic, block_rows)
    return out, (qkv, key_mask, w1, b1, w2, b2, seed)


def _pool_masked_bwd_rule(n_heads, drop_rate, deterministic, block_rows,
                          res, g):
    qkv, key_mask, w1, b1, w2, b2, seed = res
    d_head = qkv.shape[-1] // (3 * n_heads)
    dqkv, dw1, db1, dw2, db2 = _bwd_call(
        qkv, key_mask, w1, b1, w2, b2, seed, g.astype(qkv.dtype), n_heads,
        d_head, drop_rate, deterministic, block_rows)
    return (dqkv, jnp.zeros_like(key_mask), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype),
            _int_zero_tangent(seed))


exp_mhsa_pool_masked.defvjp(_pool_masked_fwd_rule, _pool_masked_bwd_rule)
