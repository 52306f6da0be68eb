"""2-D-I/O variant of the fused exp-MHSA QKV kernels (sublane regrouping).

Motivation (docs/PERF.md r2-r4, the "T=20 tiling tax"): with T=20 the
(8,128) sublane tiling of (N,20,W) and (N*20,W) differ — each 20-row slab
of the 3-D form pads to 24 sublanes — so the QKV projection's natural 2-D
dot output cannot bitcast into the 3-D operand the production kernels
take, and XLA inserts a full (N,T,3HD) relayout copy (~1.3 ms/step at the
bench shape). These kernels instead take the projection output in its
NATIVE 2-D layout (N*T, 3HD) — dense tiling, no relayout, no sublane
padding on the kernel's biggest operand — and regroup (bn*T, W) ->
(bn, T, W) inside VMEM where a relayout costs VMEM bandwidth, not HBM.

The backward emits dqkv in the same 2-D layout, which is exactly what the
projection's dW/dx dots contract over (they flatten to (N*T, ·) anyway),
removing the mirror-image relayout on the gradient path.

Math is bit-identical to fused_attention._qkv_fwd_kernel /
_qkv_bwd_probs_kernel (the reference's exp/mask/+1e-8 normalization,
model_utils.py:47-53, max-shift-stabilized); only operand layouts differ.
Saved-probs backward only (the production default — PERF.md r3 A/B).

Status: MEASURED REJECTION (round 4, TPU v5e, kbench_attention
--variants headloop,qkv2d, N=7040 bf16): forward 20.94 ms vs the 3-D
headloop's 10.93 ms — outputs bit-identical, but Mosaic lowers the
whole-block (bn*T, W) -> (bn, T, W) VMEM reshape as a slow copy (~9 ms
per pass, ~7x the HBM relayout it was meant to replace) and the forward
alone cost ~25 min of Mosaic lowering. The relayout tax is cheaper paid
in HBM than regrouped in VMEM at these shapes. Kept (with interpret-mode
bit-equality tests) as the recorded experiment; dispatch stays "3d"
(config.attention_io). See docs/PERF.md round 4.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsrecommendation_tpu.ops.pallas.config import pallas_interpret
from newsrecommendation_tpu.ops.pallas.fused_attention import (
    _capped_block_rows,
)

_EPS = 1e-8


def _fwd2d_kernel(qkv_ref, bias_ref, o_ref, probs_ref, *, n_heads, d_head,
                  t, mask_ref=None):
    """qkv_ref: (bn*t, 3HD) 2-D; o_ref: (bn, t, HD); probs_ref: (bn, t, H*t).

    One in-VMEM regroup of the whole block, then the production per-head
    loop (fused_attention._qkv_fwd_kernel semantics).
    """
    w3 = qkv_ref.shape[-1]
    bn = qkv_ref.shape[0] // t
    qkv2 = qkv_ref[...]
    if bias_ref is not None:
        qkv2 = qkv2 + bias_ref[...]
    qkv = qkv2.reshape(bn, t, w3)
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
        probs_ref[:, :, h * t:(h + 1) * t] = a.astype(probs_ref.dtype)
        vh = qkv[:, :, v_sl]
        ctx = jax.lax.dot_general(
            a.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, q_sl] = ctx.astype(o_ref.dtype)


def _bwd2d_probs_kernel(qkv_ref, bias_ref, probs_ref, g_ref, dqkv_ref,
                        scratch_ref, *, n_heads, d_head, t):
    """Saved-probs backward with 2-D qkv in and 2-D dqkv out.

    Per-head gradients are staged in a (bn, t, 3HD) VMEM scratch; ONE
    regroup writes the 2-D output block (fused_attention.
    _qkv_bwd_probs_kernel math).
    """
    w3 = qkv_ref.shape[-1]
    bn = qkv_ref.shape[0] // t
    qkv2 = qkv_ref[...]
    if bias_ref is not None:
        qkv2 = qkv2 + bias_ref[...]
    qkv = qkv2.reshape(bn, t, w3)
    g = g_ref[...]
    probs = probs_ref[...]
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
        scratch_ref[:, :, q_sl] = dq.astype(scratch_ref.dtype)
        scratch_ref[:, :, k_sl] = dk.astype(scratch_ref.dtype)
        scratch_ref[:, :, v_sl] = dv.astype(scratch_ref.dtype)
    dqkv_ref[...] = scratch_ref[...].reshape(bn * t, w3)


def _fwd2d_call(qkv2d, bias, mask, n_heads, d_head, t, block_rows):
    nt, w3 = qkv2d.shape
    n = nt // t
    w1 = w3 // 3
    wp = n_heads * t
    bn = _capped_block_rows(n, block_rows, t, w3, w1, qkv2d.dtype.itemsize,
                            extra_row_bytes=4 * t * wp)
    in_specs = [pl.BlockSpec((bn * t, w3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv2d]
    kernel_kw = {}
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, w3), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, w3).astype(qkv2d.dtype))
        kernel = functools.partial(_fwd2d_kernel, n_heads=n_heads,
                                   d_head=d_head, t=t, **kernel_kw)
    else:
        kernel = functools.partial(
            lambda qkv_ref, o_ref, probs_ref, **kw: _fwd2d_kernel(
                qkv_ref, None, o_ref, probs_ref, **kw),
            n_heads=n_heads, d_head=d_head, t=t)
    if mask is not None:
        raise NotImplementedError(
            "qkv2d masked forward: promote after the unmasked A/B")
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, t, w1), qkv2d.dtype),
                   jax.ShapeDtypeStruct((n, t, wp), jnp.float32)),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((bn, t, w1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bn, t, wp), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=(qkv2d.size + n * t * w1) * qkv2d.dtype.itemsize
            + 4 * n * t * wp,
            transcendentals=n * n_heads * t * t,
        ),
    )(*args)


def _bwd2d_call(qkv2d, bias, probs, g, n_heads, d_head, t, block_rows):
    nt, w3 = qkv2d.shape
    n = nt // t
    w1 = w3 // 3
    wp = n_heads * t
    bn = _capped_block_rows(n, max(block_rows // 2, 1), t, 2 * w3 + w1, w1,
                            qkv2d.dtype.itemsize,
                            extra_row_bytes=4 * t * wp
                            + w3 * qkv2d.dtype.itemsize)
    in_specs = [pl.BlockSpec((bn * t, w3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv2d]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, w3), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, w3).astype(qkv2d.dtype))
        kernel = functools.partial(_bwd2d_probs_kernel, n_heads=n_heads,
                                   d_head=d_head, t=t)
    else:
        kernel = functools.partial(
            lambda qkv_ref, probs_ref, g_ref, dqkv_ref, scratch_ref, **kw:
            _bwd2d_probs_kernel(qkv_ref, None, probs_ref, g_ref, dqkv_ref,
                                scratch_ref, **kw),
            n_heads=n_heads, d_head=d_head, t=t)
    in_specs.extend([
        pl.BlockSpec((bn, t, wp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, t, w1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ])
    args.extend([probs, g])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, w3), qkv2d.dtype),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn * t, w3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bn, t, w3), qkv2d.dtype)],
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * n_heads * t * t * d_head,
            bytes_accessed=(2 * qkv2d.size + 2 * n * t * w1)
            * qkv2d.dtype.itemsize + 4 * n * t * wp,
            transcendentals=0,
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def exp_mhsa_qkv_bias_2d(qkv2d, bias, n_heads: int, t: int,
                         block_rows: int = 128):
    """exp_mhsa_qkv_bias with 2-D qkv I/O.

    qkv2d: (N*t, 3*H*D) — the projection's NATIVE 2-D dot output, no
    3-D relayout. bias: (3*H*D,). Returns context (N, t, H*D) (3-D, so
    the downstream pooling sees the layout it already handles).
    Backward returns dqkv in the same (N*t, 3*H*D) layout.
    """
    d_head = qkv2d.shape[-1] // (3 * n_heads)
    out, _ = _fwd2d_call(qkv2d, bias, None, n_heads, d_head, t, block_rows)
    return out


def _exp_mhsa_qkv_bias_2d_fwd(qkv2d, bias, n_heads, t, block_rows):
    d_head = qkv2d.shape[-1] // (3 * n_heads)
    out, probs = _fwd2d_call(qkv2d, bias, None, n_heads, d_head, t,
                             block_rows)
    return out, (qkv2d, bias, probs)


def _exp_mhsa_qkv_bias_2d_bwd(n_heads, t, block_rows, res, g):
    qkv2d, bias, probs = res
    d_head = qkv2d.shape[-1] // (3 * n_heads)
    dqkv = _bwd2d_call(qkv2d, bias, probs, g.astype(qkv2d.dtype), n_heads,
                       d_head, t, block_rows)
    dbias = jnp.sum(dqkv, axis=0).astype(bias.dtype)
    return dqkv, dbias


exp_mhsa_qkv_bias_2d.defvjp(_exp_mhsa_qkv_bias_2d_fwd,
                            _exp_mhsa_qkv_bias_2d_bwd)
