"""Attention blocks: additive attention pooling, exp-normalized scaled-dot
attention, multi-head self attention.

The reference's attention normalization is NOT a standard masked softmax: it
exponentiates raw scores, multiplies the (0/1) mask in AFTER the exp, and
divides by the sum plus 1e-8 (model_utils.py:21-29 and model_utils.py:47-53).
Accuracy parity depends on this exact math — in particular a fully-masked row
yields an all-zero distribution (output 0), not uniform attention.

``masked_exp_normalize`` reproduces that math exactly in float32 while being
numerically stable: it shifts by the row max m and scales the epsilon by
exp(-m), which is algebraically identical to the reference expression
    exp(s_i) * mask_i / (sum_j exp(s_j) * mask_j + eps)
for any m, and avoids overflow for large scores. When every score is below
the float32 exp underflow point the reference's numerator underflows to 0 and
the row collapses to zeros; here exp(-m) saturates to +inf and produces the
same zeros.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.ops.common import linear
from newsrecommendation_tpu.utils import init as pinit

_EPS = 1e-8


def masked_exp_normalize(scores, mask=None, axis: int = -1, eps: float = _EPS):
    """exp(scores)*mask / (sum(exp(scores)*mask) + eps), stably.

    scores: float array; mask: broadcastable 0/1 float or None.
    """
    scores = scores.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(scores, axis=axis, keepdims=True))
    num = jnp.exp(scores - m)
    if mask is not None:
        num = num * mask.astype(num.dtype)
    den = jnp.sum(num, axis=axis, keepdims=True) + eps * jnp.exp(-m)
    # den can be +inf (all scores deeply negative) but never 0: guard anyway.
    return jnp.where(den > 0, num / den, jnp.zeros_like(num))


# --------------------------------------------------------------------------
# Additive attention pooling (reference model_utils.py:7-31)
# --------------------------------------------------------------------------


def init_attention_pooling(key, emb_size: int, hidden_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": pinit.torch_linear(k1, emb_size, hidden_size, dtype),
        "fc2": pinit.torch_linear(k2, hidden_size, 1, dtype),
    }


def attention_pooling(params, x, mask=None):
    """Weighted pooling over axis -2.

    x: (..., S, D); mask: (..., S) or None. Returns (..., D).
    alpha = exp_normalize(fc2(tanh(fc1(x)))), out = sum_s alpha_s * x_s.
    """
    e = jnp.tanh(linear(params["fc1"], x))
    a = linear(params["fc2"], e)[..., 0]  # (..., S)
    alpha = masked_exp_normalize(a, mask, axis=-1)
    return jnp.einsum("...sd,...s->...d", x, alpha.astype(x.dtype))


# --------------------------------------------------------------------------
# Scaled dot-product attention (reference model_utils.py:34-55)
# --------------------------------------------------------------------------


def scaled_dot_product_attention(q, k, v, key_mask=None, d_k: int | None = None):
    """q,k: (..., S, d_k), v: (..., S, d_v); key_mask: (..., S) over keys.

    attn = exp_normalize(q k^T / sqrt(d_k), mask over keys); out = attn v.
    """
    if d_k is None:
        d_k = q.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", q, k) / math.sqrt(d_k)
    mask = None if key_mask is None else key_mask[..., None, :]
    attn = masked_exp_normalize(scores, mask, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", attn.astype(v.dtype), v)


# --------------------------------------------------------------------------
# Multi-head self attention (reference model_utils.py:58-95)
# --------------------------------------------------------------------------


def init_multi_head_self_attention(key, d_model: int, n_heads: int, d_k: int,
                                   d_v: int | None = None, dtype=jnp.float32):
    """Q/K/V projections only — the reference has no output projection."""
    if d_v is None:
        d_v = d_k
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "wq": pinit.xavier_linear(kq, d_model, n_heads * d_k, dtype),
        "wk": pinit.xavier_linear(kk, d_model, n_heads * d_k, dtype),
        "wv": pinit.xavier_linear(kv, d_model, n_heads * d_v, dtype),
    }


def _fused_qkv(params, x):
    """One (d_model, 3*H*d) projection matmul instead of three (see
    multi_head_self_attention). Returns (qkv_2d, (n, s), bias, nq, nk, nv)
    with the bias NOT yet added — the Pallas qkv kernels fold it in VMEM
    (exp_mhsa_qkv_bias*), every other consumer adds it up front.

    The matmul runs on the 2-D (N*S, d_model) view and the 2-D output is
    returned as-is: consumers that want the (N, S, 3·H·d) view reshape it
    themselves (with T=20 that reshape is a physical relayout — the tiling
    tax, docs/PERF.md — so the "2d" attention_io path avoids ever tracing
    the 3-D form)."""
    wq, wk, wv = params["wq"], params["wk"], params["wv"]
    w = jnp.concatenate([wq["w"], wk["w"], wv["w"]], axis=1).astype(x.dtype)
    bias = jnp.concatenate([wq["b"], wk["b"], wv["b"]]).astype(x.dtype)
    n, s, dm = x.shape
    # the NATIVE 2-D dot output — consumers that need the 3-D view reshape
    # it themselves; the "2d"-I/O kernel path consumes this directly (no
    # (N,S,3HD) tensor is ever traced there, so no relayout can appear)
    qkv_2d = jnp.matmul(x.reshape(n * s, dm), w)
    return (qkv_2d, (n, s), bias,
            wq["w"].shape[1], wk["w"].shape[1], wv["w"].shape[1])


def mhsa_dropout_pool(mhsa_params, pool_params, x, mask=None, *,
                      n_heads: int, drop_rate: float = 0.0, rng=None,
                      deterministic: bool = True):
    """The NRMS encoder tail: MHSA -> dropout -> additive attention pooling
    (NRMS.py:23-36 news path; NRMS.py:49-63 user path with drop_rate=0).

    On TPU with Pallas enabled this runs as ONE fused kernel
    (ops/pallas/experimental_fused_encoder.py): the (B, S, H*d) context never exists in
    HBM. Elsewhere it composes the individual ops with identical math.
    x: (B, S, d_model); mask: (B, S) over keys/positions or None.
    Returns (B, n_heads*d_v).
    """
    from newsrecommendation_tpu.ops.common import dropout as _dropout

    qkv_2d, (bx, sx), bias, nq, nk, nv = _fused_qkv(mhsa_params, x)
    use_dropout = (not deterministic) and drop_rate > 0.0

    if nq == nk == nv and nq % n_heads == 0:
        from newsrecommendation_tpu.ops.pallas.config import (
            fused_tail_enabled,
        )
        if fused_tail_enabled(n_heads):
            qkv = qkv_2d.reshape(bx, sx, qkv_2d.shape[-1]) + bias
            from newsrecommendation_tpu.ops.pallas.experimental_fused_encoder import (
                exp_mhsa_pool,
                exp_mhsa_pool_masked,
            )
            if use_dropout:
                seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            w1 = pool_params["fc1"]["w"].astype(x.dtype)
            b1 = pool_params["fc1"]["b"][None, :].astype(jnp.float32)
            w2 = pool_params["fc2"]["w"].astype(x.dtype)
            b2 = pool_params["fc2"]["b"][None, :].astype(jnp.float32)
            if mask is None:
                return exp_mhsa_pool(qkv, w1, b1, w2, b2, seed, n_heads,
                                     float(drop_rate), not use_dropout)
            return exp_mhsa_pool_masked(qkv, mask.astype(jnp.float32), w1,
                                        b1, w2, b2, seed, n_heads,
                                        float(drop_rate), not use_dropout)

    ctx = _mhsa_from_qkv(qkv_2d, (bx, sx), bias, nq, nk, nv, mask,
                         n_heads=n_heads)
    if use_dropout:
        ctx = _dropout(rng, ctx, drop_rate, deterministic)
    return attention_pooling(pool_params, ctx, mask)


def multi_head_self_attention(params, x, mask=None, *, n_heads: int):
    """Self-attention over x: (B, S, d_model); mask: (B, S) over keys.

    Returns (B, S, n_heads*d_v). Same math as the reference head split /
    scaled-dot / exp-normalize / merge (model_utils.py:78-95), but the
    contraction strategy is chosen for the TPU:

    - Small heads (d_k <= 32) and short sequences — the NAML/NRMS regime
      (20 heads x d 20, titles of 20 tokens, histories of 50) — run as
      broadcast-multiply-reduce on the VPU. A (20,20,20) batched matmul
      occupies <3% of the 128x128 MXU; the VPU formulation is ~2x faster
      and fuses with the exp-normalize.
    - Larger heads use batched MXU einsums.

    NOTE: kernel dispatch (pallas mode, attention layout, fused tail) is
    read at PYTHON TRACE TIME. Flipping a switch after a step has been
    jitted leaves the cached executable on the old choice (same shapes, no
    retrace) — call ``jax.clear_caches()`` after ``set_attention_layout``
    etc., or set them before the first jitted call (cli.main does).
    """
    qkv_2d, (b, s), bias, nq, nk, nv = _fused_qkv(params, x)
    return _mhsa_from_qkv(qkv_2d, (b, s), bias, nq, nk, nv, mask,
                          n_heads=n_heads)


def _mhsa_from_qkv(qkv_2d, bs, bias, nq, nk, nv, mask=None, *, n_heads: int):
    """Dispatch MHSA over the un-biased fused projection output.

    qkv_2d: the projection's native (B*S, nq+nk+nv) dot output; each branch
    reshapes to 3-D only if its kernel wants that layout. The fused-qkv
    Pallas kernels fold the bias add in VMEM (exp_mhsa_qkv_bias*, saving
    the standalone (N,S,3·H·d) HBM round trip); every other path
    materializes ``qkv_raw + bias`` first.
    """
    b, s = bs
    qkv_raw = qkv_2d.reshape(b, s, qkv_2d.shape[-1])

    if nq % n_heads == 0:
        from newsrecommendation_tpu.ops.pallas import pallas_enabled
        if pallas_enabled():
            from newsrecommendation_tpu.ops.pallas.config import flash_min_seq
            if nq == nk == nv and s >= flash_min_seq():
                # long sequences: key-axis blockwise flash kernel — the
                # full-T kernels' (bn, T, T) score blocks outgrow VMEM
                from newsrecommendation_tpu.ops.pallas.blockwise import (
                    flash_exp_mhsa,
                    flash_exp_mhsa_masked,
                )
                qkv = qkv_raw + bias
                qf, kf, vf = (qkv[..., :nq], qkv[..., nq:nq + nk],
                              qkv[..., nq + nk:])
                if mask is None:
                    return flash_exp_mhsa(qf, kf, vf, n_heads)
                return flash_exp_mhsa_masked(qf, kf, vf,
                                             mask.astype(jnp.float32),
                                             n_heads)
            if nq == nk == nv:
                # feed the FUSED projection straight to the kernel: no HBM
                # q/k/v splits forward, no dq/dk/dv concat backward (those
                # relayout copies cost more than the attention math — see
                # docs/PERF.md)
                from newsrecommendation_tpu.ops.pallas.config import (
                    attention_layout,
                )
                if attention_layout() == "blanes":
                    from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
                        exp_mhsa_qkv_blanes,
                        exp_mhsa_qkv_blanes_masked,
                    )
                    qkv = qkv_raw + bias
                    if mask is None:
                        return exp_mhsa_qkv_blanes(qkv, n_heads)
                    return exp_mhsa_qkv_blanes_masked(
                        qkv, mask.astype(jnp.float32), n_heads)
                from newsrecommendation_tpu.ops.pallas import (
                    exp_mhsa_qkv_bias,
                    exp_mhsa_qkv_bias_masked,
                )
                from newsrecommendation_tpu.ops.pallas.config import (
                    attention_io,
                    qkv_block_rows,
                )
                br = qkv_block_rows()
                if mask is None:
                    if attention_io() == "2d":
                        # native 2-D projection output straight into the
                        # kernel: the (B,S,3HD) tensor is never traced, so
                        # the T=20 relayout copy cannot exist (qkv2d.py)
                        from newsrecommendation_tpu.ops.pallas.experimental_qkv2d import (
                            exp_mhsa_qkv_bias_2d,
                        )
                        return exp_mhsa_qkv_bias_2d(qkv_2d, bias, n_heads,
                                                    s, br)
                    return exp_mhsa_qkv_bias(qkv_raw, bias, n_heads, br)
                return exp_mhsa_qkv_bias_masked(qkv_raw, bias,
                                                mask.astype(jnp.float32),
                                                n_heads, br)
            qkv = qkv_raw + bias
            if mask is None:
                from newsrecommendation_tpu.ops.pallas import exp_mhsa
                return exp_mhsa(qkv[..., :nq], qkv[..., nq:nq + nk],
                                qkv[..., nq + nk:], n_heads)
            from newsrecommendation_tpu.ops.pallas import exp_mhsa_masked
            return exp_mhsa_masked(qkv[..., :nq], qkv[..., nq:nq + nk],
                                   qkv[..., nq + nk:],
                                   mask.astype(jnp.float32), n_heads)

    qkv = qkv_raw + bias
    qf = qkv[..., :nq]
    kf = qkv[..., nq:nq + nk]
    vf = qkv[..., nq + nk:]

    q = qf.reshape(b, s, n_heads, -1)
    k = kf.reshape(b, s, n_heads, -1)
    v = vf.reshape(b, s, n_heads, -1)
    d_k = q.shape[-1]

    if d_k <= 32 and s <= 128:
        # (b, q, k, h) scores via VPU; reduce over the tiny d axis
        scores = (q[:, :, None] * k[:, None, :]).sum(-1) / math.sqrt(d_k)
        m = None if mask is None else mask[:, None, :, None]
        attn = masked_exp_normalize(scores, m, axis=2)
        ctx = (attn[..., None].astype(v.dtype) * v[:, None]).sum(2)  # (b,q,h,d)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
        m = None if mask is None else mask[:, None, None, :]
        attn = masked_exp_normalize(scores, m, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
    return ctx.reshape(b, s, -1)
