"""Key-axis blockwise (flash-style) exp-normalized MHSA — the growth path.

The production kernels (fused_attention.py) hold a full (bn, T, T) score
matrix per head in VMEM — ideal at the reference's T<=50 but quadratic in
sequence length. This variant streams the KEY axis in blocks with an
online max/sum (flash attention), so ``user_log_length`` can grow past the
VMEM limit: per grid step only (bn, T_q, block_kv) scores exist, and the
running (m, l, acc) state lives in VMEM scratch across the sequential
key-block grid dimension. SURVEY.md §5 names this the designed
long-context path ("blockwise Pallas attention kernel (flash-style online
softmax) so L can grow"); the reference itself only truncates
(dataset.py:17-24).

Math contract — identical to fused_attention.py / ops.attention:
  a = exp(s) * key_mask / (sum_k exp(s) * key_mask + 1e-8)
online-shifted by the running max m, with the epsilon scaled by exp(-m)
(algebraically exact, see ops/attention.py docstring).

Backward is blockwise too: the forward saves the per-row (m, den)
statistics (linear in T) plus the output; dq accumulates across key blocks
in scratch while each (dk, dv) key block is produced in its own grid cell
(self-attention: rows are independent batch items, so no cross-block
reduction of dk/dv is needed). delta = sum_d g*out is precomputed outside
the kernel.

Layout: q, k, v are (N, T, H*D) like exp_mhsa (the separate-operand form —
at the lengths where this kernel matters, the qkv-fusion I/O trick of the
short-T kernels is irrelevant). Crossover guidance (measured, see
docs/PERF.md): below T ≈ a few hundred the full-T kernels win (one grid
pass, no rescaling traffic); use this one when (bn·T²·H) scores no longer
fit VMEM — roughly T >= 512 at the NRMS head layout.
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
_NEG_BIG = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, den_ref,
                      acc_s, m_s, l_s, *, n_heads, d_head, kv_blocks):
    j = pl.program_id(1)
    inv = 1.0 / math.sqrt(d_head)

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_BIG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    mask = None if mask_ref is None else (
        mask_ref[...].astype(jnp.float32)[:, None, :])  # (bn, 1, bkv)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv                                        # (bn, Tq, bkv)
        m_old = m_s[:, :, h]                           # (bn, Tq)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
        scale = jnp.exp(m_old - m_new)                 # (bn, Tq)
        e = jnp.exp(s - m_new[:, :, None])
        if mask is not None:
            e = e * mask
        l_s[:, :, h] = l_s[:, :, h] * scale + jnp.sum(e, axis=-1)
        vh = v_ref[:, :, sl]
        pv = jax.lax.dot_general(
            e.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # (bn, Tq, D)
        acc_s[:, :, sl] = acc_s[:, :, sl] * scale[:, :, None] + pv
        m_s[:, :, h] = m_new

    @pl.when(j == kv_blocks - 1)
    def _finalize():
        m = m_s[...]
        den = l_s[...] + _EPS * jnp.exp(-m)            # (bn, Tq, H)
        m_ref[...] = m
        den_ref[...] = den
        for h in range(n_heads):
            sl = slice(h * d_head, (h + 1) * d_head)
            o_ref[:, :, sl] = (acc_s[:, :, sl]
                               / den[:, :, h][:, :, None]).astype(o_ref.dtype)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, m_ref, den_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref, dq_s,
                      *, n_heads, d_head, kv_blocks):
    j = pl.program_id(1)
    inv = 1.0 / math.sqrt(d_head)

    @pl.when(j == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    mask = None if mask_ref is None else (
        mask_ref[...].astype(jnp.float32)[:, None, :])
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        gh = g_ref[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv
        e = jnp.exp(s - m_ref[:, :, h][:, :, None])
        if mask is not None:
            e = e * mask
        a = e / den_ref[:, :, h][:, :, None]           # (bn, Tq, bkv)
        al = a.astype(gh.dtype)
        dv = jax.lax.dot_general(                      # sum_q a[q,k] g[q,d]
            al, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        da = jax.lax.dot_general(                      # g[q,:].v[k,:]
            gh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (da - delta_ref[:, :, h][:, :, None]) * a * inv
        dsl = ds.astype(kh.dtype)
        dq_s[:, :, sl] += jax.lax.dot_general(
            dsl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dsl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)

    @pl.when(j == kv_blocks - 1)
    def _write_dq():
        dq_ref[...] = dq_s[...].astype(dq_ref.dtype)


def _kv_blocks(t: int, target: int) -> int:
    return _block_rows(t, target)


def _fwd_call(q, k, v, mask, n_heads, block_rows, block_kv):
    n, t, hd = q.shape
    d_head = hd // n_heads
    bn = _block_rows(n, block_rows)
    bkv = _kv_blocks(t, block_kv)
    kvb = t // bkv
    grid = (n // bn, kvb)

    q_spec = pl.BlockSpec((bn, t, hd), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bn, bkv, hd), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, bkv), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bn, t, n_heads), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _flash_fwd_kernel, n_heads=n_heads, d_head=d_head, kv_blocks=kvb)
    if mask is None:
        kernel = functools.partial(
            lambda qr, kr, vr, *outs_scratch, kern: kern(
                qr, kr, vr, None, *outs_scratch),
            kern=kernel)
        in_specs = [q_spec, kv_spec, kv_spec]
        args = (q, k, v)
    else:
        in_specs = [q_spec, kv_spec, kv_spec, m_spec]
        args = (q, k, v, mask)

    out, m, den = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hd), q.dtype),
            jax.ShapeDtypeStruct((n, t, n_heads), jnp.float32),
            jax.ShapeDtypeStruct((n, t, n_heads), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(q_spec, stat_spec, stat_spec),
        scratch_shapes=[
            pltpu.VMEM((bn, t, hd), jnp.float32),       # acc
            pltpu.VMEM((bn, t, n_heads), jnp.float32),  # running max
            pltpu.VMEM((bn, t, n_heads), jnp.float32),  # running sum
        ],
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * n_heads * t * t * d_head,
            bytes_accessed=(3 * q.size + q.size) * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(*args)
    return out, m, den


def _bwd_call(q, k, v, mask, g, m, den, delta, n_heads, block_rows, block_kv):
    n, t, hd = q.shape
    d_head = hd // n_heads
    bn = _block_rows(n, max(block_rows // 2, 1))
    bkv = _kv_blocks(t, block_kv)
    kvb = t // bkv
    grid = (n // bn, kvb)

    q_spec = pl.BlockSpec((bn, t, hd), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bn, bkv, hd), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((bn, bkv), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bn, t, n_heads), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _flash_bwd_kernel, n_heads=n_heads, d_head=d_head, kv_blocks=kvb)
    if mask is None:
        kernel = functools.partial(
            lambda qr, kr, vr, gr, mr, dr, er, *outs_scratch, kern: kern(
                qr, kr, vr, None, gr, mr, dr, er, *outs_scratch),
            kern=kernel)
        in_specs = [q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec,
                    stat_spec]
        args = (q, k, v, g, m, den, delta)
    else:
        in_specs = [q_spec, kv_spec, kv_spec, m_spec, q_spec, stat_spec,
                    stat_spec, stat_spec]
        args = (q, k, v, mask, g, m, den, delta)

    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hd), q.dtype),
            jax.ShapeDtypeStruct((n, t, hd), k.dtype),
            jax.ShapeDtypeStruct((n, t, hd), v.dtype),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(q_spec, kv_spec, kv_spec),
        scratch_shapes=[pltpu.VMEM((bn, t, hd), jnp.float32)],  # dq acc
        interpret=pallas_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * n_heads * t * t * d_head,
            bytes_accessed=(6 * q.size) * q.dtype.itemsize,
            transcendentals=n * n_heads * t * t,
        ),
    )(*args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_exp_mhsa(q, k, v, n_heads: int, block_rows: int = 128,
                   block_kv: int = 256):
    """Key-axis blockwise exp-MHSA (exp_mhsa contract, unmasked)."""
    out, _, _ = _fwd_call(q, k, v, None, n_heads, block_rows, block_kv)
    return out


def _flash_vjp_fwd(q, k, v, n_heads, block_rows, block_kv):
    out, m, den = _fwd_call(q, k, v, None, n_heads, block_rows, block_kv)
    return out, (q, k, v, out, m, den)


def _flash_vjp_bwd(n_heads, block_rows, block_kv, res, g):
    q, k, v, out, m, den = res
    d_head = q.shape[-1] // n_heads
    delta = jnp.sum(
        g.astype(jnp.float32).reshape(*g.shape[:2], n_heads, d_head)
        * out.astype(jnp.float32).reshape(*out.shape[:2], n_heads, d_head),
        axis=-1)                                        # (n, T, H)
    dq, dk, dv = _bwd_call(q, k, v, None, g.astype(q.dtype), m, den, delta,
                           n_heads, block_rows, block_kv)
    return dq, dk, dv


flash_exp_mhsa.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_exp_mhsa_masked(q, k, v, key_mask, n_heads: int,
                          block_rows: int = 128, block_kv: int = 256):
    """Key-masked blockwise exp-MHSA (exp_mhsa_masked contract)."""
    out, _, _ = _fwd_call(q, k, v, key_mask, n_heads, block_rows, block_kv)
    return out


def _flash_masked_vjp_fwd(q, k, v, key_mask, n_heads, block_rows, block_kv):
    out, m, den = _fwd_call(q, k, v, key_mask, n_heads, block_rows, block_kv)
    return out, (q, k, v, key_mask, out, m, den)


def _flash_masked_vjp_bwd(n_heads, block_rows, block_kv, res, g):
    q, k, v, key_mask, out, m, den = res
    d_head = q.shape[-1] // n_heads
    delta = jnp.sum(
        g.astype(jnp.float32).reshape(*g.shape[:2], n_heads, d_head)
        * out.astype(jnp.float32).reshape(*out.shape[:2], n_heads, d_head),
        axis=-1)
    dq, dk, dv = _bwd_call(q, k, v, key_mask, g.astype(q.dtype), m, den,
                           delta, n_heads, block_rows, block_kv)
    return dq, dk, dv, jnp.zeros_like(key_mask)


flash_exp_mhsa_masked.defvjp(_flash_masked_vjp_fwd, _flash_masked_vjp_bwd)
