"""Pallas kernels vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu.ops import attention as A
from newsrecommendation_tpu.ops.pallas import (
    exp_mhsa,
    exp_mhsa_masked,
    exp_mhsa_qkv,
    exp_mhsa_qkv_masked,
    set_pallas_mode,
)
from newsrecommendation_tpu.ops.pallas.fused_attention import _block_rows


@pytest.fixture(autouse=True)
def _interpret_mode():
    set_pallas_mode("interpret")
    yield
    set_pallas_mode("auto")


def ref_attention(q, k, v, n_heads):
    """jnp reference: per-head exp-normalized attention on (N, T, H*D)."""
    n, t, hd = q.shape
    d = hd // n_heads
    q4 = q.reshape(n, t, n_heads, d)
    k4 = k.reshape(n, t, n_heads, d)
    v4 = v.reshape(n, t, n_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / np.sqrt(d)
    attn = A.masked_exp_normalize(scores, None, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v4)
    return ctx.reshape(n, t, hd)


def make_qkv(rng, n=12, t=5, heads=3, d=4):
    shape = (n, t, heads * d)
    return tuple(
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )


class TestExpMhsaForward:
    def test_matches_reference(self, rng):
        q, k, v = make_qkv(rng)
        got = exp_mhsa(q, k, v, 3)
        want = ref_attention(q, k, v, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_nrms_dims(self, rng):
        q, k, v = make_qkv(rng, n=8, t=20, heads=20, d=20)
        got = exp_mhsa(q, k, v, 20)
        want = ref_attention(q, k, v, 20)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_matches_f32_reference(self, rng):
        """bf16 operands go straight to the matmuls (MXU-native path);
        accumulation stays f32, so results track the f32 reference within
        bf16 rounding."""
        q, k, v = make_qkv(rng, n=8, t=20, heads=20, d=20)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = exp_mhsa(qb, kb, vb, 20)
        assert got.dtype == jnp.bfloat16
        want = ref_attention(q, k, v, 20)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            rtol=5e-2, atol=5e-2)

    def test_bf16_grads_finite_and_close(self, rng):
        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

        def f32_loss(q, k, v):
            return jnp.sum(jnp.tanh(ref_attention(q, k, v, 4)))

        def bf16_loss(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa(q, k, v, 4).astype(jnp.float32)))

        g_ref = jax.grad(f32_loss, argnums=(0, 1, 2))(q, k, v)
        g_got = jax.grad(bf16_loss, argnums=(0, 1, 2))(qb, kb, vb)
        for a, b in zip(g_got, g_ref):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b),
                rtol=1e-1, atol=1e-1)

    def test_blocking_invariance(self, rng):
        q, k, v = make_qkv(rng, n=12)
        a = exp_mhsa(q, k, v, 3, 4)
        b = exp_mhsa(q, k, v, 3, 12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_block_rows_divisor(self):
        assert _block_rows(6400, 64) == 64
        # no 8-aligned divisor <= target -> whole array (Mosaic-legal)
        assert _block_rows(100, 64) == 100
        assert _block_rows(7, 64) == 7
        assert _block_rows(120, 64) == 40  # not 60: sublane-aligned


class TestExpMhsaBackward:
    def test_grads_match_reference(self, rng):
        q, k, v = make_qkv(rng)

        def loss_kernel(q, k, v):
            return jnp.sum(exp_mhsa(q, k, v, 3) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attention(q, k, v, 3) ** 2)

        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name} mismatch",
            )

    def test_grads_nrms_dims(self, rng):
        q, k, v = make_qkv(rng, n=4, t=20, heads=20, d=20)

        def loss_kernel(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa(q, k, v, 20)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.tanh(ref_attention(q, k, v, 20)))

        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr in zip(g_kernel, g_ref):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                       rtol=1e-3, atol=1e-4)


def ref_attention_masked(q, k, v, mask, n_heads):
    n, t, hd = q.shape
    d = hd // n_heads
    q4 = q.reshape(n, t, n_heads, d)
    k4 = k.reshape(n, t, n_heads, d)
    v4 = v.reshape(n, t, n_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / np.sqrt(d)
    attn = A.masked_exp_normalize(scores, mask[:, None, None, :], axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v4)
    return ctx.reshape(n, t, hd)


class TestExpMhsaMasked:
    def test_matches_reference(self, rng):
        q, k, v = make_qkv(rng)
        mask = jnp.asarray((rng.random((12, 5)) > 0.4).astype(np.float32))
        got = exp_mhsa_masked(q, k, v, mask, 3)
        want = ref_attention_masked(q, k, v, mask, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_fully_masked_row_is_zero(self, rng):
        q, k, v = make_qkv(rng, n=4)
        mask = jnp.ones((4, 5), jnp.float32).at[2].set(0.0)
        got = exp_mhsa_masked(q, k, v, mask, 3)
        np.testing.assert_allclose(np.asarray(got[2]), 0.0, atol=1e-7)

    def test_grads_match_reference(self, rng):
        q, k, v = make_qkv(rng, n=6, t=8, heads=4, d=4)
        mask = jnp.asarray((rng.random((6, 8)) > 0.3).astype(np.float32))

        def loss_kernel(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa_masked(q, k, v, mask, 4)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.tanh(ref_attention_masked(q, k, v, mask, 4)))

        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name} mismatch",
            )

    def test_qkv_fused_matches_split(self, rng):
        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        qkv = jnp.concatenate([q, k, v], axis=-1)
        got = exp_mhsa_qkv(qkv, 4)
        want = exp_mhsa(q, k, v, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_qkv_fused_masked_matches_split(self, rng):
        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        mask = jnp.asarray(
            (rng.random((8, 10)) > 0.3).astype(np.float32))
        qkv = jnp.concatenate([q, k, v], axis=-1)
        got = exp_mhsa_qkv_masked(qkv, mask, 4)
        want = exp_mhsa_masked(q, k, v, mask, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_qkv_fused_grads_match_split(self, rng):
        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        mask = jnp.asarray((rng.random((8, 6)) > 0.4).astype(np.float32))

        def loss_fused(qkv):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_masked(qkv, mask, 3)))

        def loss_split(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa_masked(q, k, v, mask, 3)))

        dqkv = jax.grad(loss_fused)(jnp.concatenate([q, k, v], axis=-1))
        dq, dk, dv = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(dqkv),
            np.asarray(jnp.concatenate([dq, dk, dv], axis=-1)),
            rtol=1e-4, atol=1e-6)

    def test_qkv_bias_matches_prebias(self, rng):
        """exp_mhsa_qkv_bias(qkv_raw, b) == exp_mhsa_qkv(qkv_raw + b):
        the in-VMEM bias add is the same same-dtype math."""
        from newsrecommendation_tpu.ops.pallas import (
            exp_mhsa_qkv_bias,
            exp_mhsa_qkv_bias_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        qkv_raw = jnp.concatenate([q, k, v], axis=-1)
        bias = jnp.asarray(rng.normal(size=(qkv_raw.shape[-1],))
                           .astype(np.float32))
        got = exp_mhsa_qkv_bias(qkv_raw, bias, 4)
        want = exp_mhsa_qkv(qkv_raw + bias, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

        mask = jnp.asarray((rng.random((8, 10)) > 0.3).astype(np.float32))
        got_m = exp_mhsa_qkv_bias_masked(qkv_raw, bias, mask, 4)
        want_m = exp_mhsa_qkv_masked(qkv_raw + bias, mask, 4)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=1e-6, atol=1e-7)

    def test_qkv_bias_grads(self, rng):
        """d(qkv_raw) and d(bias) of the bias-fused kernel match autodiff
        of the unfused composition."""
        from newsrecommendation_tpu.ops.pallas import (
            exp_mhsa_qkv_bias_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        qkv_raw = jnp.concatenate([q, k, v], axis=-1)
        bias = jnp.asarray(rng.normal(size=(qkv_raw.shape[-1],))
                           .astype(np.float32))
        mask = jnp.asarray((rng.random((8, 6)) > 0.4).astype(np.float32))

        def loss_fused(qkv_raw, bias):
            return jnp.sum(jnp.tanh(
                exp_mhsa_qkv_bias_masked(qkv_raw, bias, mask, 3)))

        def loss_ref(qkv_raw, bias):
            return jnp.sum(jnp.tanh(
                exp_mhsa_qkv_masked(qkv_raw + bias, mask, 3)))

        dq_f, db_f = jax.grad(loss_fused, argnums=(0, 1))(qkv_raw, bias)
        dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv_raw, bias)
        np.testing.assert_allclose(np.asarray(dq_f), np.asarray(dq_r),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r),
                                   rtol=1e-4, atol=1e-6)

    def test_mhsa_routes_masked_kernel(self, rng):
        from newsrecommendation_tpu.ops import (
            init_multi_head_self_attention,
            multi_head_self_attention,
        )
        params = init_multi_head_self_attention(jax.random.PRNGKey(0), 16, 4, 4)
        x = jnp.asarray(rng.normal(size=(6, 5, 16)).astype(np.float32))
        mask = jnp.asarray((rng.random((6, 5)) > 0.4).astype(np.float32))
        got = multi_head_self_attention(params, x, mask, n_heads=4)
        set_pallas_mode("off")
        want = multi_head_self_attention(params, x, mask, n_heads=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestMhsaIntegration:
    def test_mhsa_uses_kernel_when_enabled(self, rng, tiny_cfg):
        """multi_head_self_attention routes to the kernel for mask=None and
        produces the same values as the jnp path."""
        from newsrecommendation_tpu.ops import (
            init_multi_head_self_attention,
            multi_head_self_attention,
        )
        params = init_multi_head_self_attention(jax.random.PRNGKey(0), 16, 4, 4)
        x = jnp.asarray(rng.normal(size=(6, 5, 16)).astype(np.float32))
        got = multi_head_self_attention(params, x, None, n_heads=4)
        set_pallas_mode("off")
        want = multi_head_self_attention(params, x, None, n_heads=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_mhsa_blanes_layout_routes_and_matches(self, rng):
        """attention_layout('blanes') engages the experimental kernels and
        matches the default routing, masked and unmasked."""
        from newsrecommendation_tpu.ops import (
            init_multi_head_self_attention,
            multi_head_self_attention,
        )
        from newsrecommendation_tpu.ops.pallas.config import (
            set_attention_layout,
        )
        params = init_multi_head_self_attention(jax.random.PRNGKey(0), 16, 4, 4)
        x = jnp.asarray(rng.normal(size=(6, 5, 16)).astype(np.float32))
        mask = jnp.asarray((rng.random((6, 5)) > 0.3).astype(np.float32))
        try:
            set_attention_layout("blanes")
            got = multi_head_self_attention(params, x, None, n_heads=4)
            got_m = multi_head_self_attention(params, x, mask, n_heads=4)
        finally:
            set_attention_layout("headloop")
        want = multi_head_self_attention(params, x, None, n_heads=4)
        want_m = multi_head_self_attention(params, x, mask, n_heads=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Fused encoder tail: MHSA -> dropout -> attention pooling
# ---------------------------------------------------------------------------


def _pool_params(rng, hd, q):
    from newsrecommendation_tpu.ops.attention import init_attention_pooling
    return init_attention_pooling(jax.random.PRNGKey(7), hd, q)


def _composed_tail(qkv, mask, pool, n_heads):
    """jnp reference for the deterministic tail (no dropout)."""
    n, t, w3 = qkv.shape
    hd = w3 // 3
    ctx = ref_attention(qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:],
                        n_heads)
    if mask is not None:
        d = hd // n_heads
        q4 = qkv[..., :hd].reshape(n, t, n_heads, d)
        k4 = qkv[..., hd:2 * hd].reshape(n, t, n_heads, d)
        v4 = qkv[..., 2 * hd:].reshape(n, t, n_heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) / np.sqrt(d)
        attn = A.masked_exp_normalize(scores, mask[:, None, None, :], axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v4).reshape(n, t, hd)
    return A.attention_pooling(pool, ctx, mask)


def _kernel_args(pool):
    w1 = pool["fc1"]["w"]
    b1 = pool["fc1"]["b"][None, :]
    w2 = pool["fc2"]["w"]
    b2 = pool["fc2"]["b"][None, :]
    return w1, b1, w2, b2


class TestExpMhsaPool:
    def test_forward_matches_composed(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool

        n, t, h, d, qd = 12, 5, 3, 4, 6
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        pool = _pool_params(rng, h * d, qd)
        seed = jnp.zeros((1,), jnp.int32)
        got = exp_mhsa_pool(qkv, *_kernel_args(pool), seed, h, 0.0, True)
        want = _composed_tail(qkv, None, pool, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_forward_masked_matches_composed(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool_masked

        n, t, h, d, qd = 8, 6, 2, 4, 5
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        mask = jnp.asarray((rng.random((n, t)) > 0.4).astype(np.float32))
        mask = mask.at[:, 0].set(1.0)  # no fully-masked rows
        pool = _pool_params(rng, h * d, qd)
        seed = jnp.zeros((1,), jnp.int32)
        got = exp_mhsa_pool_masked(qkv, mask, *_kernel_args(pool), seed, h,
                                   0.0, True)
        want = _composed_tail(qkv, mask, pool, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_composed(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool

        n, t, h, d, qd = 6, 4, 2, 3, 5
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        pool = _pool_params(rng, h * d, qd)
        seed = jnp.zeros((1,), jnp.int32)
        gout = jnp.asarray(rng.normal(size=(n, h * d)).astype(np.float32))

        def f_kernel(qkv, pool):
            out = exp_mhsa_pool(qkv, *_kernel_args(pool), seed, h, 0.0, True)
            return jnp.sum(out * gout)

        def f_ref(qkv, pool):
            return jnp.sum(_composed_tail(qkv, None, pool, h) * gout)

        gk = jax.grad(f_kernel, argnums=(0, 1))(qkv, pool)
        gr = jax.grad(f_ref, argnums=(0, 1))(qkv, pool)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-5)
        for ka, kb in (("fc1", "w"), ("fc1", "b"), ("fc2", "w"), ("fc2", "b")):
            np.testing.assert_allclose(
                np.asarray(gk[1][ka][kb]), np.asarray(gr[1][ka][kb]),
                rtol=1e-4, atol=1e-5, err_msg=f"{ka}.{kb}")

    def test_grads_masked_match_composed(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool_masked

        n, t, h, d, qd = 6, 4, 2, 3, 5
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        mask = jnp.asarray((rng.random((n, t)) > 0.3).astype(np.float32))
        mask = mask.at[:, 0].set(1.0)
        pool = _pool_params(rng, h * d, qd)
        seed = jnp.zeros((1,), jnp.int32)
        gout = jnp.asarray(rng.normal(size=(n, h * d)).astype(np.float32))

        def f_kernel(qkv, pool):
            out = exp_mhsa_pool_masked(qkv, mask, *_kernel_args(pool), seed,
                                       h, 0.0, True)
            return jnp.sum(out * gout)

        def f_ref(qkv, pool):
            return jnp.sum(_composed_tail(qkv, mask, pool, h) * gout)

        gk = jax.grad(f_kernel, argnums=(0, 1))(qkv, pool)
        gr = jax.grad(f_ref, argnums=(0, 1))(qkv, pool)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-5)
        for ka, kb in (("fc1", "w"), ("fc1", "b"), ("fc2", "w"), ("fc2", "b")):
            np.testing.assert_allclose(
                np.asarray(gk[1][ka][kb]), np.asarray(gr[1][ka][kb]),
                rtol=1e-4, atol=1e-5, err_msg=f"{ka}.{kb}")

    def test_grads_accumulate_across_blocks(self, rng):
        """Param grads are accumulated across the sequential grid (init at
        block 0, += after): a tiny block_rows forcing many grid steps must
        match both the single-block kernel and the composed path. Dropout is
        on, so the keep mask's blocking-independence (fwd and bwd run with
        different block sizes) is exercised too."""
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool

        n, t, h, d, qd = 8, 4, 2, 3, 5
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        pool = _pool_params(rng, h * d, qd)
        seed = jnp.asarray([1234], jnp.int32)
        gout = jnp.asarray(rng.normal(size=(n, h * d)).astype(np.float32))

        def f(block_rows):
            def loss(qkv, pool):
                out = exp_mhsa_pool(qkv, *_kernel_args(pool), seed, h, 0.3,
                                    False, block_rows)
                return jnp.sum(out * gout)
            return jax.grad(loss, argnums=(0, 1))(qkv, pool)

        g_small = f(2)      # 4 grid steps in fwd, 8 in bwd
        g_big = f(128)      # single block
        np.testing.assert_allclose(np.asarray(g_small[0]),
                                   np.asarray(g_big[0]), rtol=1e-5, atol=1e-6)
        for ka, kb in (("fc1", "w"), ("fc1", "b"), ("fc2", "w"), ("fc2", "b")):
            np.testing.assert_allclose(
                np.asarray(g_small[1][ka][kb]), np.asarray(g_big[1][ka][kb]),
                rtol=1e-5, atol=1e-6, err_msg=f"{ka}.{kb}")

    @staticmethod
    def _np_keep_mask(shape, rate, seed):
        """numpy oracle of fused_encoder._keep_mask (SplitMix32-style hash
        over the global flat element index — blocking-independent)."""
        bn, t, hd = shape
        idx = np.arange(bn * t * hd, dtype=np.uint64).reshape(shape)
        x = (idx + np.uint64(seed) * 0x9E3779B9) & 0xFFFFFFFF
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(16)))
            x = (x * 0x7FEB352D) & 0xFFFFFFFF
            x = (x ^ (x >> np.uint64(15)))
            x = (x * 0x846CA68B) & 0xFFFFFFFF
            x = (x ^ (x >> np.uint64(16)))
        thr = min(int(round(rate * 2.0**32)), 2**32 - 1)
        return (x >= thr).astype(np.float32) / (1.0 - rate)

    def test_dropout_matches_composed_with_same_mask(self, rng):
        """Dropout path: reproduce the hash mask in numpy and feed it to the
        composed reference — forward AND grads must match the kernel."""
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool

        n, t, h, d, qd = 10, 5, 3, 4, 6
        rate, seed_val = 0.35, 13
        hd = h * d
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * hd)).astype(np.float32))
        pool = _pool_params(rng, hd, qd)
        seed = jnp.asarray([seed_val], jnp.int32)
        keep = jnp.asarray(self._np_keep_mask((n, t, hd), rate, seed_val))
        gout = jnp.asarray(rng.normal(size=(n, hd)).astype(np.float32))

        def f_kernel(qkv, pool):
            # block_rows = n -> single grid block, block_id 0
            out = exp_mhsa_pool(qkv, *_kernel_args(pool), seed, h, rate,
                                False, n)
            return jnp.sum(out * gout)

        def f_ref(qkv, pool):
            ctx = ref_attention(qkv[..., :hd], qkv[..., hd:2 * hd],
                                qkv[..., 2 * hd:], h) * keep
            return jnp.sum(A.attention_pooling(pool, ctx, None) * gout)

        np.testing.assert_allclose(
            np.asarray(f_kernel(qkv, pool)), np.asarray(f_ref(qkv, pool)),
            rtol=1e-5)
        gk = jax.grad(f_kernel, argnums=(0, 1))(qkv, pool)
        gr = jax.grad(f_ref, argnums=(0, 1))(qkv, pool)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-5)
        for ka, kb in (("fc1", "w"), ("fc1", "b"), ("fc2", "w"), ("fc2", "b")):
            np.testing.assert_allclose(
                np.asarray(gk[1][ka][kb]), np.asarray(gr[1][ka][kb]),
                rtol=1e-4, atol=1e-5, err_msg=f"{ka}.{kb}")

    def test_dropout_seed_variation(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_pool

        n, t, h, d, qd = 16, 5, 3, 4, 6
        qkv = jnp.asarray(rng.normal(size=(n, t, 3 * h * d)).astype(np.float32))
        pool = _pool_params(rng, h * d, qd)
        s1 = jnp.asarray([13], jnp.int32)
        s2 = jnp.asarray([14], jnp.int32)
        a = exp_mhsa_pool(qkv, *_kernel_args(pool), s1, h, 0.3, False)
        b = exp_mhsa_pool(qkv, *_kernel_args(pool), s1, h, 0.3, False)
        c = exp_mhsa_pool(qkv, *_kernel_args(pool), s2, h, 0.3, False)
        base = exp_mhsa_pool(qkv, *_kernel_args(pool), s1, h, 0.3, True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        assert not np.allclose(np.asarray(a), np.asarray(base))
        # the keep mask is blocking-independent: same result with 4-row blocks
        a4 = exp_mhsa_pool(qkv, *_kernel_args(pool), s1, h, 0.3, False, 4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(a4),
                                   rtol=1e-6, atol=1e-7)


class TestMhsaDropoutPoolWrapper:
    def test_matches_composition_interpret(self, rng):
        """mhsa_dropout_pool (fused kernel) == mhsa + pooling composed."""
        from newsrecommendation_tpu.ops.attention import (
            attention_pooling,
            init_multi_head_self_attention,
            mhsa_dropout_pool,
            multi_head_self_attention,
        )

        b, s, dm, h = 6, 5, 12, 3
        x = jnp.asarray(rng.normal(size=(b, s, dm)).astype(np.float32))
        mask = jnp.asarray((rng.random((b, s)) > 0.3).astype(np.float32))
        mask = mask.at[:, 0].set(1.0)
        mp = init_multi_head_self_attention(jax.random.PRNGKey(1), dm, h, 4)
        pp = _pool_params(rng, h * 4, 7)
        got = mhsa_dropout_pool(mp, pp, x, mask, n_heads=h)
        ctx = multi_head_self_attention(mp, x, mask, n_heads=h)
        want = attention_pooling(pp, ctx, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestBlanesExperimental:
    """Batch-in-lanes experimental kernel == production fused-QKV kernel."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(11)

    def test_forward_matches_qkv(self, rng):
        from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
            exp_mhsa_qkv_blanes,
        )

        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        qkv = jnp.concatenate([q, k, v], axis=-1)
        got = exp_mhsa_qkv_blanes(qkv, 4)
        want = exp_mhsa_qkv(qkv, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_masked_forward_matches_qkv(self, rng):
        from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
            exp_mhsa_qkv_blanes_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        mask = jnp.asarray((rng.random((8, 10)) > 0.3).astype(np.float32))
        qkv = jnp.concatenate([q, k, v], axis=-1)
        got = exp_mhsa_qkv_blanes_masked(qkv, mask, 4)
        want = exp_mhsa_qkv_masked(qkv, mask, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_qkv(self, rng):
        from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
            exp_mhsa_qkv_blanes_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        mask = jnp.asarray((rng.random((8, 6)) > 0.4).astype(np.float32))
        qkv = jnp.concatenate([q, k, v], axis=-1)

        def loss_blanes(qkv):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_blanes_masked(qkv, mask, 3)))

        def loss_qkv(qkv):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_masked(qkv, mask, 3)))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_blanes)(qkv)),
            np.asarray(jax.grad(loss_qkv)(qkv)),
            rtol=1e-4, atol=1e-6)

    def test_unmasked_grads_match_qkv(self, rng):
        from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
            exp_mhsa_qkv_blanes,
        )

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        qkv = jnp.concatenate([q, k, v], axis=-1)

        def loss_blanes(qkv):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_blanes(qkv, 3)))

        def loss_qkv(qkv):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv(qkv, 3)))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_blanes)(qkv)),
            np.asarray(jax.grad(loss_qkv)(qkv)),
            rtol=1e-4, atol=1e-6)

    def test_bf16_matches_headloop(self, rng):
        """Both layouts round attention weights / ds to the input dtype
        before the value/key/query contractions (f32 accumulate), so bf16
        layout A/Bs agree to bf16 rounding — mirrors
        TestExpMhsaForward.test_bf16_matches_f32_reference."""
        from newsrecommendation_tpu.ops.pallas.experimental_blanes import (
            exp_mhsa_qkv_blanes_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        mask = jnp.asarray((rng.random((8, 10)) > 0.3).astype(np.float32))
        qkv = jnp.concatenate([q, k, v], axis=-1).astype(jnp.bfloat16)

        got = exp_mhsa_qkv_blanes_masked(qkv, mask, 4)
        want = exp_mhsa_qkv_masked(qkv, mask, 4)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2)

        def loss_blanes(x):
            return jnp.sum(jnp.tanh(
                exp_mhsa_qkv_blanes_masked(x, mask, 4).astype(jnp.float32)))

        def loss_qkv(x):
            return jnp.sum(jnp.tanh(
                exp_mhsa_qkv_masked(x, mask, 4).astype(jnp.float32)))

        g_b = jax.grad(loss_blanes)(qkv)
        g_h = jax.grad(loss_qkv)(qkv)
        assert g_b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g_b, np.float32), np.asarray(g_h, np.float32),
            rtol=5e-2, atol=5e-2)


class TestBlockwiseFlash:
    """Key-axis blockwise (flash) kernel == full-T kernels, incl. grads.

    block_kv is set to force MULTIPLE key blocks so the online max/sum
    rescaling path is actually exercised (SURVEY §5 long-context growth
    path; VERDICT r1 item #9)."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(21)

    def test_forward_matches_full(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import flash_exp_mhsa

        q, k, v = make_qkv(rng, n=8, t=32, heads=4, d=8)
        got = flash_exp_mhsa(q, k, v, 4, 8, 8)   # 4 key blocks
        want = exp_mhsa(q, k, v, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_single_block_degenerates_to_full(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import flash_exp_mhsa

        q, k, v = make_qkv(rng, n=8, t=16, heads=4, d=8)
        got = flash_exp_mhsa(q, k, v, 4, 8, 16)  # one kv block
        want = exp_mhsa(q, k, v, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_masked_forward_matches_full(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import (
            flash_exp_mhsa_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=32, heads=4, d=8)
        mask = jnp.asarray((rng.random((8, 32)) > 0.3).astype(np.float32))
        got = flash_exp_mhsa_masked(q, k, v, mask, 4, 8, 8)
        want = exp_mhsa_masked(q, k, v, mask, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_fully_masked_rows_zero(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import (
            flash_exp_mhsa_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=16, heads=2, d=8)
        mask = jnp.zeros((8, 16), jnp.float32)
        got = flash_exp_mhsa_masked(q, k, v, mask, 2, 8, 8)
        # reference semantics: all-masked -> all-zero output, not uniform
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)

    def test_grads_match_full(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import (
            flash_exp_mhsa_masked,
        )

        q, k, v = make_qkv(rng, n=8, t=24, heads=3, d=4)
        mask = jnp.asarray((rng.random((8, 24)) > 0.4).astype(np.float32))

        def loss_flash(q, k, v):
            return jnp.sum(jnp.tanh(
                flash_exp_mhsa_masked(q, k, v, mask, 3, 8, 8)))

        def loss_full(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa_masked(q, k, v, mask, 3)))

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_full, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name} mismatch")

    def test_unmasked_grads_match_full(self, rng):
        from newsrecommendation_tpu.ops.pallas.blockwise import flash_exp_mhsa

        q, k, v = make_qkv(rng, n=8, t=24, heads=3, d=4)

        def loss_flash(q, k, v):
            return jnp.sum(jnp.tanh(flash_exp_mhsa(q, k, v, 3, 8, 8)))

        def loss_full(q, k, v):
            return jnp.sum(jnp.tanh(exp_mhsa(q, k, v, 3)))

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_full, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"d{name} mismatch")


class TestFlashDispatch:
    """multi_head_self_attention auto-routes long sequences to the
    blockwise flash kernel and matches the jnp reference."""

    def test_long_seq_routes_to_flash_and_matches(self):
        from newsrecommendation_tpu.ops.pallas.config import (
            flash_min_seq,
            set_flash_min_seq,
        )
        from newsrecommendation_tpu.ops import attention as A2
        from newsrecommendation_tpu.utils import init as pinit

        r = np.random.default_rng(5)
        n, t, heads, d = 8, 16, 4, 8
        params = A2.init_multi_head_self_attention(
            jax.random.PRNGKey(0), heads * d, heads, d)
        x = jnp.asarray(r.normal(size=(n, t, heads * d)).astype(np.float32))
        mask = jnp.asarray((r.random((n, t)) > 0.3).astype(np.float32))

        want = A2.multi_head_self_attention(params, x, mask, n_heads=heads)
        old = flash_min_seq()
        try:
            set_flash_min_seq(t)  # force the flash route at this length
            got = A2.multi_head_self_attention(params, x, mask,
                                               n_heads=heads)
        finally:
            set_flash_min_seq(old)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestProbsResiduals:
    """bwd_residuals="probs": the forward saves the f32 attention probs and
    the backward skips the score/exp/normalize recompute (and needs no
    mask). Gradients must be IDENTICAL to recompute mode — the saved probs
    are exactly the values the recompute re-derives."""

    @pytest.fixture(autouse=True)
    def _probs_mode(self):
        from newsrecommendation_tpu.ops.pallas.config import (
            bwd_residuals,
            set_bwd_residuals,
        )
        prev = bwd_residuals()
        set_bwd_residuals("probs")
        yield
        set_bwd_residuals(prev)  # restore, don't hardcode the default

    def _grads(self, loss, *args):
        return jax.grad(loss)(*args)

    def test_qkv_grads_match_recompute(self, rng):
        from newsrecommendation_tpu.ops.pallas.config import set_bwd_residuals

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        qkv = jnp.concatenate([q, k, v], axis=-1)

        def loss(x):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv(x, 3)))

        d_probs = jax.grad(loss)(qkv)
        set_bwd_residuals("recompute")
        d_rec = jax.grad(loss)(qkv)
        np.testing.assert_allclose(np.asarray(d_probs), np.asarray(d_rec),
                                   rtol=1e-6, atol=1e-7)

    def test_qkv_masked_grads_match_recompute(self, rng):
        from newsrecommendation_tpu.ops.pallas.config import set_bwd_residuals

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        qkv = jnp.concatenate([q, k, v], axis=-1)
        mask = jnp.asarray((rng.random((8, 6)) > 0.4).astype(np.float32))
        mask = mask.at[0].set(0.0)  # one fully-masked row

        def loss(x):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_masked(x, mask, 3)))

        d_probs = jax.grad(loss)(qkv)
        set_bwd_residuals("recompute")
        d_rec = jax.grad(loss)(qkv)
        np.testing.assert_allclose(np.asarray(d_probs), np.asarray(d_rec),
                                   rtol=1e-6, atol=1e-7)

    def test_qkv_bias_masked_grads_match_recompute(self, rng):
        from newsrecommendation_tpu.ops.pallas import (
            exp_mhsa_qkv_bias,
            exp_mhsa_qkv_bias_masked,
        )
        from newsrecommendation_tpu.ops.pallas.config import set_bwd_residuals

        q, k, v = make_qkv(rng, n=8, t=6, heads=3, d=4)
        qkv = jnp.concatenate([q, k, v], axis=-1)
        bias = jnp.asarray(rng.normal(size=(qkv.shape[-1],))
                           .astype(np.float32))
        mask = jnp.asarray((rng.random((8, 6)) > 0.4).astype(np.float32))

        def loss_m(x, b):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_bias_masked(x, b, mask, 3)))

        def loss_u(x, b):
            return jnp.sum(jnp.tanh(exp_mhsa_qkv_bias(x, b, 3)))

        got = [jax.grad(f, argnums=(0, 1))(qkv, bias)
               for f in (loss_m, loss_u)]
        set_bwd_residuals("recompute")
        want = [jax.grad(f, argnums=(0, 1))(qkv, bias)
                for f in (loss_m, loss_u)]
        for (gx, gb), (wx, wb) in zip(got, want):
            np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                                       rtol=1e-6, atol=1e-7)

    def test_forward_value_unchanged(self, rng):
        """The probs-saving forward's primary output equals the plain one."""
        q, k, v = make_qkv(rng, n=8, t=10, heads=4, d=8)
        qkv = jnp.concatenate([q, k, v], axis=-1)
        # primal call (no differentiation) never saves probs; grad path does
        out_primal = exp_mhsa_qkv(qkv, 4)
        out_vjp, _ = jax.vjp(lambda x: exp_mhsa_qkv(x, 4), qkv)
        np.testing.assert_allclose(np.asarray(out_vjp),
                                   np.asarray(out_primal),
                                   rtol=1e-6, atol=1e-7)


def test_block_rows_respect_vmem_budget():
    """Regression: the f32 (1024,20,1200) serving-eval forward must NOT
    pick 256-row blocks — at that size Mosaic's true scoped allocation
    measured 110.4 MB against the 100 MB vmem limit (compile-time OOM,
    round 3). The calibrated budget caps it at 128 while the bf16
    training shapes keep the A/B-measured blocks (fwd 176 / bwd 128)."""
    from newsrecommendation_tpu.ops.pallas.fused_attention import (
        _capped_block_rows,
    )

    # f32 corpus-encode chunk (serving/eval): must fall back to <= 128
    assert _capped_block_rows(1024, 256, 20, 1200, 400, 4) <= 128
    # f32 user-encoder serving shape (T=50): stays small
    assert _capped_block_rows(64, 256, 50, 1200, 400, 4) <= 64
    # bf16 headline shapes: exactly the blocks the round-3 A/B measured
    assert _capped_block_rows(7040, 256, 20, 1200, 400, 2) == 176
    assert _capped_block_rows(7040, 128, 20, 2800, 400, 2) == 128


class TestQkv2dIO:
    """2-D-I/O kernel variant (ops/pallas/qkv2d.py): same math as
    exp_mhsa_qkv_bias, operand layouts differ (the T=20 tiling-tax fix)."""

    def test_fwd_matches_3d_kernel(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_qkv_bias
        from newsrecommendation_tpu.ops.pallas.experimental_qkv2d import (
            exp_mhsa_qkv_bias_2d,
        )

        n, t, h, d = 64, 20, 4, 20
        w3 = 3 * h * d
        qkv3 = jnp.asarray(rng.normal(size=(n, t, w3)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(w3,)).astype(np.float32))
        o3 = exp_mhsa_qkv_bias(qkv3, bias, h, 16)
        o2 = exp_mhsa_qkv_bias_2d(qkv3.reshape(n * t, w3), bias, h, t, 16)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(o3))

    def test_grads_match_3d_kernel(self, rng):
        from newsrecommendation_tpu.ops.pallas import exp_mhsa_qkv_bias
        from newsrecommendation_tpu.ops.pallas.config import (
            set_bwd_residuals,
        )
        from newsrecommendation_tpu.ops.pallas.experimental_qkv2d import (
            exp_mhsa_qkv_bias_2d,
        )

        set_bwd_residuals("probs")
        try:
            n, t, h, d = 32, 10, 3, 8
            w3 = 3 * h * d
            qkv3 = jnp.asarray(
                rng.normal(size=(n, t, w3)).astype(np.float32))
            bias = jnp.asarray(rng.normal(size=(w3,)).astype(np.float32))

            g3 = jax.grad(lambda q, b: jnp.sum(jnp.tanh(
                exp_mhsa_qkv_bias(q, b, h, 8))), argnums=(0, 1))(qkv3, bias)
            g2 = jax.grad(lambda q, b: jnp.sum(jnp.tanh(
                exp_mhsa_qkv_bias_2d(q, b, h, t, 8))), argnums=(0, 1))(
                qkv3.reshape(n * t, w3), bias)
            # dqkv is bit-identical math; dbias differs only in reduction
            # order (sum over one flat axis vs two)
            np.testing.assert_array_equal(np.asarray(g2[0]),
                                          np.asarray(g3[0]).reshape(n * t, w3))
            np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g3[1]),
                                       rtol=1e-5, atol=1e-5)
        finally:
            set_bwd_residuals("probs")

    def test_mhsa_2d_io_mode_matches(self, rng):
        """attention_io("2d") routes multi_head_self_attention through the
        2-D-I/O kernel with identical results (unmasked path)."""
        from newsrecommendation_tpu.ops import (
            init_multi_head_self_attention,
        )
        from newsrecommendation_tpu.ops.attention import (
            multi_head_self_attention,
        )
        from newsrecommendation_tpu.ops.pallas.config import set_attention_io

        p = init_multi_head_self_attention(jax.random.PRNGKey(3), 60, 3, 20)
        x = jnp.asarray(rng.normal(size=(16, 20, 60)).astype(np.float32))
        want = multi_head_self_attention(p, x, None, n_heads=3)
        set_attention_io("2d")
        try:
            got = multi_head_self_attention(p, x, None, n_heads=3)
        finally:
            set_attention_io("3d")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # masked path falls back to the 3-D kernels under "2d" mode
        m = jnp.asarray((rng.random((16, 20)) > 0.3).astype(np.float32))
        want_m = multi_head_self_attention(p, x, m, n_heads=3)
        set_attention_io("2d")
        try:
            got_m = multi_head_self_attention(p, x, m, n_heads=3)
        finally:
            set_attention_io("3d")
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
