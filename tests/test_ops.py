"""Encoder blocks vs closed-form numpy oracles of the reference math
(model_utils.py exp/mask/normalize semantics, torch Conv1d/Linear layouts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu import ops


def np_exp_normalize(scores, mask=None, axis=-1, eps=1e-8):
    """Literal reference formula (model_utils.py:24-29) in float64 numpy."""
    e = np.exp(scores.astype(np.float64))
    if mask is not None:
        e = e * mask
    return e / (e.sum(axis=axis, keepdims=True) + eps)


class TestMaskedExpNormalize:
    def test_matches_reference_formula(self, rng):
        s = rng.normal(size=(4, 7)).astype(np.float32) * 3
        mask = (rng.random((4, 7)) > 0.3).astype(np.float32)
        got = np.asarray(ops.masked_exp_normalize(jnp.asarray(s), jnp.asarray(mask)))
        np.testing.assert_allclose(got, np_exp_normalize(s, mask), rtol=1e-5,
                                   atol=1e-7)

    def test_no_mask(self, rng):
        s = rng.normal(size=(3, 5)).astype(np.float32)
        got = np.asarray(ops.masked_exp_normalize(jnp.asarray(s)))
        np.testing.assert_allclose(got, np_exp_normalize(s), rtol=1e-5, atol=1e-7)

    def test_fully_masked_row_is_zero(self):
        """All-masked rows give an all-zero distribution, like the reference's
        0/(0+1e-8); NOT uniform attention."""
        s = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
        mask = np.zeros((1, 3), dtype=np.float32)
        got = np.asarray(ops.masked_exp_normalize(jnp.asarray(s), jnp.asarray(mask)))
        np.testing.assert_array_equal(got, np.zeros((1, 3), dtype=np.float32))

    def test_large_scores_stable(self):
        """Raw exp would overflow float32; stabilized version must not."""
        s = np.array([[200.0, 199.0, -50.0]], dtype=np.float32)
        got = np.asarray(ops.masked_exp_normalize(jnp.asarray(s)))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-5)
        # exact softmax values: e / (e + 1) etc.
        want = np.exp([0.0, -1.0, -250.0]) / np.exp([0.0, -1.0, -250.0]).sum()
        # third entry (1.95e-109) underflows float32 -> 0; atol covers it
        np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-35)

    def test_epsilon_visible_at_small_scores(self):
        """When sum(exp) is tiny, the 1e-8 epsilon must still bite exactly as
        in the reference (not a shifted-softmax approximation)."""
        s = np.full((1, 2), -15.0, dtype=np.float32)  # exp ~ 3e-7 each
        got = np.asarray(ops.masked_exp_normalize(jnp.asarray(s)))
        np.testing.assert_allclose(got, np_exp_normalize(s), rtol=1e-4)
        assert got.sum() < 1.0  # epsilon makes it sub-normalized


class TestAttentionPooling:
    def test_oracle(self, rng):
        d, h, s, b = 12, 6, 5, 3
        params = ops.init_attention_pooling(jax.random.PRNGKey(0), d, h)
        x = rng.normal(size=(b, s, d)).astype(np.float32)
        mask = (rng.random((b, s)) > 0.3).astype(np.float32)

        w1 = np.asarray(params["fc1"]["w"]); b1 = np.asarray(params["fc1"]["b"])
        w2 = np.asarray(params["fc2"]["w"]); b2 = np.asarray(params["fc2"]["b"])
        e = np.tanh(x @ w1 + b1)
        a = (e @ w2 + b2)[..., 0]
        alpha = np_exp_normalize(a, mask)
        want = np.einsum("bsd,bs->bd", x, alpha)

        got = np.asarray(ops.attention_pooling(params, jnp.asarray(x),
                                               jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_batch_rank3_pooling_shape(self, rng):
        params = ops.init_attention_pooling(jax.random.PRNGKey(1), 8, 4)
        x = jnp.asarray(rng.normal(size=(2, 7, 5, 8)).astype(np.float32))
        out = ops.attention_pooling(params, x)
        assert out.shape == (2, 7, 8)


class TestScaledDotAttention:
    def test_oracle(self, rng):
        b, h, s, dk = 2, 3, 5, 4
        q = rng.normal(size=(b, h, s, dk)).astype(np.float32)
        k = rng.normal(size=(b, h, s, dk)).astype(np.float32)
        v = rng.normal(size=(b, h, s, dk)).astype(np.float32)
        mask = (rng.random((b, s)) > 0.3).astype(np.float32)

        scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
        attn = np_exp_normalize(scores, mask[:, None, None, :])
        want = np.einsum("bhqk,bhkd->bhqd", attn, v)

        got = np.asarray(ops.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask)[:, None, :],
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestMHSA:
    def test_oracle(self, rng):
        b, s, d_model, heads, dk = 2, 6, 12, 3, 4
        params = ops.init_multi_head_self_attention(
            jax.random.PRNGKey(2), d_model, heads, dk
        )
        x = rng.normal(size=(b, s, d_model)).astype(np.float32)
        mask = (rng.random((b, s)) > 0.2).astype(np.float32)

        def proj(p):
            return x @ np.asarray(p["w"]) + np.asarray(p["b"])

        q = proj(params["wq"]).reshape(b, s, heads, dk).transpose(0, 2, 1, 3)
        k = proj(params["wk"]).reshape(b, s, heads, dk).transpose(0, 2, 1, 3)
        v = proj(params["wv"]).reshape(b, s, heads, dk).transpose(0, 2, 1, 3)
        scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
        attn = np_exp_normalize(scores, mask[:, None, None, :])
        ctx = np.einsum("bhqk,bhkd->bhqd", attn, v)
        want = ctx.transpose(0, 2, 1, 3).reshape(b, s, heads * dk)

        got = np.asarray(ops.multi_head_self_attention(
            params, jnp.asarray(x), jnp.asarray(mask), n_heads=heads
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestConv1d:
    def test_same_padding_oracle(self, rng):
        b, t, cin, cout, ksz = 2, 7, 5, 6, 3
        params = ops.init_conv1d(jax.random.PRNGKey(3), cin, cout, ksz)
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        w = np.asarray(params["w"])  # (k, cin, cout)
        bias = np.asarray(params["b"])

        xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
        want = np.zeros((b, t, cout), dtype=np.float32)
        for pos in range(t):
            patch = xp[:, pos:pos + ksz, :]  # (b, k, cin)
            want[:, pos, :] = np.einsum("bkc,kco->bo", patch, w)
        want = want + bias

        got = np.asarray(ops.conv1d_same(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestDropoutAndScoring:
    def test_dropout_deterministic_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
        out = ops.dropout(jax.random.PRNGKey(0), x, 0.5, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_dropout_scales(self):
        x = jnp.ones((1000, 10), dtype=jnp.float32)
        out = np.asarray(ops.dropout(jax.random.PRNGKey(0), x, 0.3,
                                     deterministic=False))
        kept = out != 0
        assert abs(kept.mean() - 0.7) < 0.03
        np.testing.assert_allclose(out[kept], 1.0 / 0.7, rtol=1e-6)

    def test_score_candidates(self, rng):
        cand = rng.normal(size=(3, 5, 8)).astype(np.float32)
        user = rng.normal(size=(3, 8)).astype(np.float32)
        got = np.asarray(ops.score_candidates(jnp.asarray(cand), jnp.asarray(user)))
        want = np.einsum("bcd,bd->bc", cand, user)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestInitDistributions:
    def test_torch_linear_bounds(self):
        from newsrecommendation_tpu.utils import init as pinit
        p = pinit.torch_linear(jax.random.PRNGKey(0), 100, 50)
        bound = 1.0 / np.sqrt(100)
        assert np.abs(np.asarray(p["w"])).max() <= bound
        assert np.abs(np.asarray(p["b"])).max() <= bound

    def test_xavier_bounds(self):
        from newsrecommendation_tpu.utils import init as pinit
        p = pinit.xavier_linear(jax.random.PRNGKey(0), 100, 60)
        w_bound = np.sqrt(6.0 / 160)
        assert np.abs(np.asarray(p["w"])).max() <= w_bound
        assert np.abs(np.asarray(p["w"])).max() > 0.8 * w_bound  # actually fills range

    def test_embedding_row0_zero(self):
        from newsrecommendation_tpu.utils import init as pinit
        t = pinit.embedding(jax.random.PRNGKey(0), 10, 4)
        np.testing.assert_array_equal(np.asarray(t[0]), np.zeros(4))


class TestDenseCachedScoring:
    def test_matches_gather_formulation(self):
        import numpy as np
        from newsrecommendation_tpu.ops.scoring import (
            score_cached_impressions,
            score_cached_impressions_dense,
        )

        r = np.random.default_rng(3)
        N, D, B, C = 50, 16, 6, 9
        cache = jnp.asarray(r.normal(size=(N, D)).astype(np.float32))
        idx = jnp.asarray(r.integers(0, N, size=(B, C)).astype(np.int32))
        users = jnp.asarray(r.normal(size=(B, D)).astype(np.float32))
        a = score_cached_impressions(cache, idx, users)
        b = score_cached_impressions_dense(cache, idx, users)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
