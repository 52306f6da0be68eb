"""Reference-math forward-equivalence oracle.

The strongest accuracy-parity evidence obtainable offline (no MIND data, no
network): a clean-room numpy transcription of the reference's torch forward
math — AttentionPooling (model_utils.py:21-31), ScaledDotProductAttention
(model_utils.py:47-53), MultiHeadSelfAttention head split/merge
(model_utils.py:78-95), the NRMS news/user encoders (NRMS.py:23-63), the NAML
conv/multi-view/user path (NAML.py:40-97), and the bmm + CrossEntropyLoss
head (NRMS.py:93-95, NAML.py:128-129) — fed the SAME weights as the JAX
models, with forward scores and loss asserted equal to float32 tolerance.

Two layers of defense:

1. ``TestOracleMatchesTorchPrimitives`` pins the numpy transcription against
   the actual torch functional primitives the reference calls (torch-cpu is
   available), so the oracle itself cannot silently diverge from torch
   semantics (conv1d cross-correlation orientation, CrossEntropyLoss
   mean-reduction, exp/mask/+1e-8 normalization).
2. ``TestModelsMatchOracle`` runs {NRMS, NAML} x {word_ids, doc_table} x
   {user_log_mask True/False} with dropout off and asserts the production
   JAX forward (the same code path cli.py trains through) reproduces the
   oracle's scores and loss to rtol 1e-5.

Any mismatch here is a parity bug that would silently shift the real-MIND
AUC rows — caught before the (network-gated) real-data run.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu.models import get_model

RTOL = 1e-5
ATOL = 1e-6


# ---------------------------------------------------------------------------
# The oracle: reference torch math, transcribed to numpy (float64-free,
# float32 throughout, matching the reference's dtype).
# ---------------------------------------------------------------------------


def o_linear(p, x):
    """nn.Linear. p['w'] is stored input-major (in, out) — torch stores
    (out, in); x @ w here == x @ weight.T there."""
    return x @ p["w"] + p["b"]


def o_attention_pooling(p, x, mask=None):
    """AttentionPooling.forward (model_utils.py:21-31).

    e = tanh(fc1(x)); alpha = exp(fc2(e)); alpha *= mask.unsqueeze(2);
    alpha /= sum(alpha, dim=1) + 1e-8; out = bmm(x^T, alpha).
    x: (B, S, D); mask: (B, S) or None -> (B, D).
    """
    e = np.tanh(o_linear(p["fc1"], x))
    alpha = np.exp(o_linear(p["fc2"], e))  # (B, S, 1)
    if mask is not None:
        alpha = alpha * mask[..., None]
    alpha = alpha / (alpha.sum(axis=1, keepdims=True) + 1e-8)
    return (x * alpha).sum(axis=1)


def o_scaled_dot_attention(q, k, v, attn_mask=None):
    """ScaledDotProductAttention.forward (model_utils.py:47-53).

    scores = exp(QK^T / sqrt(d_k)); scores *= mask.unsqueeze(-2);
    attn = scores / (sum(scores, -1) + 1e-8); out = attn @ V.
    q,k: (B, H, S, d_k); v: (B, H, S, d_v); attn_mask: (B, H, S) over keys.
    """
    d_k = q.shape[-1]
    scores = np.exp(q @ np.swapaxes(k, -1, -2) / math.sqrt(d_k))
    if attn_mask is not None:
        scores = scores * attn_mask[..., None, :]
    attn = scores / (scores.sum(axis=-1, keepdims=True) + 1e-8)
    return attn @ v


def o_mhsa(p, x, mask, n_heads):
    """MultiHeadSelfAttention.forward (model_utils.py:78-95): Q/K/V linear
    projections, view (B, S, H, d) -> transpose (B, H, S, d), scaled-dot,
    merge back. No output projection. mask: (B, S) expanded over heads."""
    b, s, _ = x.shape
    q = o_linear(p["wq"], x).reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3)
    k = o_linear(p["wk"], x).reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3)
    v = o_linear(p["wv"], x).reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3)
    m = None if mask is None else np.broadcast_to(
        mask[:, None, :], (b, n_heads, s))
    ctx = o_scaled_dot_attention(q, k, v, m)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, -1)


def o_conv1d(p, x):
    """nn.Conv1d(k=3, padding=1) as the reference applies it to
    (B, C, T) with transposes around it (NAML.py:54); expressed here on the
    (B, T, C) layout. torch conv is cross-correlation:
    out[b,o,t] = bias[o] + sum_{c,j} weight[o,c,j] * xpad[b,c,t+j].
    p['w'] is stored WIO (k, in, out): w[j,c,o] == torch weight[o,c,j]."""
    k = p["w"].shape[0]
    pad = k // 2
    xpad = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t = x.shape[1]
    out = sum(xpad[:, j:j + t, :] @ p["w"][j] for j in range(k))
    return out + p["b"]


def o_cross_entropy(scores, labels):
    """nn.CrossEntropyLoss() default: softmax CE, mean over batch."""
    s = scores - scores.max(axis=-1, keepdims=True)
    logp = s - np.log(np.exp(s).sum(axis=-1, keepdims=True))
    return -logp[np.arange(len(labels)), labels].mean()


def o_title_word_vecs(table, features, cfg):
    """The embedding lookup, both input formats.

    word_ids: nn.Embedding.from_pretrained(padding_idx=0) over (B, T) ids
    (NRMS.py:71-73, NRMS.py:28) — row 0 of the table is zero by data-pipeline
    construction (preprocess.py:51,128-129).
    doc_table: one pointer column into the flattened (num_news+1, T*D) table,
    reshaped to (B, T, D) (NAML.py:47-50, preprocess.py:64-65).
    """
    if cfg.title_source == "word_ids":
        ids = features[..., : cfg.num_words_title]
        return table[ids]
    ptr = features[..., 0]
    return table[ptr].reshape(
        *ptr.shape, cfg.num_words_title, cfg.word_embedding_dim)


def o_pad_doc(news_vecs, log_mask, pad_doc):
    """user_log_mask=False path (NRMS.py:59-60, NAML.py:94-95)."""
    m = log_mask[..., None]
    return news_vecs * m + pad_doc[None, None, :] * (1.0 - m)


def o_nrms_news_encoder(params, cfg, features):
    """NRMS.NewsEncoder.forward, eval mode / dropout off (NRMS.py:23-36);
    called without a word mask from Model.forward (NRMS.py:86-90)."""
    p = params["news_encoder"]
    word_vecs = o_title_word_vecs(params["embedding_table"], features, cfg)
    ctx = o_mhsa(p["mhsa"], word_vecs, None, cfg.num_attention_heads)
    return o_attention_pooling(p["attn"], ctx, None)


def o_nrms_user_encoder(params, cfg, news_vecs, log_mask):
    """NRMS.UserEncoder.forward (NRMS.py:49-63)."""
    p = params["user_encoder"]
    if cfg.user_log_mask:
        ctx = o_mhsa(p["mhsa"], news_vecs, log_mask, cfg.num_attention_heads)
        return o_attention_pooling(p["attn"], ctx, log_mask)
    padded = o_pad_doc(news_vecs, log_mask, p["pad_doc"])
    ctx = o_mhsa(p["mhsa"], padded, None, cfg.num_attention_heads)
    return o_attention_pooling(p["attn"], ctx, None)


def o_naml_news_encoder(params, cfg, features):
    """NAML.NewsEncoder.forward, eval mode (NAML.py:40-74): title lookup ->
    Conv1d -> AttentionPooling (mask=None at the call sites), plus optional
    category/subcategory Embedding+Linear views and final_attn fusion."""
    p = params["news_encoder"]
    word_vecs = o_title_word_vecs(params["embedding_table"], features, cfg)
    ctx = o_conv1d(p["cnn"], word_vecs)
    title_vecs = o_attention_pooling(p["attn"], ctx, None)

    views = [title_vecs]
    col = cfg.num_words_title if cfg.title_source == "word_ids" else 1
    if cfg.use_category:
        ids = features[..., col]
        # nn.Embedding(padding_idx=0): row 0 zero (NAML.py:20-21)
        views.append(o_linear(p["category_dense"], p["category_emb"][ids]))
        col += 1
    if cfg.use_subcategory:
        ids = features[..., col]
        views.append(
            o_linear(p["subcategory_dense"], p["subcategory_emb"][ids]))
    if len(views) == 1:
        return views[0]
    stacked = np.stack(views, axis=1)  # (B, V, news_dim) — torch.stack dim=1
    return o_attention_pooling(p["final_attn"], stacked, None)


def o_naml_user_encoder(params, cfg, news_vecs, log_mask):
    """NAML.UserEncoder.forward (NAML.py:85-97): pooling only, no MHSA."""
    p = params["user_encoder"]
    if cfg.user_log_mask:
        return o_attention_pooling(p["attn"], news_vecs, log_mask)
    padded = o_pad_doc(news_vecs, log_mask, p["pad_doc"])
    return o_attention_pooling(p["attn"], padded, None)


def o_forward(params, cfg, batch, news_enc, user_enc):
    """Model.forward (NRMS.py:80-95 / NAML.py:113-129): encode candidates and
    history through the news encoder, user encoder over history vectors,
    score = bmm(candidates, user_vec), loss = CrossEntropyLoss(score, label).
    """
    b = batch["candidate"].shape[0]
    f = batch["candidate"].shape[-1]
    cand_vecs = news_enc(params, cfg, batch["candidate"].reshape(-1, f))
    cand_vecs = cand_vecs.reshape(b, 1 + cfg.npratio, cfg.news_dim)
    hist_vecs = news_enc(params, cfg, batch["history"].reshape(-1, f))
    hist_vecs = hist_vecs.reshape(b, cfg.user_log_length, cfg.news_dim)
    user_vec = user_enc(params, cfg, hist_vecs, batch["history_mask"])
    scores = np.einsum("bkd,bd->bk", cand_vecs, user_vec)
    loss = o_cross_entropy(scores, batch["label"])
    return loss, scores


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def np_params(params):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)


def make_oracle_batch(rng, cfg, num_news):
    b, l, k = cfg.batch_size, cfg.user_log_length, cfg.npratio
    f = cfg.news_feature_width
    title_hi = 30 if cfg.title_source == "word_ids" else num_news + 1
    hist = rng.integers(0, title_hi, size=(b, l, f))
    cand = rng.integers(0, title_hi, size=(b, 1 + k, f))
    if cfg.use_category:
        col = cfg.num_words_title if cfg.title_source == "word_ids" else 1
        for a in (hist, cand):
            a[..., col] %= 4
            if cfg.use_subcategory:
                a[..., col + 1] %= 6
    mask = (rng.random((b, l)) > 0.3).astype(np.float32)
    mask[0] = 0.0  # one fully-padded history: the degenerate all-masked row
    return {
        "history": hist.astype(np.int32),
        "history_mask": mask,
        "candidate": cand.astype(np.int32),
        "label": rng.integers(0, k + 1, size=(b,)).astype(np.int32),
    }


def make_oracle_table(rng, cfg, num_news):
    if cfg.title_source == "word_ids":
        t = rng.normal(size=(30, cfg.word_embedding_dim))
    else:
        t = rng.normal(
            size=(num_news + 1, cfg.num_words_title * cfg.word_embedding_dim))
    t[0] = 0.0  # row 0 = unknown news / padding (preprocess.py:51)
    return t.astype(np.float32)


# ---------------------------------------------------------------------------
# Layer 1: the numpy transcription matches the torch primitives it claims to
# transcribe (conv orientation, CE reduction, masked-exp normalization).
# ---------------------------------------------------------------------------


class TestOracleMatchesTorchPrimitives:
    def test_conv1d(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(3, 7, 5)).astype(np.float32)  # (B, T, Cin)
        w = rng.normal(size=(3, 5, 4)).astype(np.float32)  # WIO
        b = rng.normal(size=(4,)).astype(np.float32)
        got = o_conv1d({"w": w, "b": b}, x)
        # torch applies conv on (B, C, T) with weight (out, in, k)
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w.transpose(2, 1, 0)).contiguous(),
            torch.from_numpy(b), padding=1,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_cross_entropy(self, rng):
        torch = pytest.importorskip("torch")
        scores = rng.normal(size=(9, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=(9,))
        got = o_cross_entropy(scores, labels)
        ref = torch.nn.functional.cross_entropy(
            torch.from_numpy(scores), torch.from_numpy(labels)).item()
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_exp_mask_normalize(self, rng):
        """The reference's non-standard masked softmax: exp, multiplicative
        post-exp mask, +1e-8 denominator (model_utils.py:24-29,48-52)."""
        torch = pytest.importorskip("torch")
        s = rng.normal(size=(4, 6)).astype(np.float32) * 3
        m = (rng.random((4, 6)) > 0.4).astype(np.float32)
        m[0] = 0.0
        alpha = np.exp(s) * m
        got = alpha / (alpha.sum(-1, keepdims=True) + 1e-8)
        ts = torch.exp(torch.from_numpy(s)) * torch.from_numpy(m)
        ref = (ts / (ts.sum(-1, keepdim=True) + 1e-8)).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)

    def test_linear(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(3, 4, 6)).astype(np.float32)
        w = rng.normal(size=(6, 5)).astype(np.float32)
        b = rng.normal(size=(5,)).astype(np.float32)
        got = o_linear({"w": w, "b": b}, x)
        ref = torch.nn.functional.linear(
            torch.from_numpy(x), torch.from_numpy(w.T).contiguous(),
            torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Layer 2: the JAX models reproduce the oracle end-to-end with shared weights.
# ---------------------------------------------------------------------------

NUM_NEWS = 25
ORACLES = {
    "NRMS": (o_nrms_news_encoder, o_nrms_user_encoder),
    "NAML": (o_naml_news_encoder, o_naml_user_encoder),
}


@pytest.mark.parametrize("model_name", ["NRMS", "NAML"])
@pytest.mark.parametrize("title_source", ["word_ids", "doc_table"])
@pytest.mark.parametrize("user_log_mask", [True, False])
def test_forward_equivalence(tiny_cfg, rng, model_name, title_source,
                             user_log_mask):
    """Full-chain equality: news encoder -> user encoder -> bmm scores ->
    CE loss, JAX production path vs the reference-math oracle, same weights,
    dropout off. Covers the acceptance-criterion math for every
    model x input-format x user-path combination."""
    cfg = tiny_cfg.replace(
        model=model_name, title_source=title_source,
        user_log_mask=user_log_mask, deterministic=True,
        use_category=(model_name == "NAML"),
        use_subcategory=(model_name == "NAML"),
    )
    model = get_model(model_name)
    table = make_oracle_table(rng, cfg, NUM_NEWS)
    params = model.init(jax.random.PRNGKey(3), cfg, table, 3, 5)
    nparams = np_params(params)
    batch = make_oracle_batch(rng, cfg, NUM_NEWS)

    jloss, jscores = model.forward(
        params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
        deterministic=True)

    news_enc, user_enc = ORACLES[model_name]
    oloss, oscores = o_forward(nparams, cfg, batch, news_enc, user_enc)

    np.testing.assert_allclose(np.asarray(jscores), oscores,
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(float(jloss), oloss, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("model_name", ["NRMS", "NAML"])
def test_eval_encoders_match_oracle(tiny_cfg, rng, model_name):
    """The eval pipeline calls news_encoder/user_encoder directly
    (main.py:194, main.py:247) — assert those entry points too, including a
    fully-masked history row (degenerate all-zero attention)."""
    cfg = tiny_cfg.replace(
        model=model_name, title_source="doc_table", user_log_mask=True,
        deterministic=True)
    model = get_model(model_name)
    table = make_oracle_table(rng, cfg, NUM_NEWS)
    params = model.init(jax.random.PRNGKey(7), cfg, table, 3, 5)
    nparams = np_params(params)
    news_enc, user_enc = ORACLES[model_name]

    feats = rng.integers(0, NUM_NEWS + 1,
                         size=(11, cfg.news_feature_width)).astype(np.int32)
    feats[0] = 0  # the unknown-news zero row
    jn = model.news_encoder(params, cfg, jnp.asarray(feats))
    on = news_enc(nparams, cfg, feats)
    np.testing.assert_allclose(np.asarray(jn), on, rtol=RTOL, atol=ATOL)

    hist = rng.normal(size=(4, cfg.user_log_length, cfg.news_dim)
                      ).astype(np.float32)
    mask = (rng.random((4, cfg.user_log_length)) > 0.5).astype(np.float32)
    mask[0] = 0.0
    ju = model.user_encoder(params, cfg, jnp.asarray(hist), jnp.asarray(mask))
    ou = user_enc(nparams, cfg, hist, mask)
    np.testing.assert_allclose(np.asarray(ju), ou, rtol=RTOL, atol=ATOL)
    # the all-masked user row must be exactly zero in both (reference
    # semantics: exp*0 everywhere -> 0/(0+1e-8) = 0)
    assert np.all(np.asarray(ju)[0] == 0.0) and np.all(ou[0] == 0.0)
