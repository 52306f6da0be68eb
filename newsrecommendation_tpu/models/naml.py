"""NAML: CNN title encoder + category/subcategory views fused by additive
attention; attention-pooling user encoder.

Capability parity with reference ``model/NAML.py`` (title view: embedding ->
dropout -> Conv1d(k=3, word_dim->news_dim) -> attention pooling; category /
subcategory views: Embedding(+1, category_emb_dim, padding_idx=0) + Linear ->
news_dim; multi-view fusion by a second attention pooling; user encoder is
attention pooling only, with the pad-doc path when user_log_mask=False).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.models import common
from newsrecommendation_tpu.ops import (
    attention_pooling,
    conv1d_same,
    dropout,
    init_attention_pooling,
    init_conv1d,
)
from newsrecommendation_tpu.ops.common import linear
from newsrecommendation_tpu.ops.scoring import score_candidates
from newsrecommendation_tpu.utils import init as pinit


def init(key, cfg, embedding_table, num_category=0, num_subcategory=0):
    """Build the NAML param pytree (embedding_table as in nrms.init)."""
    keys = jax.random.split(key, 8)
    params = {
        "embedding_table": jnp.asarray(embedding_table, dtype=jnp.float32),
        "news_encoder": {
            "cnn": init_conv1d(keys[0], cfg.word_embedding_dim, cfg.news_dim, 3),
            "attn": init_attention_pooling(
                keys[1], cfg.news_dim, cfg.news_query_vector_dim
            ),
        },
        "user_encoder": {
            "attn": init_attention_pooling(
                keys[2], cfg.news_dim, cfg.user_query_vector_dim
            ),
            "pad_doc": pinit.uniform(keys[3], (cfg.news_dim,), 1.0),
        },
    }
    ne = params["news_encoder"]
    if cfg.use_category:
        ne["category_emb"] = pinit.embedding(
            keys[4], num_category + 1, cfg.category_emb_dim
        )
        ne["category_dense"] = pinit.torch_linear(
            keys[5], cfg.category_emb_dim, cfg.news_dim
        )
    if cfg.use_subcategory:
        ne["subcategory_emb"] = pinit.embedding(
            keys[6], num_subcategory + 1, cfg.category_emb_dim
        )
        ne["subcategory_dense"] = pinit.torch_linear(
            keys[7], cfg.category_emb_dim, cfg.news_dim
        )
    if cfg.use_category or cfg.use_subcategory:
        k_final = jax.random.fold_in(key, 99)
        ne["final_attn"] = init_attention_pooling(
            k_final, cfg.news_dim, cfg.news_query_vector_dim
        )
    return params


def _category_view(emb_table, dense, ids):
    """Embedding(padding_idx=0) + Linear view (NAML.py:60-68)."""
    vec = jnp.take(emb_table, ids, axis=0)
    vec = vec * (ids != 0)[..., None].astype(vec.dtype)  # padding_idx=0
    return linear(dense, vec)


def news_encoder(params, cfg, features, mask=None, *, rng=None,
                 deterministic=True, lookup=common.default_lookup):
    """features: (B, F) int32 -> news vectors (B, news_dim).

    Feature columns: title (T cols for word_ids / 1 pointer col for
    doc_table), then category, then subcategory (main.py:48 layout).
    """
    p = params["news_encoder"]
    title_w = cfg.num_words_title if cfg.title_source == "word_ids" else 1

    word_vecs = common.title_word_vecs(
        common.frozen_table(params["embedding_table"], cfg), features, cfg,
        lookup,
    )
    if not deterministic:
        word_vecs = dropout(rng, word_vecs, cfg.drop_rate, deterministic)
    ctx = conv1d_same(p["cnn"], word_vecs)  # (B, T, news_dim)
    title_vecs = attention_pooling(p["attn"], ctx, mask)

    views = [title_vecs]
    col = title_w
    if cfg.use_category:
        views.append(_category_view(p["category_emb"], p["category_dense"],
                                    features[..., col]))
        col += 1
    if cfg.use_subcategory:
        views.append(_category_view(p["subcategory_emb"], p["subcategory_dense"],
                                    features[..., col]))

    if len(views) == 1:
        return views[0]
    stacked = jnp.stack(views, axis=-2)  # (B, V, news_dim)
    return attention_pooling(p["final_attn"], stacked, None)


def user_encoder(params, cfg, news_vecs, log_mask):
    """Attention pooling only — NAML has no user-level MHSA (NAML.py:78-97)."""
    p = params["user_encoder"]
    if cfg.user_log_mask:
        return attention_pooling(p["attn"], news_vecs, log_mask)
    padded = common.apply_pad_doc(news_vecs, log_mask, p["pad_doc"])
    return attention_pooling(p["attn"], padded, None)


def forward(params, cfg, batch, *, rng=None, deterministic=True,
            lookup=common.default_lookup):
    """Training forward: (loss, scores); see nrms.forward for batch format."""
    b = batch["candidate"].shape[0]
    feat = batch["candidate"].shape[-1]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # One news-encoder call over candidates + history (see nrms.forward).
    n_cand = b * (1 + cfg.npratio)
    all_flat = jnp.concatenate(
        [batch["candidate"].reshape(-1, feat),
         batch["history"].reshape(-1, feat)], axis=0)
    all_vecs = news_encoder(
        params, cfg, all_flat, rng=rng, deterministic=deterministic,
        lookup=lookup,
    )
    cand_vecs = all_vecs[:n_cand].reshape(b, 1 + cfg.npratio, cfg.news_dim)
    hist_vecs = all_vecs[n_cand:].reshape(b, cfg.user_log_length, cfg.news_dim)

    user_vec = user_encoder(params, cfg, hist_vecs, batch["history_mask"])
    scores = score_candidates(cand_vecs, user_vec)
    loss = common.slot_cross_entropy(scores, batch["label"], batch.get("weight"))
    return loss, scores
