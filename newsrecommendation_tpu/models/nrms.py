"""NRMS: multi-head self-attention news encoder + MHSA user encoder.

Capability parity with reference ``model/NRMS.py`` (news encoder: word
embedding -> dropout -> MHSA -> dropout -> additive attention pooling;
user encoder: MHSA over the 50-news history + pooling, with the learned
pad-doc substitution when user_log_mask=False), re-expressed as pure
functions over an explicit param pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from newsrecommendation_tpu.models import common
from newsrecommendation_tpu.ops import (
    dropout,
    init_attention_pooling,
    init_multi_head_self_attention,
    mhsa_dropout_pool,
)
from newsrecommendation_tpu.ops.scoring import score_candidates
from newsrecommendation_tpu.utils import init as pinit


def init(key, cfg, embedding_table, num_category=0, num_subcategory=0):
    """Build the NRMS param pytree.

    embedding_table: word-embedding matrix (V+1, word_dim) for
    title_source="word_ids", or the flattened per-title table
    (num_news+1, T*word_dim) for "doc_table". Row 0 must be zero.
    num_category/num_subcategory are accepted for registry-signature parity
    (the reference crashes passing them to NRMS — SURVEY.md §5 defect 1);
    NRMS ignores category features.
    """
    del num_category, num_subcategory
    k_ne_mhsa, k_ne_attn, k_ue_mhsa, k_ue_attn, k_pad = jax.random.split(key, 5)
    d = cfg.dim_per_head
    return {
        "embedding_table": jnp.asarray(embedding_table, dtype=jnp.float32),
        "news_encoder": {
            "mhsa": init_multi_head_self_attention(
                k_ne_mhsa, cfg.word_embedding_dim, cfg.num_attention_heads, d
            ),
            "attn": init_attention_pooling(
                k_ne_attn, cfg.news_dim, cfg.news_query_vector_dim
            ),
        },
        "user_encoder": {
            "mhsa": init_multi_head_self_attention(
                k_ue_mhsa, cfg.news_dim, cfg.num_attention_heads, d
            ),
            "attn": init_attention_pooling(
                k_ue_attn, cfg.news_dim, cfg.user_query_vector_dim
            ),
            "pad_doc": pinit.uniform(k_pad, (cfg.news_dim,), 1.0),
        },
    }


def news_encoder(params, cfg, features, mask=None, *, rng=None,
                 deterministic=True, lookup=common.default_lookup):
    """features: (B, F) int32 -> news vectors (B, news_dim)."""
    p = params["news_encoder"]
    word_vecs = common.title_word_vecs(
        common.frozen_table(params["embedding_table"], cfg), features, cfg,
        lookup,
    )
    k2 = None
    if not deterministic:
        k1, k2 = jax.random.split(rng)
        word_vecs = dropout(k1, word_vecs, cfg.drop_rate, deterministic)
    # MHSA -> dropout -> pooling as ONE fused kernel on TPU (the context
    # tensor never exists in HBM — ops/pallas/experimental_fused_encoder.py)
    return mhsa_dropout_pool(
        p["mhsa"], p["attn"], word_vecs, mask,
        n_heads=cfg.num_attention_heads, drop_rate=cfg.drop_rate, rng=k2,
        deterministic=deterministic,
    )


def user_encoder(params, cfg, news_vecs, log_mask):
    """news_vecs: (B, L, news_dim), log_mask: (B, L) -> user vec (B, news_dim)."""
    p = params["user_encoder"]
    if cfg.user_log_mask:
        return mhsa_dropout_pool(
            p["mhsa"], p["attn"], news_vecs, log_mask,
            n_heads=cfg.num_attention_heads,
        )
    padded = common.apply_pad_doc(news_vecs, log_mask, p["pad_doc"])
    return mhsa_dropout_pool(
        p["mhsa"], p["attn"], padded, None,
        n_heads=cfg.num_attention_heads,
    )


def forward(params, cfg, batch, *, rng=None, deterministic=True,
            lookup=common.default_lookup):
    """Training forward: (loss, scores) like the reference Model.forward.

    batch: history (B,L,F) int32, history_mask (B,L) f32,
           candidate (B,1+K,F) int32, label (B,) int32,
           optional weight (B,) f32.
    """
    b = batch["candidate"].shape[0]
    feat = batch["candidate"].shape[-1]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Encode candidates and history in ONE news-encoder call — one kernel
    # launch over B*(1+K+L) rows instead of two (the reference encodes them
    # separately, NRMS.py:86-90); same math, bigger fused batches.
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
