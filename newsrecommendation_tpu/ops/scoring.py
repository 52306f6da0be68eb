"""Candidate scoring: dot product of candidate news vectors with the user
vector (reference torch.bmm at NRMS.py:93 / NAML.py:128).

At eval the reference does this per-impression on CPU numpy (main.py:253);
here scoring is a single batched einsum that fuses with the gather of cached
news vectors, so a whole batch of padded impressions is scored on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def score_candidates(candidate_vecs, user_vec):
    """candidate_vecs: (..., C, D); user_vec: (..., D) -> scores (..., C)."""
    return jnp.einsum("...cd,...d->...c", candidate_vecs, user_vec)


def score_cached_impressions(news_scoring, candidate_idx, user_vecs):
    """Fused gather + score against the whole-corpus news-vector cache.

    news_scoring: (N, D) cache; candidate_idx: (B, C) int32 into the cache
    (0 = unknown/padding row); user_vecs: (B, D). Returns (B, C) scores.

    Memory profile: gathers (B, C, D) rows at random (B·C·D reads from HBM)
    then reduces on the VPU. Best when B·C << N. For large batches against
    a bounded corpus, see score_cached_impressions_dense.
    """
    cand = jnp.take(news_scoring, candidate_idx, axis=0)  # (B, C, D)
    return score_candidates(cand, user_vecs)


def score_cached_impressions_dense(news_scoring, candidate_idx, user_vecs):
    """Same contract as score_cached_impressions, dense formulation.

    Scores the ENTIRE corpus against each user with one (B, D) x (D, N)
    matmul — a sequential cache read driving the MXU at full tilt — then
    gathers the B·C requested scalars. Computes N/C times more dots than
    needed, but replaces the (B, C, D) random row gather (HBM-latency
    bound) with dense MXU work; wins when B·C·D random reads cost more
    than the B·N·D matmul, i.e. large batches and/or corpora that fit the
    ~(N·D) streaming budget. Also the top-K-over-corpus building block
    (candidate generation), where all N scores are wanted anyway.
    """
    all_scores = jnp.einsum("bd,nd->bn", user_vecs, news_scoring)  # (B, N)
    return jnp.take_along_axis(all_scores, candidate_idx, axis=1)
