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
    """
    cand = jnp.take(news_scoring, candidate_idx, axis=0)  # (B, C, D)
    return score_candidates(cand, user_vecs)
