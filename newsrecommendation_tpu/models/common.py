"""Shared model pieces: title-embedding lookup (both input formats), the
user-history pad-doc path, and the training objective.

The reference left its two models on different input formats — NRMS on
upstream word-id titles, NAML on the fork's precomputed per-title table
(SURVEY.md §5 defect 1). Here one lookup function serves both formats for
both models, selected by ``cfg.title_source``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def default_lookup(table, ids):
    """Dense embedding-row gather; swapped for a sharded lookup under a mesh."""
    return jnp.take(table, ids, axis=0)


def frozen_table(table, cfg):
    """Prepare the embedding table for lookup: freeze + compute-dtype cast.

    stop_gradient when cfg.freeze_embedding: the optimizer already zeroes
    the table's updates (train/state.py), but without this XLA still
    materializes the gradient — a scatter-add of every looked-up row back
    into the full table, the single most expensive op in the backward pass
    on TPU. stop_gradient removes it from the autodiff graph entirely; the
    zeroed optimizer branch stays as belt-and-braces.

    The cast to cfg.compute_dtype happens BEFORE the gather: converting the
    (V, D) table once is far cheaper than converting every gathered row
    (~5x more rows than the table at the reference batch shape), and a bf16
    gather moves half the HBM bytes. Params stay f32; autodiff casts the
    (bf16) row gradients back on the way out.
    """
    if cfg.freeze_embedding:
        table = jax.lax.stop_gradient(table)
    return table.astype(jnp.dtype(cfg.compute_dtype))


def title_word_vecs(table, features, cfg, lookup=default_lookup):
    """Extract per-token word vectors for each news item.

    features: (..., F) int32 combined feature rows (title cols first, then
    optional category/subcategory — reference main.py:48).
    Returns (..., num_words_title, word_embedding_dim).

    The multiply by (id != 0) enforces padding_idx=0 semantics (row 0 stays an
    exact zero and receives no gradient) without needing a gradient hook —
    matching nn.Embedding(padding_idx=0) in NRMS.py:71-73 / NAML.py:105-107.
    """
    if cfg.title_source == "word_ids":
        ids = features[..., : cfg.num_words_title]  # (..., T)
        vecs = lookup(table, ids) * (ids != 0)[..., None].astype(table.dtype)
        return vecs
    # doc_table: one pointer column into a (num_news+1, T*D) flattened table
    # (reference NAML.py:48-50, preprocess.py:64-65).
    ptr = features[..., 0]  # (...,)
    flat = lookup(table, ptr) * (ptr != 0)[..., None].astype(table.dtype)
    return flat.reshape(*ptr.shape, cfg.num_words_title, cfg.word_embedding_dim)


def apply_pad_doc(news_vecs, log_mask, pad_doc):
    """Replace masked history slots with the learned pad document.

    The reference's user_log_mask=False path (NRMS.py:59-60, NAML.py:94-95):
    instead of masking attention, padded positions are substituted with a
    trainable vector and attention runs unmasked.
    """
    m = log_mask[..., None].astype(news_vecs.dtype)
    return news_vecs * m + pad_doc.astype(news_vecs.dtype) * (1.0 - m)


def slot_cross_entropy(scores, labels, weights=None):
    """Softmax CE over the 1+K candidate slots (reference nn.CrossEntropyLoss).

    weights: optional (B,) 0/1 per-sample weights for padded final batches —
    the reference's DataLoader yields a ragged final batch instead
    (main.py:92); fixed shapes + weights keep jit happy with identical math.
    """
    ce = optax.softmax_cross_entropy_with_integer_labels(
        scores.astype(jnp.float32), labels
    )
    if weights is None:
        return jnp.mean(ce)
    w = weights.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
