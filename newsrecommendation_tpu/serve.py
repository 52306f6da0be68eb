"""Serving API: precomputed news-vector cache + fused batched impression
scoring.

The reference's de-facto serving path is its eval loop — news-encoder
inference over the corpus, then per-impression numpy dots (main.py:185-253).
This module packages that as a production-facing recommender: build once
from a checkpoint (or a live train state), then score candidate sets for
user histories in a single jitted gather + user-encode + dot computation.

    rec = Recommender.from_checkpoint(ckpt_path, cfg, test_data_dir)
    scores = rec.score(history_doc_ids, candidate_doc_ids)
    ranked = rec.rank(history_doc_ids, candidate_doc_ids)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from newsrecommendation_tpu.data.loader import pad_to_fix_len, trans_to_nindex
from newsrecommendation_tpu.eval.pipeline import compute_news_scoring
from newsrecommendation_tpu.models import get_model
from newsrecommendation_tpu.ops.scoring import (
    score_cached_impressions,
    score_cached_impressions_dense,
)


# Serving-cache row-padding granularity (see Recommender.__init__).
_CACHE_ROW_BUCKET = 4096


class Recommender:
    """Whole-corpus news-vector cache + jitted impression scorer.

    scorer: "gather" (random candidate-row gather; cost ~ candidates only),
    "dense" (whole-corpus matmul + scalar gather; MXU-streaming), or "auto"
    (default): dense while the corpus has <= cfg.serve_dense_max_rows rows,
    gather above — the measured crossover is ~750k rows (config.py table,
    tools/bench_scorer_crossover.py).
    """

    def __init__(self, model, params, cfg, news_index: Dict[str, int],
                 news_scoring, scorer: str = "auto",
                 cache_dtype: Optional[str] = None):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.news_index = news_index
        # cache_dtype="bfloat16" halves the corpus cache's HBM footprint
        # and traffic — the dense corpus-matmul scorer is bandwidth-bound,
        # so this trades ~3 decimal digits of score precision for ~2x its
        # throughput (ranking ties at bf16 resolution are already
        # tie-broken arbitrarily by argsort).
        #
        # The cache rows are padded up to a multiple of _CACHE_ROW_BUCKET
        # with zero vectors so every jitted shape is stable across
        # /reload swaps while the corpus grows within the bucket (a cold
        # XLA compile on the remote TPU service costs minutes; 4096 extra
        # 400-d rows cost ~6 MB). Padded rows are unreachable by doc-id
        # (not in news_index) and masked to -inf for corpus-wide top-k.
        # The real (addressable) row count comes from news_index, NOT the
        # supplied array: a cache that was already bucket-padded (e.g. one
        # lifted off another Recommender) would otherwise inflate
        # _real_rows and let zero pad rows leak into corpus-wide top-k.
        cache = np.asarray(news_scoring)
        # _real_rows assumes a DENSE 1-based index (mind.py's builder
        # guarantees it); a gapped index would mask real rows out of
        # corpus-wide top-k, an explicit 0 would collide with the
        # unknown-news row — fail loudly instead
        if news_index:
            vals = news_index.values()
            if max(vals) != len(news_index) or min(vals) < 1:
                raise ValueError(
                    "news_index must be a dense 1-based mapping "
                    f"(got {len(news_index)} ids spanning "
                    f"[{min(vals)}, {max(vals)}])")
        self._real_rows = len(news_index) + 1  # + row 0 (unknown news)
        if cache.shape[0] < self._real_rows:
            raise ValueError(
                f"news_scoring has {cache.shape[0]} rows but news_index "
                f"addresses {self._real_rows} (incl. row 0)")
        pad = (-cache.shape[0]) % _CACHE_ROW_BUCKET
        if pad:
            cache = np.concatenate(
                [cache, np.zeros((pad, cache.shape[1]), cache.dtype)])
        cache = jnp.asarray(cache)  # one host->device transfer
        self.news_scoring = cache.astype(cache_dtype) if cache_dtype else cache
        if scorer not in ("auto", "gather", "dense"):
            raise ValueError(f"unknown scorer {scorer!r}")
        if scorer == "auto":
            max_rows = getattr(cfg, "serve_dense_max_rows", 524288)
            scorer = "dense" if self._real_rows <= max_rows else "gather"
        self.scorer = scorer
        self._scorer = (score_cached_impressions if scorer == "gather"
                        else score_cached_impressions_dense)
        self._score_jit = jax.jit(self._score_impl)
        self._topk_jit = jax.jit(self._topk_impl, static_argnums=(5,))
        # idx -> doc_id for corpus-wide recommendation output
        self._inv_index = {v: k for k, v in news_index.items()}

    # ---- construction ----------------------------------------------------

    @classmethod
    def from_state(cls, cfg, params, news_index: Dict[str, int],
                   news_features: np.ndarray, encode_fn=None,
                   **kw) -> "Recommender":
        model = get_model(cfg.model)
        cache = compute_news_scoring(model, params, cfg, news_features,
                                     encode_fn=encode_fn)
        return cls(model, params, cfg, news_index, cache, **kw)

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, cfg, data_dir: str,
                        **kw) -> "Recommender":
        """Load a checkpoint and build the cache from data_dir's corpus."""
        import json
        import os

        from newsrecommendation_tpu.ckpt import load_checkpoint
        from newsrecommendation_tpu.cli import build_embedding_table
        from newsrecommendation_tpu.data import build_news_features, read_news
        from newsrecommendation_tpu.train import create_train_state

        with open(ckpt_path + ".json", "r", encoding="utf-8") as f:
            sidecar = json.load(f)
        corpus = read_news(
            os.path.join(data_dir, "news.tsv"), cfg, "test",
            category_dict=sidecar.get("category_dict", {}),
            subcategory_dict=sidecar.get("subcategory_dict", {}),
            word_dict=sidecar.get("word_dict", {}),
        )
        table = build_embedding_table(cfg, data_dir, corpus)
        model = get_model(cfg.model)
        template = create_train_state(
            cfg, model.init(jax.random.PRNGKey(0), cfg, table,
                            len(corpus.category_dict),
                            len(corpus.subcategory_dict)))
        state, _ = load_checkpoint(ckpt_path, template, cfg)
        feats = build_news_features(corpus, cfg)
        return cls.from_state(cfg, state.params, corpus.news_index, feats,
                              **kw)

    # ---- scoring ---------------------------------------------------------

    def _score_impl(self, params, news_scoring, hist_idx, hist_mask, cand_idx):
        hist_vecs = jnp.take(news_scoring, hist_idx, axis=0)
        user_vecs = self.model.user_encoder(params, self.cfg, hist_vecs,
                                            hist_mask)
        return self._scorer(news_scoring, cand_idx, user_vecs)

    @property
    def corpus_size(self) -> int:
        """Number of real (addressable) news rows, excluding row 0."""
        return self._real_rows - 1

    def _topk_impl(self, params, news_scoring, real_rows, hist_idx,
                   hist_mask, k):
        """Corpus-wide candidate generation: top-k news per user in one
        dense matmul + lax.top_k. Row 0 (unknown news) and the zero
        padding rows beyond `real_rows` (a traced scalar, so corpus
        growth within the row bucket does not retrace) are masked out.

        news_scoring is an explicit jit argument (like _score_impl), not a
        closure: closed over, every /reload's new cache values would bake
        into the traced HLO as a constant — a different module per reload
        (persistent compile cache can never hit, defeating the
        _CACHE_ROW_BUCKET shape padding) with its own embedded copy of the
        ~100 MB corpus cache per compiled (batch, k) bucket."""
        hist_vecs = jnp.take(news_scoring, hist_idx, axis=0)
        user_vecs = self.model.user_encoder(params, self.cfg, hist_vecs,
                                            hist_mask)
        scores = jnp.einsum("bd,nd->bn", user_vecs, news_scoring)
        valid = jnp.arange(news_scoring.shape[0])[None, :] < real_rows
        scores = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
        scores = scores.at[:, 0].set(-jnp.inf)
        return jax.lax.top_k(scores, k)

    def _encode_requests(self, histories: Sequence[Sequence[str]],
                         candidates: Sequence[Sequence[str]],
                         max_candidates: int):
        b = len(histories)
        L = self.cfg.user_log_length
        hist = np.zeros((b, L), np.int32)
        mask = np.zeros((b, L), np.float32)
        cand = np.zeros((b, max_candidates), np.int32)
        for i, (h, c) in enumerate(zip(histories, candidates)):
            row, m = pad_to_fix_len(trans_to_nindex(list(h), self.news_index), L)
            hist[i], mask[i] = row, m
            idx = trans_to_nindex(list(c)[:max_candidates], self.news_index)
            cand[i, :len(idx)] = idx
        return hist, mask, cand

    def score_batch_async(self, histories: Sequence[Sequence[str]],
                          candidates: Sequence[Sequence[str]],
                          max_candidates: Optional[int] = None) -> jax.Array:
        """Dispatch scoring; returns the (B, C) DEVICE array without
        blocking on the result. Callers that overlap multiple in-flight
        batches (server.py's pipelined BatchingScorer) fetch later with
        np.asarray; everyone else should use score_batch."""
        if max_candidates is None:
            max_candidates = max((len(c) for c in candidates), default=1)
        hist, mask, cand = self._encode_requests(histories, candidates,
                                                 max_candidates)
        return self._score_jit(self.params, self.news_scoring,
                               jnp.asarray(hist), jnp.asarray(mask),
                               jnp.asarray(cand))

    def score_batch(self, histories: Sequence[Sequence[str]],
                    candidates: Sequence[Sequence[str]],
                    max_candidates: Optional[int] = None) -> np.ndarray:
        """Scores (B, C) for B users' candidate lists (doc-id strings)."""
        return np.asarray(self.score_batch_async(histories, candidates,
                                                 max_candidates))

    def score(self, history: Sequence[str],
              candidates: Sequence[str]) -> np.ndarray:
        """(C,) scores for one user."""
        return self.score_batch([history], [candidates],
                                max_candidates=len(candidates))[0]

    def rank(self, history: Sequence[str],
             candidates: Sequence[str]) -> List[str]:
        """Candidates sorted by descending score."""
        s = self.score(history, candidates)
        order = np.argsort(-s, kind="stable")
        return [list(candidates)[i] for i in order]

    def recommend(self, history: Sequence[str], k: int = 10) -> List[str]:
        """Top-k doc ids over the WHOLE corpus for one user — candidate
        generation, a capability the reference's candidate-list-only eval
        loop (main.py:249-263) never had."""
        ids, _ = self.recommend_batch([history], k)
        return ids[0]

    def recommend_batch_async(self, histories: Sequence[Sequence[str]],
                              k: int = 10):
        """Dispatch corpus-wide top-k; returns (scores_dev, idx_dev)
        device arrays without blocking. Finish on the host with
        finish_recommend_batch once the caller is ready to block."""
        L = self.cfg.user_log_length
        b = len(histories)
        hist = np.zeros((b, L), np.int32)
        mask = np.zeros((b, L), np.float32)
        for i, h in enumerate(histories):
            row, m = pad_to_fix_len(trans_to_nindex(list(h),
                                                    self.news_index), L)
            hist[i], mask[i] = row, m
        k = min(int(k), self._real_rows)
        return self._topk_jit(
            self.params, self.news_scoring,
            jnp.asarray(self._real_rows, jnp.int32),
            jnp.asarray(hist), jnp.asarray(mask), k)

    def finish_recommend_batch(self, scores, idx):
        """Blocking half of recommend_batch: fetch the device results and
        map row indices back to doc-id strings (padding row 0 filtered)."""
        idx, scores = np.asarray(idx), np.asarray(scores)
        ids_out, scores_out = [], []
        for r_idx, r_sc in zip(idx, scores):
            pairs = [(self._inv_index[int(i)], float(s))
                     for i, s in zip(r_idx, r_sc)
                     if int(i) in self._inv_index]
            ids_out.append([p[0] for p in pairs])
            scores_out.append([p[1] for p in pairs])
        return ids_out, scores_out

    def recommend_batch(self, histories: Sequence[Sequence[str]],
                        k: int = 10):
        """Batched corpus-wide top-k: (ids, scores), each a list of B
        aligned lists (id i goes with score i; the padding row 0 is
        filtered from both).

        One dense (B, D) x (D, N) matmul + lax.top_k for the whole request
        batch — the serving-path shape the micro-batching server
        (server.py) feeds. k is clamped to the corpus size (top_k cannot
        return more rows than exist)."""
        scores, idx = self.recommend_batch_async(histories, k)
        return self.finish_recommend_batch(scores, idx)
