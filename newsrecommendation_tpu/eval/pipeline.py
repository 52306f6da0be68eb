"""Two-phase evaluation pipeline.

Phase 1 — whole-corpus news-vector cache: the jitted news encoder runs over
the combined feature matrix in fixed-size chunks (one compile), producing
the (num_news+1, news_dim) cache the reference builds batch-by-batch with
per-batch device->host copies (main.py:185-198). The cache stays on device.

Phase 2 — impression scoring: for each fixed-shape batch of padded
impressions, ONE jitted computation gathers history news vectors from the
cache, runs the user encoder, gathers+scores candidates, and computes all
ranking metrics — replacing the reference's per-impression CPU numpy loop
(main.py:240-263). Only the scalar metric sums come back to the host.

The doc-sim sanity probe (mean cosine similarity over random pairs,
main.py:201-208) is vectorized to a single batched computation.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from newsrecommendation_tpu.metrics import impression_metrics
from newsrecommendation_tpu.ops.scoring import score_cached_impressions


def compute_news_scoring(model, params, cfg, news_features: np.ndarray,
                         encode_fn=None) -> jax.Array:
    """Encode the whole corpus -> (num_news+1, news_dim) on-device cache.

    encode_fn: optional pre-built (e.g. sharded) encoder apply; defaults to
    a jitted model.news_encoder closure.
    """
    if encode_fn is None:
        encode_fn = jax.jit(
            lambda p, feats: model.news_encoder(p, cfg, feats)
        )
    n = news_features.shape[0]
    chunk = min(cfg.eval_news_chunk, max(n, 1))
    pad = (-n) % chunk
    feats = np.concatenate(
        [news_features, np.zeros((pad,) + news_features.shape[1:],
                                 news_features.dtype)]
    ) if pad else news_features
    outs = []
    for start in range(0, feats.shape[0], chunk):
        outs.append(encode_fn(params, jnp.asarray(feats[start:start + chunk])))
    scoring = jnp.concatenate(outs, axis=0)[:n]
    # row 0 is the unknown-news vector; the reference computes it from the
    # zero feature row (not forced to zero), so keep whatever the encoder
    # produced for the zero row — history gathering relies on mask, not row 0.
    return scoring


def doc_sim_probe(news_scoring, num_pairs: int = 1_000_000,
                  seed: int = 0) -> float:
    """Mean cosine similarity over random news-vector pairs (rows >= 1).

    Collapse detector: a degenerate news encoder drives this toward 1
    (reference main.py:201-208, which loops 1M numpy dots on the host).
    """
    n = news_scoring.shape[0]
    if n <= 2:
        return float("nan")
    rng = np.random.default_rng(seed)
    i = rng.integers(1, n, size=num_pairs)
    j = rng.integers(1, n, size=num_pairs)
    keep = i != j  # reference skips i == j pairs (still divides by 1M)

    @jax.jit
    def _sims(vecs, ii, jj, kk):
        a = jnp.take(vecs, ii, axis=0)
        b = jnp.take(vecs, jj, axis=0)
        na = jnp.linalg.norm(a, axis=-1)
        nb = jnp.linalg.norm(b, axis=-1)
        sims = jnp.sum(a * b, axis=-1) / jnp.maximum(na * nb, 1e-12)
        return jnp.sum(sims * kk)

    total = 0.0
    step = 262144  # bound device memory for the gathered pairs
    vecs = jnp.asarray(news_scoring)
    for s in range(0, num_pairs, step):
        total += float(_sims(vecs, jnp.asarray(i[s:s + step]),
                             jnp.asarray(j[s:s + step]),
                             jnp.asarray(keep[s:s + step], dtype=np.float32)))
    return total / num_pairs


def make_eval_step(model, cfg):
    """One jitted eval computation per fixed-shape impression batch."""

    @jax.jit
    def eval_step(params, news_scoring, batch):
        hist_vecs = jnp.take(news_scoring, batch["history"], axis=0)
        user_vecs = model.user_encoder(params, cfg, hist_vecs,
                                       batch["history_mask"])
        scores = score_cached_impressions(news_scoring, batch["candidates"],
                                          user_vecs)
        return impression_metrics(scores, batch["labels"],
                                  batch["candidate_mask"])

    return eval_step


def evaluate_impressions(model, params, cfg, eval_samples, news_scoring,
                         log_every: Optional[int] = None,
                         mesh=None) -> Dict[str, float]:
    """Run phase 2 over all impressions; returns mean metrics + sample count.

    Padded batch rows have all-zero candidate masks, so they are excluded by
    the degenerate-impression filter automatically — as are real impressions
    with all-0/all-1 labels (reference main.py:250-251). With a mesh, each
    batch's rows are sharded over the 'data' axis so the user-encoder and
    pairwise-AUC work spread across chips; the metric-sum reduction is the
    psum analogue of the reference's dist.reduce (main.py:269-275).
    """
    eval_step = make_eval_step(model, cfg)
    news_scoring = jnp.asarray(news_scoring)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
    sums = {k: 0.0 for k in ("auc", "mrr", "ndcg5", "ndcg10", "count")}
    seen = 0
    for cnt, batch in enumerate(eval_samples.iter_batches(cfg.eval_batch_size)):
        dev_batch = {
            k: (jnp.asarray(v) if batch_sharding is None
                else jax.device_put(v, batch_sharding))
            for k, v in batch.items() if k != "num_real"
        }
        out = eval_step(params, news_scoring, dev_batch)
        for k in sums:
            sums[k] += float(out[k])
        seen += batch["num_real"]
        if log_every and cnt % log_every == 0:
            c = max(sums["count"], 1.0)
            logging.info(
                "[eval] %d samples: AUC %.2f MRR %.2f nDCG5 %.2f nDCG10 %.2f",
                seen, 100 * sums["auc"] / c, 100 * sums["mrr"] / c,
                100 * sums["ndcg5"] / c, 100 * sums["ndcg10"] / c,
            )
    count = max(sums.pop("count"), 1.0)
    result = {k: v / count for k, v in sums.items()}
    result["count"] = count
    result["samples_seen"] = float(seen)
    return result
