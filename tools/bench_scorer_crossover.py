"""Device-level dense-vs-gather scorer crossover sweep (VERDICT r3 task 8).

Measures impression-scoring QPS for both cached-scoring formulations
(ops/scoring.py) at several corpus sizes, to locate the crossover where the
dense whole-corpus matmul (cost ~ B*N*D) stops beating the random candidate
row gather (cost ~ B*C*D random HBM reads). The result drives
serve_scorer="auto" selection (config.py).

Protocol matches bench.py bench_scoring_qps: NRMS user encoder at
production dims, B=512 impressions/dispatch, C=300 candidates, history 50,
8 rotating pre-staged request sets, scalar-fetch completion.

Usage: python tools/bench_scorer_crossover.py [--sizes 65536,262144,1048576]
Emits one JSON line per (size, scorer) plus a crossover summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,262144,1048576")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--candidates", type=int, default=300)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args(argv)

    import bench
    bench._setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.ops.scoring import (
        score_cached_impressions,
        score_cached_impressions_dense,
    )

    cfg = Config(model="NRMS", user_log_mask=True, deterministic=True)
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    B, C, L = args.batch, args.candidates, cfg.user_log_length
    params = model.init(
        jax.random.PRNGKey(0), cfg,
        rng.normal(0, 0.06, size=(100, cfg.word_embedding_dim))
        .astype(np.float32))

    scorers = {"gather": score_cached_impressions,
               "dense": score_cached_impressions_dense}
    results = {}
    for num_news in [int(s) for s in args.sizes.split(",")]:
        cache = jnp.asarray(
            rng.normal(size=(num_news, cfg.news_dim)).astype(np.float32))

        def mkreq(seed):
            r = np.random.default_rng(seed)
            return (
                jnp.asarray(r.integers(0, num_news, size=(B, L)), jnp.int32),
                jnp.asarray((r.random((B, L)) > 0.3).astype(np.float32)),
                jnp.asarray(r.integers(0, num_news, size=(B, C)), jnp.int32),
            )

        reqs = [mkreq(s) for s in range(8)]
        for name, scorer in scorers.items():
            @jax.jit
            def score(params, cache, hist, mask, cand, scorer=scorer):
                hist_vecs = jnp.take(cache, hist, axis=0)
                user = model.user_encoder(params, cfg, hist_vecs, mask)
                return scorer(cache, cand, user)

            acc = jnp.zeros(())
            for i in range(4):
                acc = acc + jnp.sum(score(params, cache, *reqs[i]))
            float(acc)
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for i in range(args.iters):
                acc = acc + jnp.sum(score(params, cache, *reqs[i % 8]))
            float(acc)
            qps = args.iters * B / (time.perf_counter() - t0)
            results[(num_news, name)] = qps
            print(json.dumps({
                "metric": "impression_scoring_qps", "scorer": name,
                "corpus_rows": num_news, "value": round(qps, 1),
                "unit": "impressions/s",
                "detail": f"B={B} C={C} L={L} f32 cache"}), flush=True)
        del cache

    sizes = sorted({k[0] for k in results})
    summary = {
        "metric": "scorer_crossover",
        "dense_wins_at": [n for n in sizes
                          if results[(n, "dense")] >= results[(n, "gather")]],
        "gather_wins_at": [n for n in sizes
                           if results[(n, "dense")] < results[(n, "gather")]],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
