"""Benchmark: NRMS training throughput on one TPU chip.

Measures the jitted train step (forward + backward + Adam, dropout on) at
the reference's effective MIND-small configuration (batch 128, history 50,
title 20, 300-d words, 400-d news vectors — README.md "32*4" rows) and
prints ONE JSON line.

Measurement protocol: the axon TPU runtime memoizes executions whose
arguments are bitwise-identical (and `block_until_ready` does not reliably
force remote completion), so the loop rotates 8 distinct pre-staged batches
through donated state and forces completion with a scalar fetch of the final
loss. See tools/microbench.py.

The reference publishes no throughput numbers (SURVEY.md §6); the baseline
constant below is this framework's own first round-1 TPU v5e measurement
(pre-optimization jnp path), so vs_baseline tracks speedups across rounds
from a fixed anchor.
"""

import json
import os
import time

import numpy as np

# Round-1 anchor: first trustworthy measurement on TPU v5 lite (examples/s),
# f32, straight XLA lowering of the reference math (83 ms/step @ batch 128).
BASELINE_EPS = 1542.0


def _setup_compilation_cache():
    """Persistent XLA compilation cache (works over the axon tunnel).

    Cold axon-service compiles of the full train step have been observed at
    >10 minutes; the repo-local cache makes reruns start in seconds.
    """
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_scoring_qps():
    """Secondary benchmark (--qps): impression-scoring throughput against a
    cached news-vector corpus — the serving path (BASELINE.json config 5).
    Prints its own JSON line."""
    _setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.ops.scoring import score_cached_impressions

    cfg = Config(model="NRMS", user_log_mask=True, deterministic=True)
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    num_news, C, B, L = 65536, 300, 512, cfg.user_log_length
    params = model.init(
        jax.random.PRNGKey(0), cfg,
        rng.normal(0, 0.06, size=(100, cfg.word_embedding_dim))
        .astype(np.float32))
    cache = jnp.asarray(
        rng.normal(size=(num_news, cfg.news_dim)).astype(np.float32))

    @jax.jit
    def score(params, cache, hist, mask, cand):
        hist_vecs = jnp.take(cache, hist, axis=0)
        user = model.user_encoder(params, cfg, hist_vecs, mask)
        return score_cached_impressions(cache, cand, user)

    def mkreq(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.integers(0, num_news, size=(B, L)), jnp.int32),
            jnp.asarray((r.random((B, L)) > 0.3).astype(np.float32)),
            jnp.asarray(r.integers(0, num_news, size=(B, C)), jnp.int32),
        )

    reqs = [mkreq(s) for s in range(8)]
    acc = jnp.zeros(())
    for i in range(4):
        acc = acc + jnp.sum(score(params, cache, *reqs[i]))
    float(acc)
    iters = 100
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(iters):
        acc = acc + jnp.sum(score(params, cache, *reqs[i % 8]))
    float(acc)
    dt = time.perf_counter() - t0
    qps = iters * B / dt
    print(json.dumps({
        "metric": "impression_scoring_qps",
        "value": round(qps, 1),
        "unit": "impressions/s",
        "vs_baseline": 1.0,
        "detail": f"{C} candidates per impression, history {L}",
    }))


def main():
    _setup_compilation_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    # The reference's canonical training config (demo.sh:14-23 trains with
    # freeze_embedding=True) at the TPU-native dtype: bf16 activations,
    # f32 params/accumulation. BASELINE_EPS stays the f32 straight-lowering
    # anchor, so vs_baseline reports the full TPU-native speedup.
    cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=20, batch_size=128, npratio=4, drop_rate=0.2,
        lr=3e-4, deterministic=False, freeze_embedding=True,
        compute_dtype="bfloat16",
    )
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    vocab = 30000  # ~MIND-small word vocab scale
    table = rng.normal(0, 0.06, size=(vocab, cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    state = create_train_state(cfg, params)
    train_step = make_train_step(cfg, model)

    f = cfg.news_feature_width
    b = cfg.batch_size

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "history": jax.numpy.asarray(r.integers(
                0, vocab, size=(b, cfg.user_log_length, f)), jax.numpy.int32),
            "history_mask": jax.numpy.asarray(
                (r.random((b, cfg.user_log_length)) > 0.3).astype(np.float32)),
            "candidate": jax.numpy.asarray(r.integers(
                0, vocab, size=(b, 1 + cfg.npratio, f)), jax.numpy.int32),
            "label": jax.numpy.asarray(r.integers(
                0, cfg.npratio + 1, size=(b,)), jax.numpy.int32),
            "weight": jax.numpy.ones((b,), jax.numpy.float32),
        }

    batches = [make_batch(s) for s in range(8)]
    base_rng = jax.random.PRNGKey(0)

    # warmup (compile) — forced complete via scalar fetch
    for i in range(5):
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])

    iters = 150
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    eps = iters * b / dt
    print(json.dumps({
        "metric": "nrms_train_examples_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(eps / BASELINE_EPS, 3),
    }))


if __name__ == "__main__":
    import sys

    if "--qps" in sys.argv:
        bench_scoring_qps()
    else:
        main()
