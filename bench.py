"""Benchmarks: training, eval, and serving throughput on one TPU chip.

Emits MULTIPLE JSON lines (one metric each): NAML training, NRMS with a
TRAINABLE word table, impression-scoring QPS, the two-phase eval
pipeline at real-MIND candidate width, the end-to-end fit() loop, and —
LAST, as the headline metric the driver records — NRMS at the reference
demo config (frozen table, bf16 activations). Each training line carries
an analytic-FLOPs model-TFLOP/s estimate so "is it actually fast" is
answerable in absolute terms, not only against this repo's own anchor.

Measured configs follow the reference's effective MIND-small setup
(batch 128 = the README's "32*4", history 50, title 20, 300-d words, 400-d
news vectors, dropout on) — README.md:68-80; the reference publishes no
throughput numbers (SURVEY.md §6), so vs_baseline for the headline tracks
this framework's own round-1 straight-XLA anchor (83.0 ms/step = 1,542
examples/s, f32) and the other lines report vs their own round-2 first
measurements.

Measurement protocol: the axon TPU runtime memoizes executions whose
arguments are bitwise-identical (and `block_until_ready` does not reliably
force remote completion), so the loop rotates 8 distinct pre-staged batches
through donated state and forces completion with a scalar fetch of the
final loss. See tools/microbench.py.
"""

import json
import os
import time

import numpy as np

# Round-1 anchor for the headline metric: first trustworthy measurement on
# TPU v5 lite (examples/s), f32, straight XLA lowering of the reference math
# (83 ms/step @ batch 128).
BASELINE_EPS = 1542.0
# Anchors for the secondary lines (round-2 first measurements; 1.0 = parity
# with the first time the metric was recorded).
BASELINE_NAML_EPS = 8807.0   # round-1 PERF.md f32 measurement
BASELINE_TRAINABLE_EPS = 2636.0  # round-1 f32 rbg row (trainable table)
BASELINE_QPS = None  # established this round
# Round-5 first-class additions (VERDICT r4 #1): the end-to-end loop and
# the two-phase eval pipeline at real-MIND candidate width. Anchors are
# established the first round each is measured.
BASELINE_FULL_LOOP_EPS = None
BASELINE_EVAL_IPS = None

# TPU v5 lite peak: ~197 TFLOP/s bf16, ~98.5 TFLOP/s f32 (for the MFU-style
# "model TFLOP/s" context line; the estimate is analytic-FLOPs / time).
PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 98.5}


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


def nrms_forward_flops(cfg, vocab_unused=None) -> float:
    """Analytic matmul FLOPs of ONE forward pass at batch cfg.batch_size.

    Counts the dominant dense work (2*m*n*k per matmul): QKV projections,
    per-head attention scores+context, pooling projections, user encoder,
    scoring bmm. Elementwise/softmax work is excluded (matmul-dominated).
    """
    b, k, l, t = cfg.batch_size, cfg.npratio, cfg.user_log_length, cfg.num_words_title
    wd, nd, h = cfg.word_embedding_dim, cfg.news_dim, cfg.num_attention_heads
    d = nd // h
    q = cfg.news_query_vector_dim
    rows = b * (1 + k + l)          # news rows encoded per step
    f = 0.0
    f += 2.0 * rows * t * wd * (3 * nd)        # fused QKV projection
    f += rows * h * (2.0 * t * t * d) * 2      # scores + context
    f += 2.0 * rows * t * nd * q + 2.0 * rows * t * q   # pooling fc1+fc2
    f += 2.0 * rows * nd                       # pooling weighted sum
    # user encoder: MHSA over L history vectors + pooling
    f += 2.0 * b * l * nd * (3 * nd)
    f += b * h * (2.0 * l * l * d) * 2
    f += 2.0 * b * l * nd * cfg.user_query_vector_dim
    f += 2.0 * b * (1 + k) * nd                # scoring bmm
    return f


def naml_forward_flops(cfg) -> float:
    b, k, l, t = cfg.batch_size, cfg.npratio, cfg.user_log_length, cfg.num_words_title
    wd, nd = cfg.word_embedding_dim, cfg.news_dim
    rows = b * (1 + k + l)
    f = 0.0
    f += 2.0 * rows * t * (3 * wd) * nd        # conv1d k=3 as matmul
    f += 2.0 * rows * t * nd * cfg.news_query_vector_dim
    f += 2.0 * b * l * nd * cfg.user_query_vector_dim
    f += 2.0 * b * (1 + k) * nd
    return f


# Committed full-suite artifact: the source of last-measured values for
# secondary metrics, re-emitted (tagged "cached": true) when the
# compile-time budget forces a skip — the driver's machine-readable
# artifact then always carries every first-class metric, never just the
# headline (VERDICT r2 missing #2), and a re-run of the full suite
# refreshes the source automatically instead of requiring a hand-edited
# values table.
_LAST_KNOWN_ARTIFACT = "BENCH_full_r05.json"


def _load_last_known():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _LAST_KNOWN_ARTIFACT)
    known = {}
    try:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("cached"):
                    # never re-emit a line that was itself a cached re-emit:
                    # its value is stale by >=2 rounds and the provenance
                    # note would compound
                    continue
                known[rec["metric"]] = rec
    except (OSError, ValueError, KeyError):
        pass
    return known


def _emit(metric, value, unit, baseline, detail=None):
    line = {"metric": metric, "value": round(value, 1), "unit": unit,
            "vs_baseline": (round(value / baseline, 3) if baseline else 1.0)}
    if detail:
        line["detail"] = detail
    print(json.dumps(line), flush=True)


def _emit_cached(metric):
    known = _load_last_known().get(metric)
    if not known or known.get("value") is None:
        return False
    line = dict(known)
    line["cached"] = True
    # provenance as its own key; detail stays the measurement's own note
    line["cached_from"] = (f"{_LAST_KNOWN_ARTIFACT} (skipped this run by "
                           f"the compile-time budget)")
    print(json.dumps(line), flush=True)
    return True


def bench_train(cfg, label, baseline, fwd_flops_fn, iters=150):
    """Time the jitted train step at cfg; returns examples/s."""
    import jax

    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

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

    for i in range(5):  # warmup/compile; forced complete via scalar fetch
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    eps = iters * b / dt
    ms = 1e3 * dt / iters
    # training step ~= fwd + backward (~2x fwd) = 3x forward matmul FLOPs
    tflops = 3.0 * fwd_flops_fn(cfg) / (dt / iters) / 1e12
    peak = PEAK_TFLOPS.get(cfg.compute_dtype, 197.0)
    _emit(label, eps, "examples/s", baseline,
          detail=f"{ms:.1f} ms/step; ~{tflops:.1f} model TFLOP/s analytic "
                 f"(~{100 * tflops / peak:.0f}% of {peak:.0f} TF {cfg.compute_dtype} peak)")
    return eps


def bench_scoring_qps():
    """Impression-scoring throughput against a cached news-vector corpus —
    the serving path (BASELINE.json config 5; replaces the reference's
    per-impression CPU numpy loop, main.py:185-253)."""
    import jax
    import jax.numpy as jnp

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.ops.scoring import score_cached_impressions

    from newsrecommendation_tpu.ops.scoring import (
        score_cached_impressions_dense,
    )

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

    def make_score(scorer):
        @jax.jit
        def score(params, cache, hist, mask, cand):
            hist_vecs = jnp.take(cache, hist, axis=0)
            user = model.user_encoder(params, cfg, hist_vecs, mask)
            return scorer(cache, cand, user)
        return score

    def mkreq(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.integers(0, num_news, size=(B, L)), jnp.int32),
            jnp.asarray((r.random((B, L)) > 0.3).astype(np.float32)),
            jnp.asarray(r.integers(0, num_news, size=(B, C)), jnp.int32),
        )

    reqs = [mkreq(s) for s in range(8)]

    def timed(score):
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
        return iters * B / (time.perf_counter() - t0)

    # A/B the two cached-scoring formulations: random row gather (B·C·D HBM
    # reads) vs dense corpus matmul + scalar gather (MXU streaming)
    qps_gather = timed(make_score(score_cached_impressions))
    qps_dense = timed(make_score(score_cached_impressions_dense))
    qps = max(qps_gather, qps_dense)
    winner = "dense" if qps_dense >= qps_gather else "gather"
    _emit("impression_scoring_qps", qps, "impressions/s", BASELINE_QPS,
          detail=f"{C} candidates per impression, history {L}, "
                 f"{num_news}-doc cache; {winner} formulation wins "
                 f"(gather {qps_gather:.0f} vs dense {qps_dense:.0f})")
    return qps


def _import_bench_loop():
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import bench_loop
    return bench_loop


def bench_full_loop():
    """End-to-end fit() throughput: host batch gather + prefetch staging +
    device_put + jitted step, on a production-dims synthetic corpus — the
    number a user's training run actually sees (vs the device-only step
    the headline measures). First-class per VERDICT r4 #1."""
    import tempfile

    BL = _import_bench_loop()
    with tempfile.TemporaryDirectory() as root:
        corpus, feats, samples = BL.build_data(root, 5000, 6000, 4,
                                               model="NRMS")
        stats = BL.run_one("NRMS", feats, samples, corpus, freeze=True,
                           prefetch=2, epochs=2, batch_size=128,
                           dtype="bfloat16", device_gather=True)
    _emit("full_loop_examples_per_sec", stats["examples_per_sec"],
          "examples/s", BASELINE_FULL_LOOP_EPS,
          detail=f"fit() end to end, NRMS frozen bf16 batch 128, "
                 f"{stats['steps']} steps, prefetch 2, device gather")
    return stats["examples_per_sec"]


def bench_eval_pipeline():
    """Two-phase eval pipeline throughput at real-MIND candidate width
    (C=300 padded to 320; MIND-small dev impressions reach ~300
    candidates) — replaces the reference's per-impression CPU numpy loop
    (main.py:249-263). First-class per VERDICT r4 #1."""
    import tempfile

    BL = _import_bench_loop()
    with tempfile.TemporaryDirectory() as root:
        corpus, feats, _ = BL.build_data(root, 5000, 200, 4, model="NRMS")
        out = BL.run_eval("NRMS", feats, corpus, root, batch_size=128,
                          cand=300, max_candidates=320,
                          num_impressions=8000)
    _emit("eval_pipeline_impressions_per_sec",
          out["phase2_impressions_per_sec"], "impressions/s",
          BASELINE_EVAL_IPS,
          detail=f"phase 2 end to end, C=300 pad 320, batch 128, "
                 f"sort-based rank AUC; phase1 {out['phase1_s']}s")
    return out["phase2_impressions_per_sec"]


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    _setup_compilation_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from newsrecommendation_tpu.config import Config

    # Compile-time budget: axon-service TPU compiles are NOT reliably cached
    # across processes (measured: identical NAML step recompiled ~10 min in
    # a fresh process), so a full 4-config suite can cost ~45 min of
    # compiles. Secondary benches run only while there is budget left for
    # them plus the headline; skips are logged, never silent. Override with
    # NEWSREC_BENCH_BUDGET (seconds).
    budget = float(os.environ.get("NEWSREC_BENCH_BUDGET", 2400))
    t_start = time.perf_counter()
    # per-config cost estimates (compile-dominated, fresh process).
    # MEASURED round 2: `bench.py --headline-only` cold = 2,280 s wall
    # (~36 min of remote compile + run) with the bias-fused kernels, so
    # the headline reserve equals that measurement — at the default
    # budget the secondaries are skipped (their last values live in
    # BASELINE.md) and the headline is guaranteed to land. Raise
    # NEWSREC_BENCH_BUDGET to re-measure everything in one run.
    # Round-3 re-measurement: the repo-local persistent cache now DOES hold
    # across fresh processes (bench.py --headline-only cold process = 474 s
    # wall after the full-suite run populated .jax_cache; --naml-only
    # 106 s; the full 4-metric suite including its cold compiles was 32
    # min). Estimates sized so a 2400 s driver budget measures everything
    # fresh when warm and still lands the headline with margin when cold —
    # skipped secondaries emit their LAST_KNOWN values either way.
    EST_TRAIN, EST_QPS, EST_HEADLINE = 700.0, 500.0, 900.0
    EST_EVAL, EST_LOOP = 300.0, 600.0

    def have_time_for(est):
        spent = time.perf_counter() - t_start
        return spent + est + EST_HEADLINE <= budget

    # The reference's canonical training config (demo.sh:14-23 trains with
    # freeze_embedding=True) at the TPU-native dtype: bf16 activations,
    # f32 params/accumulation. BASELINE_EPS stays the f32 straight-lowering
    # anchor, so vs_baseline reports the full TPU-native speedup.
    headline_cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=20, batch_size=128, npratio=4, drop_rate=0.2,
        lr=3e-4, deterministic=False, freeze_embedding=True,
        compute_dtype="bfloat16",
    )

    if "--qps" in argv:
        bench_scoring_qps()
        return
    if "--headline-only" in argv:
        bench_train(headline_cfg, "nrms_train_examples_per_sec_per_chip",
                    BASELINE_EPS, nrms_forward_flops)
        return
    if "--naml-only" in argv:
        bench_train(headline_cfg.replace(model="NAML", use_category=True,
                                         use_subcategory=True),
                    "naml_train_examples_per_sec_per_chip",
                    BASELINE_NAML_EPS, naml_forward_flops)
        return

    # secondary metrics first; the driver reads the LAST line as headline
    secondary = [
        (EST_TRAIN, "naml_train_examples_per_sec_per_chip", lambda: bench_train(
            headline_cfg.replace(model="NAML", use_category=True,
                                 use_subcategory=True),
            "naml_train_examples_per_sec_per_chip",
            BASELINE_NAML_EPS, naml_forward_flops)),
        (EST_TRAIN, "nrms_trainable_table_examples_per_sec_per_chip",
         lambda: bench_train(
            headline_cfg.replace(freeze_embedding=False),
            "nrms_trainable_table_examples_per_sec_per_chip",
            BASELINE_TRAINABLE_EPS, nrms_forward_flops)),
        (EST_QPS, "impression_scoring_qps", bench_scoring_qps),
        (EST_EVAL, "eval_pipeline_impressions_per_sec", bench_eval_pipeline),
        (EST_LOOP, "full_loop_examples_per_sec", bench_full_loop),
    ]
    for est, name, fn in secondary:
        if have_time_for(est):
            fn()
        else:
            # keep the artifact complete: re-emit the last-measured value
            _emit_cached(name)
            print(f"# skipping {name} bench: {budget:.0f}s budget would not "
                  f"cover it plus the headline (last-known value emitted "
                  f"with \"cached\": true)", file=sys.stderr, flush=True)
    bench_train(headline_cfg, "nrms_train_examples_per_sec_per_chip",
                BASELINE_EPS, nrms_forward_flops)


if __name__ == "__main__":
    main()
