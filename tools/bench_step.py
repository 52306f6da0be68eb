"""Compare train-step wall time across configs (dtype, model, pallas mode).

Runs each variant in one process on the current JAX backend using the
memoization-safe protocol from tools/microbench.py. Usage:

    python tools/bench_step.py [--model NRMS] [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(label, cfg, iters=50, warmup=4, scan_k=0):
    import jax

    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import (
        make_multi_step,
        make_train_step,
    )

    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    vocab = 30000
    table = rng.normal(0, 0.06, size=(vocab, cfg.word_embedding_dim)).astype(
        np.float32)
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

    if scan_k:
        import jax.numpy as jnp

        multi = make_multi_step(cfg, model, scan_k)
        stacks = [
            {key: jnp.stack([batches[(s + j) % 8][key]
                             for j in range(scan_k)])
             for key in batches[0]}
            for s in range(8)
        ]
        for i in range(max(warmup // scan_k, 2)):
            state, ms = multi(state, stacks[i % 8], base_rng)
        float(ms["loss"][-1])
        calls = max(iters // scan_k, 4)
        t0 = time.perf_counter()
        for i in range(calls):
            state, ms = multi(state, stacks[i % 8], base_rng)
        float(ms["loss"][-1])
        dt = (time.perf_counter() - t0) / (calls * scan_k)
        print(f"{label} scan{scan_k}: {dt * 1e3:.2f} ms/step = "
              f"{b / dt:,.0f} examples/s", flush=True)
        return dt

    for i in range(warmup):
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, batches[i % 8], base_rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/step = {b / dt:,.0f} examples/s",
          flush=True)
    return dt


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    from newsrecommendation_tpu.config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="NRMS")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--scan", type=int, default=0,
                    help="steps per dispatch via lax.scan (0 = per-step)")
    ap.add_argument("--scan_list", default=None,
                    help="comma-separated list of scan depths to run per "
                         "variant IN ONE PROCESS (e.g. 0,4), so the "
                         "per-dispatch-overhead A/B shares one backend "
                         "session; overrides --scan")
    ap.add_argument("--freeze", action="store_true",
                    help="freeze_embedding=True (the reference demo.sh "
                         "training config; skips the table-grad scatter)")
    ap.add_argument("--variants", default="f32,bf16,f32 no-pallas,bf16 no-pallas")
    ap.add_argument("--heads", type=int, default=20,
                    help="num_attention_heads; d_head = news_dim/heads. "
                         "8 is the TPU-friendly shape (d=50 vs the "
                         "reference's 20x20) — VERDICT r4 task 7")
    args = ap.parse_args()

    base = dict(
        model=args.model, title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=args.heads, batch_size=128, npratio=4,
        drop_rate=0.2, lr=3e-4, deterministic=False,
        freeze_embedding=args.freeze,
    )
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)
    wanted = {v.strip() for v in args.variants.split(",")}
    for label, over in [
        ("f32", {}),
        ("bf16", {"compute_dtype": "bfloat16"}),
        ("bf16 probs", {"compute_dtype": "bfloat16",
                        "bwd_residuals": "probs"}),
        ("bf16 recompute", {"compute_dtype": "bfloat16",
                            "bwd_residuals": "recompute"}),
        ("f32 no-pallas", {"use_pallas": "off"}),
        ("bf16 no-pallas", {"compute_dtype": "bfloat16", "use_pallas": "off"}),
    ]:
        if label not in wanted:
            continue
        from newsrecommendation_tpu.ops.pallas import set_pallas_mode
        from newsrecommendation_tpu.ops.pallas.config import set_bwd_residuals
        set_pallas_mode(over.pop("use_pallas", "auto"))
        cfg = Config(**{**base, **over})
        set_bwd_residuals(cfg.bwd_residuals)
        scans = ([int(s) for s in args.scan_list.split(",")]
                 if args.scan_list else [args.scan])
        for sk in scans:
            bench_variant(label, cfg, iters=args.iters, scan_k=sk)


if __name__ == "__main__":
    main()
