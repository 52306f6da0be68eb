"""Full-loop train throughput: host data path + device step, end to end.

bench_step.py measures the device-only step; the CLI hardware runs showed
the in-loop number sits below it (host batch gather + device_put on the
dispatch thread — docs/PERF.md "Hardware integration runs": ~3,200 vs
3,578 ex/s for trainable NRMS). This harness measures fit() itself on a
production-dims synthetic corpus so host-path changes (cfg.prefetch_depth)
are A/B-able in one process.

    python tools/bench_loop.py --model NRMS --freeze --prefetch 0,2
    python tools/bench_loop.py --model NRMS --trainable --prefetch 0,2

Prints one JSON line per (config, prefetch_depth) with examples_per_sec
as measured by the loop's own counters (first log-window excluded, so
compile time does not pollute the rate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# match cli.main: rbg dropout-mask generation (threefry costs ~5.5 ms/step
# extra at the headline config — measured round 4)
jax.config.update("jax_default_prng_impl", "rbg")


def build_data(root: str, num_news: int, num_impressions: int, npratio: int,
               model: str = "NRMS"):
    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.data import (
        TrainSamples, build_news_features, prepare_training_data, read_news,
    )
    from newsrecommendation_tpu.data.synthetic import generate_corpus

    train_dir = os.path.join(root, "train")
    generate_corpus(train_dir, num_news=num_news, num_users=300,
                    num_impressions=num_impressions, num_topics=12,
                    title_len=18, max_history=50,
                    candidates_per_impression=12, seed=3, split="train")
    naml = model == "NAML"
    cfg = Config(model=model, title_source="word_ids", npratio=npratio,
                 use_category=naml, use_subcategory=naml, prepare=True)
    prepare_training_data(train_dir, 1, npratio, 0)
    corpus = read_news(os.path.join(train_dir, "news.tsv"), cfg, "train")
    feats = build_news_features(corpus, cfg)
    samples = TrainSamples.from_file(
        os.path.join(train_dir, f"behaviors_np{npratio}_0.tsv"),
        corpus.news_index, cfg)
    return corpus, feats, samples


def run_one(model_name: str, feats, samples, corpus, *, freeze: bool,
            prefetch: int, epochs: int, batch_size: int, dtype: str,
            device_gather: bool = True, steps_per_call: int = 1):
    import jax
    import numpy as np

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train.loop import fit
    from newsrecommendation_tpu.train.state import create_train_state

    naml = model_name == "NAML"
    cfg = Config(model=model_name, title_source="word_ids",
                 use_category=naml, use_subcategory=naml,
                 freeze_embedding=freeze, batch_size=batch_size,
                 compute_dtype=dtype, epochs=epochs, npratio=samples.npratio,
                 log_steps=20, prefetch_depth=prefetch,
                 device_gather=device_gather, steps_per_call=steps_per_call)
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    table = rng.normal(
        size=(len(corpus.word_dict) + 1, cfg.word_embedding_dim),
        scale=0.1).astype(np.float32)
    table[0] = 0
    state = create_train_state(cfg, model.init(
        jax.random.PRNGKey(0), cfg, table,
        len(corpus.category_dict), len(corpus.subcategory_dict)))
    state, stats = fit(cfg, model, state, samples, feats)
    return stats


def _set_auc_impl(impl: str):
    """Swap the production batched AUC between the sort-based and the
    pairwise implementation (same-session A/B; round-5 VERDICT #1), then
    clear every trace cache that baked the old one in."""
    from newsrecommendation_tpu import metrics as M
    from newsrecommendation_tpu.eval import pipeline as EP

    if not hasattr(M, "_auc_sort_impl"):
        M._auc_sort_impl = M.batched_auc
    M.batched_auc = (M.batched_auc_pairwise if impl == "pairwise"
                     else M._auc_sort_impl)
    M.impression_metrics.clear_cache()
    EP.make_eval_step.cache_clear()
    EP.make_eval_step_acc.cache_clear()


def run_eval(model_name: str, feats, corpus, root: str, *, batch_size: int,
             repeats: int = 3, cand: int = 20, max_candidates: int = 64,
             num_impressions: int = 4000, auc_impl: str = "sort",
             profile_dir: str | None = None, eval_k: int = 8):
    """Two-phase eval pipeline throughput (impressions/s through
    evaluate_impressions, device-side metric accumulation + staged
    batches) on a synthetic dev shard."""
    import time

    import jax
    import numpy as np

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.data import prepare_testing_data
    from newsrecommendation_tpu.data.loader import EvalSamples
    from newsrecommendation_tpu.data.synthetic import generate_corpus
    from newsrecommendation_tpu.eval.pipeline import (
        compute_news_scoring, evaluate_impressions,
    )
    from newsrecommendation_tpu.models import get_model

    _set_auc_impl(auc_impl)
    dev_dir = os.path.join(root, f"dev_c{cand}_n{num_impressions}")
    if not os.path.isdir(dev_dir):
        generate_corpus(dev_dir, num_news=len(corpus.news_index),
                        num_users=300, num_impressions=num_impressions,
                        num_topics=12, title_len=18, max_history=50,
                        candidates_per_impression=cand, seed=9, split="dev")
        prepare_testing_data(dev_dir, 1)
    cfg = Config(model=model_name, title_source="word_ids",
                 eval_batch_size=batch_size, user_log_mask=True,
                 deterministic=True, max_candidates=max_candidates,
                 eval_steps_per_call=eval_k)
    samples = EvalSamples.from_file(
        os.path.join(dev_dir, "behaviors_0.tsv"), corpus.news_index, cfg)
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    table = rng.normal(
        size=(len(corpus.word_dict) + 1, cfg.word_embedding_dim),
        scale=0.1).astype(np.float32)
    table[0] = 0
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    t0 = time.perf_counter()
    scoring = compute_news_scoring(model, params, cfg, feats)
    jax.block_until_ready(scoring)
    t_phase1 = time.perf_counter() - t0
    evaluate_impressions(model, params, cfg, samples, scoring)  # warm
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            evaluate_impressions(model, params, cfg, samples, scoring)
    t0 = time.perf_counter()
    for _ in range(repeats):
        res = evaluate_impressions(model, params, cfg, samples, scoring)
    dt = (time.perf_counter() - t0) / repeats
    return {
        "eval_impressions": samples.num_samples,
        "cand": cand,
        "max_candidates": max_candidates,
        "auc_impl": auc_impl,
        "phase1_s": round(t_phase1, 2),
        "phase2_impressions_per_sec": round(samples.num_samples / dt, 1),
        "auc": round(100 * res["auc"], 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="NRMS", choices=["NRMS", "NAML"])
    p.add_argument("--freeze", action="store_true", default=True)
    p.add_argument("--trainable", dest="freeze", action="store_false")
    p.add_argument("--prefetch", default="0,2",
                   help="comma list of prefetch_depth values to A/B")
    p.add_argument("--gather", default="device",
                   help="comma list from {device,host}: where the feature "
                        "gather runs (cfg.device_gather A/B)")
    p.add_argument("--steps_per_call", default="1",
                   help="comma list of cfg.steps_per_call values to A/B "
                        "(k>1 scans k optimizer steps per dispatch)")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--num_news", type=int, default=5000)
    p.add_argument("--num_impressions", type=int, default=6000)
    p.add_argument("--npratio", type=int, default=4)
    p.add_argument("--eval", action="store_true",
                   help="measure the two-phase eval pipeline instead of "
                        "training")
    p.add_argument("--cand", default="20",
                   help="eval only: comma list of candidates-per-impression "
                        "widths for the synthetic dev set")
    p.add_argument("--max_candidates", type=int, default=0,
                   help="eval only: pad width (default: next multiple of 64 "
                        ">= cand)")
    p.add_argument("--eval_impressions", type=int, default=4000)
    p.add_argument("--auc", default="sort",
                   help="eval only: comma list from {sort,pairwise} to A/B "
                        "the batched-AUC implementation")
    p.add_argument("--eval_k", default="8",
                   help="eval only: comma list of eval_steps_per_call "
                        "values (batches scanned per dispatch)")
    p.add_argument("--profile_dir", default=None,
                   help="eval only: capture one evaluate_impressions pass "
                        "under jax.profiler.trace into this dir")
    args = p.parse_args(argv)

    with tempfile.TemporaryDirectory() as root:
        corpus, feats, samples = build_data(
            root, args.num_news, args.num_impressions, args.npratio,
            model=args.model)
        if args.eval:
            for cand in [int(x) for x in args.cand.split(",")]:
                maxc = args.max_candidates or -(-cand // 64) * 64
                for impl in args.auc.split(","):
                  for ek in [int(x) for x in args.eval_k.split(",")]:
                    out = run_eval(
                        args.model, feats, corpus, root,
                        batch_size=args.batch_size, cand=cand,
                        max_candidates=maxc,
                        num_impressions=args.eval_impressions, auc_impl=impl,
                        profile_dir=args.profile_dir, eval_k=ek)
                    out["eval_k"] = ek
                    print(json.dumps(dict({"model": args.model,
                                           "mode": "eval"}, **out)),
                          flush=True)
            return
        for gather in args.gather.split(","):
          for spc in [int(x) for x in args.steps_per_call.split(",")]:
            for depth in [int(x) for x in args.prefetch.split(",")]:
                stats = run_one(args.model, feats, samples, corpus,
                                freeze=args.freeze, prefetch=depth,
                                epochs=args.epochs,
                                batch_size=args.batch_size,
                                dtype=args.dtype,
                                device_gather=(gather == "device"),
                                steps_per_call=spc)
                print(json.dumps({
                    "model": args.model,
                    "freeze": args.freeze,
                    "prefetch_depth": depth,
                    "gather": gather,
                    "steps_per_call": spc,
                    "train_samples": samples.num_samples,
                    "steps": stats["steps"],
                    "examples_per_sec": round(stats["examples_per_sec"], 1),
                }), flush=True)


if __name__ == "__main__":
    main()
