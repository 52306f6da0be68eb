"""Head-shape tradeoff: reference 20 heads x d=20 vs TPU-friendly 8 x d=50.

The round-4 kernel ledger (docs/PERF.md) closed with: NRMS's 20x20 head
shape wastes MXU/VPU lanes (d=20 of a 128 lane), and further step-time
gains require changing the MODEL shape. This tool measures BOTH axes of
that tradeoff at the reference dims (400-d news vectors, batch 128):

  - throughput: fit() examples/s per head count (same harness both ways);
  - quality: final synthetic-corpus AUC per head count, over several
    seeds, so the quality delta is read against seed noise.

    python tools/head_shape_ab.py --heads 20,8 --seeds 0,1,2

The parity configs keep the reference's 20x20 semantics
(/root/reference/src/model/model_utils.py:58-95); 8x50 is offered as
documented guidance (--num_attention_heads 8), never a silent default.
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
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np  # noqa: E402


def run_one(heads: int, seed: int, data, *, epochs: int, batch_size: int):
    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.data.loader import TrainSamples
    from newsrecommendation_tpu.eval.pipeline import (
        compute_news_scoring, evaluate_impressions,
    )
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train.loop import fit
    from newsrecommendation_tpu.train.state import create_train_state

    cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=heads, batch_size=batch_size, npratio=4,
        # trainable word table (the reference's NRMS setup): a FROZEN
        # random table leaves nothing to learn from on the synthetic
        # corpus — a first pass with freeze=True sat at chance AUC on
        # both head counts, which compares nothing
        drop_rate=0.2, lr=3e-4, epochs=epochs, freeze_embedding=False,
        compute_dtype="bfloat16", seed=seed, log_steps=50,
        eval_batch_size=128, max_candidates=64, device_gather=True,
        user_log_mask=False,
    )
    corpus, feats = data["corpus"], data["feats"]
    model = get_model(cfg.model)
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(len(corpus.word_dict) + 1, 300),
                       scale=0.1).astype(np.float32)
    table[0] = 0
    state = create_train_state(cfg, model.init(
        jax.random.PRNGKey(seed), cfg, table))
    samples = TrainSamples.from_file(data["train_shard"],
                                     corpus.news_index, cfg)
    state, stats = fit(cfg, model, state, samples, feats)

    eval_cfg = cfg.replace(user_log_mask=True, deterministic=True)
    scoring = compute_news_scoring(model, state.params, eval_cfg,
                                   data["feats_dev"])
    metrics = evaluate_impressions(model, state.params, eval_cfg,
                                   data["eval_samples"], scoring)
    return {
        "heads": heads, "seed": seed,
        "examples_per_sec": round(stats["examples_per_sec"], 1),
        "final_loss": round(stats["final_loss"], 4),
        "auc": round(100 * metrics["auc"], 2),
        "ndcg10": round(100 * metrics["ndcg10"], 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--heads", default="20,8")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--num_news", type=int, default=3000)
    ap.add_argument("--num_impressions", type=int, default=8000)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import bench_loop as BL

    from newsrecommendation_tpu.data import prepare_testing_data
    from newsrecommendation_tpu.data.loader import EvalSamples
    from newsrecommendation_tpu.data.mind import build_news_features, read_news
    from newsrecommendation_tpu.data.synthetic import generate_corpus
    from newsrecommendation_tpu.config import Config

    with tempfile.TemporaryDirectory() as root:
        corpus, feats, _ = BL.build_data(root, args.num_news,
                                         args.num_impressions, 4,
                                         model="NRMS")
        dev_dir = os.path.join(root, "dev")
        generate_corpus(dev_dir, num_news=len(corpus.news_index),
                        num_users=300, num_impressions=3000, num_topics=12,
                        title_len=18, max_history=50,
                        candidates_per_impression=20, seed=11, split="dev")
        prepare_testing_data(dev_dir, 1)
        probe_cfg = Config(model="NRMS", title_source="word_ids",
                           max_candidates=64)
        # the DEV corpus's own features (its doc ids name DIFFERENT news
        # than the train corpus's — scoring dev impressions against train
        # features is chance AUC by construction), words mapped through
        # the train vocab (the generator's topic->word pools are global)
        corpus_dev = read_news(os.path.join(dev_dir, "news.tsv"), probe_cfg,
                               "test", category_dict=corpus.category_dict,
                               subcategory_dict=corpus.subcategory_dict,
                               word_dict=corpus.word_dict)
        feats_dev = build_news_features(corpus_dev, probe_cfg)
        eval_samples = EvalSamples.from_file(
            os.path.join(dev_dir, "behaviors_0.tsv"), corpus_dev.news_index,
            probe_cfg)
        data = {
            "corpus": corpus, "feats": feats, "feats_dev": feats_dev,
            "train_shard": os.path.join(root, "train", "behaviors_np4_0.tsv"),
            "eval_samples": eval_samples,
        }
        by_heads: dict = {}
        for heads in [int(h) for h in args.heads.split(",")]:
            for seed in [int(s) for s in args.seeds.split(",")]:
                rec = run_one(heads, seed, data, epochs=args.epochs,
                              batch_size=args.batch_size)
                print(json.dumps(rec), flush=True)
                by_heads.setdefault(heads, []).append(rec)
        for heads, recs in by_heads.items():
            aucs = [r["auc"] for r in recs]
            eps = [r["examples_per_sec"] for r in recs]
            print(json.dumps({
                "summary_heads": heads,
                "auc_mean": round(float(np.mean(aucs)), 2),
                "auc_std": round(float(np.std(aucs)), 2),
                "examples_per_sec_mean": round(float(np.mean(eps)), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
