"""Training-dynamics parity: the actual torch reference vs the TPU stack.

Trains BOTH programs — the unmodified reference source at /root/reference/src
(via tools/torch_reference_run.py) and this repo's jitted train step — on a
byte-identical prepared corpus from identical initial weights, then compares
per-epoch loss trajectories and final eval metrics. This converts the
per-step oracle evidence ("same math per step",
tests/test_reference_train_oracle.py) into "same model after training" —
the last offline rung of the acceptance criterion below a real-MIND run
(reference README.md:68-80; VERDICT r3 task 1).

Both sides share: the prepared shard bytes, the news feature matrix, the
embedding table, and the initial model weights (our init is mapped onto the
reference state_dict). They differ only in framework RNG streams (dropout,
positive-slot placement), so trajectories agree statistically, not bitwise.

Usage:
    python tools/dynamics_parity.py [--model NRMS|NAML|both] [--scale N]
    python tools/dynamics_parity.py --json   # machine-readable lines only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from typing import Dict, List

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_data(root: str, cfg, *, num_news=300, num_users=80,
               num_impressions=1500, dev_impressions=400, seed=7):
    """Shared corpus: synthetic MIND dirs + prepared shards + features."""
    from newsrecommendation_tpu.data.mind import (
        build_news_features,
        random_word_embeddings,
        read_news,
    )
    from newsrecommendation_tpu.data.loader import EvalSamples
    from newsrecommendation_tpu.data.prepare import (
        prepare_testing_data,
        prepare_training_data,
    )
    from newsrecommendation_tpu.data.synthetic import generate_corpus

    train_dir, dev_dir = os.path.join(root, "train"), os.path.join(root, "dev")
    generate_corpus(train_dir, num_news=num_news, num_users=num_users,
                    num_impressions=num_impressions, seed=seed,
                    title_len=cfg.num_words_title)
    generate_corpus(dev_dir, num_news=num_news, num_users=num_users,
                    num_impressions=dev_impressions, seed=seed + 1,
                    title_len=cfg.num_words_title)
    prepare_training_data(train_dir, 1, cfg.npratio, cfg.seed)
    prepare_testing_data(dev_dir, 1)

    corpus = read_news(os.path.join(train_dir, "news.tsv"), cfg, "train")
    feats = build_news_features(corpus, cfg)
    corpus_dev = read_news(os.path.join(dev_dir, "news.tsv"), cfg, "test",
                           category_dict=corpus.category_dict,
                           subcategory_dict=corpus.subcategory_dict,
                           word_dict=corpus.word_dict)
    feats_dev = build_news_features(corpus_dev, cfg)
    eval_samples = EvalSamples.from_file(
        os.path.join(dev_dir, "behaviors_0.tsv"), corpus_dev.news_index, cfg,
        max_candidates=cfg.max_candidates)

    if cfg.title_source == "word_ids":
        table = random_word_embeddings(corpus.word_dict,
                                       cfg.word_embedding_dim, seed=cfg.seed)
        table_dev = table  # word vocab is train-time; shared at eval
    else:
        from newsrecommendation_tpu.data.embeddings import (
            create_news_embeddings,
            read_news_embeddings,
        )
        for d in (train_dir, dev_dir):
            create_news_embeddings(d, cfg.num_words_title,
                                   dim=cfg.word_embedding_dim, backend="hash")
        table = read_news_embeddings(train_dir, backend="hash")
        table_dev = read_news_embeddings(dev_dir, backend="hash")

    return {
        "train_shard": os.path.join(
            train_dir, f"behaviors_np{cfg.npratio}_0.tsv"),
        "corpus": corpus, "corpus_dev": corpus_dev,
        "feats": feats, "feats_dev": feats_dev,
        "eval_samples": eval_samples,
        "table": table, "table_dev": table_dev,
    }


def run_jax(cfg, data, params) -> dict:
    """Train this repo's stack; per-epoch mean loss/acc + final metrics.

    Mirrors what cli train_test does, with an explicit epoch loop so the
    trajectory is recorded at the same granularity as the torch side.
    """
    import jax
    import jax.numpy as jnp

    from newsrecommendation_tpu.data.loader import TrainSamples
    from newsrecommendation_tpu.eval.pipeline import (
        compute_news_scoring,
        evaluate_impressions,
    )
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    model = get_model(cfg.model)
    state = create_train_state(cfg, params)
    step = make_train_step(cfg, model, donate=False)
    samples = TrainSamples.from_file(data["train_shard"],
                                     data["corpus"].news_index, cfg)
    base_rng = jax.random.PRNGKey(cfg.seed)

    epoch_losses: List[float] = []
    epoch_accs: List[float] = []
    for ep in range(cfg.epochs):
        loss_sum, acc_sum, ex = 0.0, 0.0, 0.0
        for batch in samples.iter_batches(data["feats"], cfg.batch_size,
                                          epoch=ep, seed=cfg.seed):
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, dev, base_rng)
            w = float(batch["weight"].sum())
            loss_sum += float(m["loss"]) * w
            acc_sum += float(m["acc"]) * w
            ex += w
        epoch_losses.append(loss_sum / max(ex, 1.0))
        epoch_accs.append(acc_sum / max(ex, 1.0))

    eval_cfg = cfg.replace(user_log_mask=True, deterministic=True)
    eparams = dict(state.params)
    if cfg.title_source == "doc_table":
        # test-time corpus has its own title table (reference main.py:168)
        eparams["embedding_table"] = jnp.asarray(
            np.asarray(data["table_dev"], np.float32))
    scoring = compute_news_scoring(model, eparams, eval_cfg,
                                   data["feats_dev"])
    metrics = evaluate_impressions(model, eparams, eval_cfg,
                                   data["eval_samples"], scoring)
    return {
        "framework": "jax-tpu",
        "model": cfg.model,
        "epochs": cfg.epochs,
        "epoch_losses": epoch_losses,
        "epoch_accs": epoch_accs,
        "metrics": {k: (100 * v if k != "count" else v)
                    for k, v in metrics.items()
                    if k in ("auc", "mrr", "ndcg5", "ndcg10", "count")},
    }


def run_pair(model_name: str, *, scale: int = 1, epochs: int = 4,
             root: str | None = None) -> Dict[str, dict]:
    """Run both frameworks on one shared corpus; returns both records."""
    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    import jax

    if model_name == "NRMS":
        cfg = Config(
            model="NRMS", title_source="word_ids", num_words_title=10,
            user_log_length=20, word_embedding_dim=64, news_dim=64,
            num_attention_heads=8, news_query_vector_dim=32,
            user_query_vector_dim=32, batch_size=32, npratio=4,
            drop_rate=0.2, lr=1e-3, epochs=epochs, user_log_mask=False,
            freeze_embedding=False, deterministic=False, seed=3,
            max_candidates=32, filter_num=0, use_category=False,
            use_subcategory=False,
        )
    else:
        cfg = Config(
            model="NAML", title_source="doc_table", num_words_title=10,
            user_log_length=20, word_embedding_dim=64, news_dim=64,
            num_attention_heads=8,
            news_query_vector_dim=32, user_query_vector_dim=32,
            batch_size=32, npratio=4, drop_rate=0.2, lr=1e-3, epochs=epochs,
            user_log_mask=False, freeze_embedding=True, deterministic=False,
            seed=3, max_candidates=32, filter_num=0, use_category=True,
            use_subcategory=True, category_emb_dim=32,
        )

    owns_root = root is None
    if owns_root:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
    data = build_data(root, cfg, num_news=300 * scale, num_users=80 * scale,
                      num_impressions=1500 * scale,
                      dev_impressions=400 * scale, seed=7)

    model = get_model(cfg.model)
    n_cat = len(data["corpus"].category_dict)
    n_subcat = len(data["corpus"].subcategory_dict)
    params = model.init(jax.random.PRNGKey(cfg.seed), cfg,
                        np.asarray(data["table"], np.float32),
                        n_cat, n_subcat)

    jax_rec = run_jax(cfg, data, params)

    from tools.torch_reference_run import run_reference
    torch_rec = run_reference(
        cfg, data["train_shard"], data["corpus"].news_index, data["feats"],
        np.asarray(data["table"], np.float32),
        eval_samples=data["eval_samples"],
        news_combined_eval=data["feats_dev"],
        eval_table=(np.asarray(data["table_dev"], np.float32)
                    if cfg.title_source == "doc_table" else None),
        init_params=params, seed=cfg.seed,
        num_category=n_cat, num_subcategory=n_subcat)

    if owns_root:
        tmp.cleanup()
    return {"jax": jax_rec, "torch": torch_rec}


def compare(pair: Dict[str, dict], *, loss_tol: float, auc_tol: float) -> dict:
    """Trajectory + endpoint agreement; returns the verdict record."""
    j, t = pair["jax"], pair["torch"]
    per_epoch = [abs(a - b) for a, b in zip(j["epoch_losses"],
                                            t["epoch_losses"])]
    dauc = abs(j["metrics"]["auc"] - t["metrics"]["auc"])
    both_learn = (j["epoch_losses"][-1] < j["epoch_losses"][0]
                  and t["epoch_losses"][-1] < t["epoch_losses"][0])
    return {
        "model": j["model"],
        "epoch_loss_abs_diff": [round(d, 4) for d in per_epoch],
        "max_epoch_loss_diff": round(max(per_epoch), 4),
        "final_auc_jax": round(j["metrics"]["auc"], 2),
        "final_auc_torch": round(t["metrics"]["auc"], 2),
        "auc_diff": round(dauc, 2),
        "both_loss_decreasing": both_learn,
        "pass": bool(max(per_epoch) <= loss_tol and dauc <= auc_tol
                     and both_learn),
        "loss_tol": loss_tol, "auc_tol": auc_tol,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="both", choices=["NRMS", "NAML", "both"])
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--loss_tol", type=float, default=0.08)
    ap.add_argument("--auc_tol", type=float, default=3.0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    models = ["NRMS", "NAML"] if args.model == "both" else [args.model]
    ok = True
    for m in models:
        pair = run_pair(m, scale=args.scale, epochs=args.epochs)
        verdict = compare(pair, loss_tol=args.loss_tol, auc_tol=args.auc_tol)
        if args.json:
            print(json.dumps({"pair": pair, "verdict": verdict}))
        else:
            print(json.dumps(verdict, indent=2))
            print(f"  jax   losses: {[round(x, 4) for x in pair['jax']['epoch_losses']]}")
            print(f"  torch losses: {[round(x, 4) for x in pair['torch']['epoch_losses']]}")
            print(f"  jax   metrics: {pair['jax']['metrics']}")
            print(f"  torch metrics: {pair['torch']['metrics']}")
        ok = ok and verdict["pass"]
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
