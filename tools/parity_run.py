"""One-command real-MIND accuracy-parity harness.

Reproduces both README result rows of the reference
(/root/reference/README.md:68-80) and asserts the metrics land in the
published band:

  NRMS  title-only          AUC 66.61  nDCG@10 41.46  (4 epochs)
  NAML  title+cat+subcat    AUC 66.24  nDCG@10 41.56  (5 epochs)

both at effective batch 128, lr 3e-4 (reference demo.sh:14-32 semantics:
train with user_log_mask=False, test with user_log_mask=True). The NRMS row
uses the upstream word-id/GloVe pipeline (the fork commented it out but the
numbers come from it); NAML uses the word-id pipeline with category and
subcategory views, freeze_embedding=False for GloVe fine-tuning parity with
upstream (pass --freeze to mirror the fork's frozen-table demo instead).

Usage (with MIND-small on disk via scripts/download_data.sh):

    python tools/parity_run.py --data_root data [--model NRMS|NAML|both]

Offline dry run (no MIND data; synthetic corpus, relaxed beats-chance
assertions — proves the harness end-to-end):

    python tools/parity_run.py --dry_run

Exit code 0 = every executed row within band. Prints one JSON line per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Acceptance bands: published value +/- tolerance. The reference publishes
# single runs with no variance estimate; +/-0.7 AUC is the common MIND-small
# seed-to-seed spread for these models.
BANDS = {
    "NRMS": {"auc": (65.9, 67.3), "ndcg10": (40.8, 42.2), "epochs": 4},
    "NAML": {"auc": (65.5, 66.9), "ndcg10": (40.9, 42.3), "epochs": 5},
}


def build_config(model: str, train_dir: str, dev_dir: str, model_dir: str,
                 *, epochs: int, glove: str | None, freeze: bool,
                 overrides: dict):
    from newsrecommendation_tpu.config import Config

    base = dict(
        model=model,
        title_source="word_ids",
        tokenizer="treebank",
        train_data_dir=train_dir,
        test_data_dir=dev_dir,
        model_dir=model_dir,
        batch_size=32,
        data_parallel=0,  # all local devices on the data axis (32*N)
        epochs=epochs,
        lr=3e-4,
        npratio=4,
        user_log_mask=False,  # train-time (demo.sh:18); eval flips it below
        use_category=(model == "NAML"),
        use_subcategory=(model == "NAML"),
        freeze_embedding=freeze,
        glove_embedding_path=glove,
        prepare=True,
    )
    base.update(overrides)
    return Config(**base)


def run_row(model: str, args, overrides: dict):
    import jax

    from newsrecommendation_tpu.cli import run_test, run_train

    train_dir = os.path.join(args.data_root, "MINDsmall_train")
    dev_dir = os.path.join(args.data_root, "MINDsmall_dev")
    glove = os.path.join(args.data_root, "glove.840B.300d.txt")
    model_dir = os.path.join(args.model_dir, model)

    epochs = overrides.pop("epochs", BANDS[model]["epochs"])
    cfg = build_config(
        model, train_dir, dev_dir, model_dir, epochs=epochs,
        glove=(glove if os.path.exists(glove) else None),
        freeze=args.freeze, overrides=overrides,
    )
    n_dev = len(jax.devices())
    print(f"[parity] {model}: effective batch "
          f"{cfg.batch_size * (cfg.data_parallel or n_dev)} on {n_dev} "
          f"device(s), {cfg.epochs} epochs")
    state, vocabs, _ = run_train(cfg)
    # reference demo.sh:26 evaluates with user_log_mask=True
    results = run_test(cfg.replace(user_log_mask=True), state=state,
                       vocabs=vocabs)
    return results


def check_band(model: str, results: dict, dry_run: bool):
    auc, ndcg10 = 100 * results["auc"], 100 * results["ndcg10"]
    if dry_run:
        ok = auc > 55.0  # beats chance decisively on synthetic data
        band = {"auc": (55.0, 100.0), "ndcg10": (0.0, 100.0)}
    else:
        band = {k: BANDS[model][k] for k in ("auc", "ndcg10")}
        ok = (band["auc"][0] <= auc <= band["auc"][1]
              and band["ndcg10"][0] <= ndcg10 <= band["ndcg10"][1])
    print(json.dumps({
        "row": model, "auc": round(auc, 2), "mrr": round(100 * results["mrr"], 2),
        "ndcg5": round(100 * results["ndcg5"], 2),
        "ndcg10": round(ndcg10, 2),
        "band_auc": band["auc"], "band_ndcg10": band["ndcg10"],
        "samples": int(results["samples_seen"]), "pass": ok,
        "dry_run": dry_run,
    }))
    return ok


def make_dry_run_data(root: str):
    from newsrecommendation_tpu.data.synthetic import generate_corpus

    train = os.path.join(root, "MINDsmall_train")
    dev = os.path.join(root, "MINDsmall_dev")
    generate_corpus(train, num_news=150, num_users=50, num_impressions=800,
                    seed=1, split="train")
    generate_corpus(dev, num_news=150, num_users=50, num_impressions=200,
                    seed=2, split="dev")
    return root


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="data",
                   help="dir holding MINDsmall_train/ MINDsmall_dev/ "
                        "[glove.840B.300d.txt]")
    p.add_argument("--model", default="both", choices=["NRMS", "NAML", "both"])
    p.add_argument("--model_dir", default="model/parity")
    p.add_argument("--freeze", action="store_true",
                   help="freeze the word table (the fork demo's setting; "
                        "default trains it, matching upstream)")
    p.add_argument("--dry_run", action="store_true",
                   help="synthetic data + relaxed assertions (no MIND)")
    args = p.parse_args(argv)

    dry_overrides = {}
    if args.dry_run:
        # tiny shapes don't need (or want) the TPU tunnel; run the dry
        # harness on host CPU (no-op if a backend is already live)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        tmp = tempfile.mkdtemp(prefix="parity_dry_")
        args.data_root = make_dry_run_data(tmp)
        args.model_dir = os.path.join(tmp, "model")
        dry_overrides = dict(
            epochs=6, batch_size=8, num_words_title=8, user_log_length=10,
            word_embedding_dim=32, news_dim=32, num_attention_heads=4,
            news_query_vector_dim=16, user_query_vector_dim=16,
            filter_num=0, lr=3e-3, eval_batch_size=16, max_candidates=16,
            log_steps=100,
        )
    else:
        for sub in ("MINDsmall_train", "MINDsmall_dev"):
            path = os.path.join(args.data_root, sub, "behaviors.tsv")
            if not os.path.exists(path):
                print(f"missing {path}; run scripts/download_data.sh first "
                      f"(or use --dry_run)", file=sys.stderr)
                return 2

    models = ["NRMS", "NAML"] if args.model == "both" else [args.model]
    ok = True
    for m in models:
        results = run_row(m, args, dict(dry_overrides))
        ok = check_band(m, results, args.dry_run) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    from newsrecommendation_tpu.utils import setup_logger

    setup_logger()
    sys.exit(main())
