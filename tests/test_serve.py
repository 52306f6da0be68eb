"""Serving API: checkpoint -> Recommender -> consistent, sensible rankings."""

import os

import numpy as np
import pytest

from newsrecommendation_tpu.serve import Recommender


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a tiny NRMS on synthetic data; return (cfg, ckpt_path, dev_dir)."""
    import tempfile
    from newsrecommendation_tpu.cli import run_train
    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.data.synthetic import generate_corpus

    tmp = tempfile.mkdtemp()
    train_dir = os.path.join(tmp, "train")
    generate_corpus(train_dir, num_news=100, num_users=30,
                    num_impressions=400, seed=3)
    model_dir = str(tmp_path_factory.mktemp("model"))
    cfg = Config(
        model="NRMS", title_source="word_ids", epochs=6,
        num_words_title=8, user_log_length=10, word_embedding_dim=32,
        news_dim=32, num_attention_heads=4, news_query_vector_dim=16,
        user_query_vector_dim=16, batch_size=8, lr=3e-3, filter_num=0,
        log_steps=1000, train_data_dir=train_dir, model_dir=model_dir,
    )
    run_train(cfg)
    return cfg, os.path.join(model_dir, "epoch-6.ckpt"), train_dir


def test_from_checkpoint_and_score(trained):
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    history = ["N1", "N2", "N3"]
    candidates = ["N10", "N20", "N30", "N40"]
    scores = rec.score(history, candidates)
    assert scores.shape == (4,)
    assert np.all(np.isfinite(scores))

    ranked = rec.rank(history, candidates)
    assert sorted(ranked) == sorted(candidates)
    # ranking consistent with scores
    want = [candidates[i] for i in np.argsort(-scores, kind="stable")]
    assert ranked == want


def test_batch_matches_single(trained):
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    hists = [["N1", "N2"], ["N5"]]
    cands = [["N10", "N20"], ["N30", "N40"]]
    batch = rec.score_batch(hists, cands, max_candidates=2)
    for i in range(2):
        single = rec.score(hists[i], cands[i])
        np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-6)


def test_unknown_docs_tolerated(trained):
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    scores = rec.score(["TOTALLY_UNKNOWN"], ["N10", "ALSO_UNKNOWN"])
    assert scores.shape == (2,)
    assert np.all(np.isfinite(scores))


def test_preference_signal(trained):
    """A user with history in one topic should rank same-topic news higher
    on average than off-topic news (the synthetic click model guarantees
    learnable signal)."""
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)

    # recover topics from the synthetic corpus file
    topics = {}
    with open(os.path.join(data_dir, "news.tsv")) as f:
        for line in f:
            p = line.split("\t")
            topics.setdefault(p[1], []).append(p[0])
    cats = sorted(topics)
    hist = topics[cats[0]][:6]
    same = topics[cats[0]][6:12]
    other = topics[cats[1]][:6]
    s_same = rec.score(hist, same).mean()
    s_other = rec.score(hist, other).mean()
    assert s_same > s_other


def test_dense_scorer_matches_gather(trained):
    cfg, ckpt, data_dir = trained
    rec_g = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    rec_d = Recommender(rec_g.model, rec_g.params, cfg, rec_g.news_index,
                        rec_g.news_scoring, scorer="dense")
    history = ["N1", "N5", "N9"]
    candidates = ["N10", "N20", "N30", "N40", "N50"]
    np.testing.assert_allclose(rec_g.score(history, candidates),
                               rec_d.score(history, candidates),
                               rtol=1e-5, atol=1e-5)


def test_recommend_topk_over_corpus(trained):
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    history = ["N1", "N2", "N3"]
    top = rec.recommend(history, k=5)
    assert len(top) == 5
    assert len(set(top)) == 5
    assert all(t in rec.news_index for t in top)
    # top-1 over the corpus must score >= any sampled candidate's score
    sample = ["N%d" % i for i in range(1, 60, 7)]
    best_sampled = float(np.max(rec.score(history, sample)))
    top_score = float(rec.score(history, [top[0]])[0])
    assert top_score >= best_sampled - 1e-5


def test_auto_scorer_picks_by_corpus_size(trained):
    """serve_scorer="auto": dense below serve_dense_max_rows, gather above
    (crossover measured ~750k rows, tools/bench_scorer_crossover.py)."""
    from newsrecommendation_tpu.ops.scoring import (
        score_cached_impressions,
        score_cached_impressions_dense,
    )

    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    small = Recommender(rec.model, rec.params, cfg, rec.news_index,
                        rec.news_scoring, scorer="auto")
    assert small.scorer == "dense"
    assert small._scorer is score_cached_impressions_dense
    big = Recommender(rec.model, rec.params,
                      cfg.replace(serve_dense_max_rows=10), rec.news_index,
                      rec.news_scoring, scorer="auto")
    assert big.scorer == "gather"
    assert big._scorer is score_cached_impressions


def test_gapped_news_index_rejected(trained):
    cfg, ckpt, data_dir = trained
    rec = Recommender.from_checkpoint(ckpt, cfg, data_dir)
    gapped = dict(rec.news_index)
    k = next(iter(gapped))
    gapped[k] = len(gapped) + 5  # hole in the 1-based range
    with pytest.raises(ValueError, match="dense 1-based"):
        Recommender(rec.model, rec.params, cfg, gapped, rec.news_scoring)
    zeroed = dict(rec.news_index)
    zeroed[k] = 0  # collides with the unknown-news row
    with pytest.raises(ValueError, match="dense 1-based"):
        Recommender(rec.model, rec.params, cfg, zeroed, rec.news_scoring)
