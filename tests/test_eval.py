"""Eval pipeline: news-vector cache, doc-sim probe, vectorized impression
metrics vs the per-impression numpy oracle loop (reference main.py:240-263)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsrecommendation_tpu import metrics as M
from newsrecommendation_tpu.data.loader import EvalSamples
from newsrecommendation_tpu.eval import (
    compute_news_scoring,
    doc_sim_probe,
    evaluate_impressions,
)
from newsrecommendation_tpu.models import get_model


@pytest.fixture
def model_and_params(tiny_cfg, rng):
    model = get_model(tiny_cfg.model)
    table = rng.normal(size=(30, tiny_cfg.word_embedding_dim)).astype(np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), tiny_cfg, table)
    return model, params


def test_news_scoring_chunking_invariance(tiny_cfg, rng, model_and_params):
    model, params = model_and_params
    feats = rng.integers(0, 30, size=(37, tiny_cfg.news_feature_width)).astype(np.int32)
    small = compute_news_scoring(model, params, tiny_cfg.replace(eval_news_chunk=8),
                                 feats)
    big = compute_news_scoring(model, params, tiny_cfg.replace(eval_news_chunk=64),
                               feats)
    assert small.shape == (37, tiny_cfg.news_dim)
    np.testing.assert_allclose(np.array(small), np.array(big), rtol=1e-5,
                               atol=1e-6)


def test_news_scoring_data_sharded_phase1_matches(tiny_cfg, rng,
                                                  model_and_params):
    """Phase 1 sharded over the 'data' axis of the 8-device mesh produces
    the same vectors as the single-device encode (VERDICT r3 task 6; the
    reference's phase-1 loop is one device per process, main.py:185-198)."""
    from newsrecommendation_tpu.parallel import make_mesh

    model, params = model_and_params
    feats = rng.integers(
        0, 30, size=(37, tiny_cfg.news_feature_width)).astype(np.int32)
    mesh = make_mesh(tiny_cfg)
    assert mesh.shape["data"] == 8
    plain = compute_news_scoring(model, params,
                                 tiny_cfg.replace(eval_news_chunk=16), feats)
    # chunk 10 is NOT divisible by 8: exercises the round-up path too
    sharded = compute_news_scoring(model, params,
                                   tiny_cfg.replace(eval_news_chunk=10),
                                   feats, mesh=mesh)
    assert sharded.shape == (37, tiny_cfg.news_dim)
    np.testing.assert_allclose(np.array(sharded), np.array(plain),
                               rtol=1e-5, atol=1e-6)


def test_doc_sim_probe_detects_collapse(rng):
    collapsed = np.tile(rng.normal(size=(1, 8)).astype(np.float32), (50, 1))
    healthy = rng.normal(size=(50, 8)).astype(np.float32)
    # i==j pairs contribute 0 but still divide the mean (reference
    # main.py:203-208 behavior), so "collapsed" reads slightly below 1.0
    assert doc_sim_probe(collapsed, num_pairs=2000, seed=0) > 0.95
    assert abs(doc_sim_probe(healthy, num_pairs=2000, seed=0)) < 0.5


def _manual_eval(samples, news_scoring, user_vecs):
    """The reference's per-impression CPU loop (main.py:249-263) as oracle."""
    aucs, mrrs, n5s, n10s = [], [], [], []
    for i in range(samples.num_samples):
        real = samples.candidate_mask[i] > 0
        label = samples.labels[i][real]
        if label.mean() in (0.0, 1.0):
            continue
        cand_vecs = news_scoring[samples.candidates[i][real]]
        score = cand_vecs @ user_vecs[i]
        aucs.append(M.roc_auc_score(label, score))
        mrrs.append(M.mrr_score(label, score))
        n5s.append(M.ndcg_score(label, score, k=5))
        n10s.append(M.ndcg_score(label, score, k=10))
    return (np.mean(aucs), np.mean(mrrs), np.mean(n5s), np.mean(n10s),
            len(aucs))


def test_evaluate_impressions_matches_oracle(tiny_cfg, rng, model_and_params,
                                             synthetic_dirs):
    import os
    from newsrecommendation_tpu.data import prepare_testing_data, read_news

    model, params = model_and_params
    _, dev_dir = synthetic_dirs
    prepare_testing_data(dev_dir, 1)
    cfg = tiny_cfg.replace(eval_batch_size=16, filter_num=0)
    corpus = read_news(os.path.join(dev_dir, "news.tsv"), cfg, "test")
    es = EvalSamples.from_file(os.path.join(dev_dir, "behaviors_0.tsv"),
                               corpus.news_index, cfg)
    news_scoring = np.asarray(
        rng.normal(size=(corpus.num_news + 1, cfg.news_dim)), dtype=np.float32)

    results = evaluate_impressions(model, params, cfg, es, news_scoring)

    # oracle user vectors via the same encoder
    hist_vecs = jnp.asarray(news_scoring)[jnp.asarray(es.history)]
    user_vecs = np.array(model.user_encoder(params, cfg, hist_vecs,
                                            jnp.asarray(es.history_mask)))
    want_auc, want_mrr, want_n5, want_n10, n = _manual_eval(
        es, news_scoring, user_vecs)

    assert results["count"] == n
    assert results["auc"] == pytest.approx(want_auc, abs=2e-4)
    assert results["mrr"] == pytest.approx(want_mrr, abs=2e-4)
    assert results["ndcg5"] == pytest.approx(want_n5, abs=2e-4)
    assert results["ndcg10"] == pytest.approx(want_n10, abs=2e-4)


def test_degenerate_impressions_excluded(tiny_cfg, rng, model_and_params):
    model, params = model_and_params
    cfg = tiny_cfg.replace(eval_batch_size=4)
    L, C = cfg.user_log_length, 6
    es = EvalSamples(
        history=np.zeros((3, L), np.int32),
        history_mask=np.zeros((3, L), np.float32),
        candidates=np.ones((3, C), np.int32),
        labels=np.array([[1, 0, 0, 0, 0, 0],
                         [1, 1, 1, 0, 0, 0],   # all-1 among real -> excluded
                         [0, 0, 0, 0, 0, 0]],  # all-0 -> excluded
                        np.float32),
        candidate_mask=np.array([[1, 1, 1, 0, 0, 0],
                                 [1, 1, 1, 0, 0, 0],
                                 [1, 1, 1, 0, 0, 0]], np.float32),
    )
    news_scoring = rng.normal(size=(5, cfg.news_dim)).astype(np.float32)
    results = evaluate_impressions(model, params, cfg, es, news_scoring)
    assert results["count"] == 1


def test_sharded_eval_equals_single_process(tiny_cfg, rng, model_and_params,
                                            synthetic_dirs):
    """The multi-host eval model (VERDICT r1 missing #2): split impressions
    into per-process shard files, evaluate each shard separately, combine
    the metric sums — must equal evaluating the full set in one process."""
    import os
    from newsrecommendation_tpu.data import prepare_testing_data, read_news
    from newsrecommendation_tpu.eval import (
        combine_metric_sums,
        summarize_metric_sums,
    )

    model, params = model_and_params
    _, dev_dir = synthetic_dirs
    cfg = tiny_cfg.replace(eval_batch_size=8, filter_num=0, max_candidates=16)
    corpus = read_news(os.path.join(dev_dir, "news.tsv"), cfg, "test")
    news_scoring = np.asarray(
        rng.normal(size=(corpus.num_news + 1, cfg.news_dim)), dtype=np.float32)

    # single "process": one shard over everything
    prepare_testing_data(dev_dir, 1)
    es_full = EvalSamples.from_file(
        os.path.join(dev_dir, "behaviors_0.tsv"), corpus.news_index, cfg,
        max_candidates=cfg.max_candidates)
    want = evaluate_impressions(model, params, cfg, es_full, news_scoring)

    # three "processes": round-robin shards, each evaluated independently
    prepare_testing_data(dev_dir, 3)
    shard_sums = []
    for r in range(3):
        es = EvalSamples.from_file(
            os.path.join(dev_dir, f"behaviors_{r}.tsv"), corpus.news_index,
            cfg, max_candidates=cfg.max_candidates)
        shard_sums.append(evaluate_impressions(
            model, params, cfg, es, news_scoring, return_sums=True))

    total = combine_metric_sums(shard_sums)
    seen = total.pop("samples_seen")
    got = summarize_metric_sums(total, seen)

    assert got["count"] == want["count"]
    assert got["samples_seen"] == want["samples_seen"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_cross_process_sum_single_process_identity():
    from newsrecommendation_tpu.eval import cross_process_sum

    sums = {"auc": 1.5, "count": 3.0}
    assert cross_process_sum(sums) == sums


def test_eval_with_mesh_matches_unmeshed(tiny_cfg, rng, model_and_params):
    """Batch rows sharded over the 'data' axis of the 8-device mesh give
    the same metric sums as unsharded eval."""
    from newsrecommendation_tpu.parallel import make_mesh

    model, params = model_and_params
    cfg = tiny_cfg.replace(eval_batch_size=8, data_parallel=8)
    L, C, N = cfg.user_log_length, 12, 20
    r = np.random.default_rng(7)
    labels = (r.random((N, C)) > 0.7).astype(np.float32)
    # distinct candidates per row: rank-based metrics then can't flip on
    # the ~1e-7 score noise from sharded-matmul accumulation order
    cands = np.stack([r.permutation(40)[:C] for _ in range(N)]).astype(np.int32)
    es = EvalSamples(
        history=r.integers(0, 40, size=(N, L)).astype(np.int32),
        history_mask=(r.random((N, L)) > 0.3).astype(np.float32),
        candidates=cands,
        labels=labels,
        candidate_mask=np.ones((N, C), np.float32),
    )
    news_scoring = rng.normal(size=(40, cfg.news_dim)).astype(np.float32)
    plain = evaluate_impressions(model, params, cfg, es, news_scoring)
    meshed = evaluate_impressions(model, params, cfg, es, news_scoring,
                                  mesh=make_mesh(cfg))
    for k in ("auc", "mrr", "ndcg5", "ndcg10", "count"):
        assert meshed[k] == pytest.approx(plain[k], abs=1e-5)


def test_eval_jits_cached_per_model_cfg(tiny_cfg):
    """Repeated evals must reuse the SAME jit objects (a fresh jit per
    call re-traces and, via a remote compile service, re-compiles the
    identical program — measured ~50 s/call; docs/PERF.md round 4)."""
    from newsrecommendation_tpu.eval.pipeline import (
        _news_encode_jit, make_eval_step,
    )
    from newsrecommendation_tpu.models import get_model

    model = get_model(tiny_cfg.model)
    assert make_eval_step(model, tiny_cfg) is make_eval_step(model, tiny_cfg)
    assert _news_encode_jit(model, tiny_cfg) is _news_encode_jit(model,
                                                                 tiny_cfg)
    other = tiny_cfg.replace(eval_batch_size=tiny_cfg.eval_batch_size + 1)
    assert make_eval_step(model, other) is not make_eval_step(model, tiny_cfg)


def test_eval_scan_matches_single_dispatch(tiny_cfg, rng, model_and_params,
                                           synthetic_dirs):
    """eval_steps_per_call k>1 (lax.scan over stacked batches, sums as the
    carry) must produce identical metric sums to k=1 — including the
    leftover <k tail going through the single-batch program."""
    import os
    from newsrecommendation_tpu.data import prepare_testing_data, read_news

    model, params = model_and_params
    _, dev_dir = synthetic_dirs
    prepare_testing_data(dev_dir, 1)
    base = tiny_cfg.replace(eval_batch_size=8, filter_num=0)
    corpus = read_news(os.path.join(dev_dir, "news.tsv"), base, "test")
    es = EvalSamples.from_file(os.path.join(dev_dir, "behaviors_0.tsv"),
                               corpus.news_index, base)
    news_scoring = np.asarray(
        rng.normal(size=(corpus.num_news + 1, base.news_dim)),
        dtype=np.float32)

    single = evaluate_impressions(model, params,
                                  base.replace(eval_steps_per_call=1),
                                  es, news_scoring, return_sums=True)
    scanned = evaluate_impressions(model, params,
                                   base.replace(eval_steps_per_call=3),
                                   es, news_scoring, return_sums=True)
    assert single.keys() == scanned.keys()
    for k in single:
        assert scanned[k] == pytest.approx(single[k], rel=1e-6), k
