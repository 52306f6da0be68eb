"""Serving layer: micro-batching scorer + HTTP API (server.py).

The reference has no serving component (its eval loop is the closest
analogue, /root/reference/src/main.py:185-263); these tests cover the new
capability: batching correctness (coalesced results == unbatched results),
shape bucketing, and the HTTP contract.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from newsrecommendation_tpu.config import Config
from newsrecommendation_tpu.serve import Recommender
from newsrecommendation_tpu.server import (
    BatchingScorer,
    next_bucket,
    serve,
)


@pytest.fixture(scope="module")
def rec():
    """Small untrained Recommender (batching correctness needs no training)."""
    import jax

    from newsrecommendation_tpu.models import get_model

    cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=8,
        user_log_length=10, word_embedding_dim=32, news_dim=32,
        num_attention_heads=4, news_query_vector_dim=16,
        user_query_vector_dim=16, deterministic=True, user_log_mask=True,
    )
    rng = np.random.default_rng(0)
    vocab = 200
    num_news = 60
    table = rng.normal(0, 0.1, size=(vocab, 32)).astype(np.float32)
    table[0] = 0.0
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    feats = np.zeros((num_news + 1, cfg.news_feature_width), np.int32)
    feats[1:] = rng.integers(1, vocab, size=(num_news, cfg.news_feature_width))
    news_index = {f"N{i}": i for i in range(1, num_news + 1)}
    return Recommender.from_state(cfg, params, news_index, feats)


def test_next_bucket():
    assert next_bucket(1, (8, 32)) == 8
    assert next_bucket(8, (8, 32)) == 8
    assert next_bucket(9, (8, 32)) == 32
    assert next_bucket(99, (8, 32)) == 32  # capped at the largest bucket


def test_recommend_batch_matches_single(rec):
    hists = [["N1", "N2"], ["N7"], ["N3", "N9", "N11"]]
    ids, scores = rec.recommend_batch(hists, k=5)
    assert len(ids) == len(scores) == 3
    for i, h in enumerate(hists):
        assert ids[i] == rec.recommend(h, k=5)
        assert len(scores[i]) == len(ids[i]) == 5
        # aligned and descending
        assert scores[i] == sorted(scores[i], reverse=True)


def test_cache_rows_padded_to_bucket(rec):
    """The serving cache pads its rows to a fixed bucket so corpus growth
    within the bucket keeps every jitted shape stable across /reload."""
    from newsrecommendation_tpu.serve import _CACHE_ROW_BUCKET

    assert rec.news_scoring.shape[0] % _CACHE_ROW_BUCKET == 0
    assert rec.corpus_size == len(rec.news_index)
    # a differently-sized corpus within the bucket -> identical shapes
    rng = np.random.default_rng(1)
    feats2 = np.zeros((91, rec.cfg.news_feature_width), np.int32)
    feats2[1:] = rng.integers(1, 200, size=(90, rec.cfg.news_feature_width))
    rec2 = Recommender.from_state(rec.cfg, rec.params,
                                  {f"M{i}": i for i in range(1, 91)}, feats2)
    assert rec2.news_scoring.shape == rec.news_scoring.shape
    # padded rows never surface in corpus-wide top-k
    ids, scores = rec2.recommend_batch([["M1"]], k=90)
    assert len(ids[0]) == 90 and all(np.isfinite(scores[0]))
    assert all(i in rec2.news_index for i in ids[0])


def test_recommend_k_clamped_to_corpus(rec):
    """k beyond the corpus size returns every real doc once, with scores
    aligned (the -inf padding row is filtered from both lists)."""
    n_docs = len(rec.news_index)
    ids, scores = rec.recommend_batch([["N1"]], k=n_docs + 1)
    assert len(ids[0]) == len(scores[0]) == n_docs
    assert len(set(ids[0])) == n_docs
    assert all(np.isfinite(scores[0]))


def test_batching_matches_direct(rec):
    """Concurrent coalesced requests return exactly the unbatched scores."""
    batcher = BatchingScorer(rec, max_batch=16, max_delay_ms=200)
    try:
        hists = [[f"N{1 + (i % 7)}", f"N{2 + i % 5}"] for i in range(12)]
        cands = [[f"N{10 + i}", f"N{20 + i}", f"N{30 + i}"]
                 for i in range(12)]
        results = [None] * 12
        barrier = threading.Barrier(12)

        def worker(i):
            barrier.wait()
            results[i] = batcher.score(hists[i], cands[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in range(12):
            want = rec.score(hists[i], cands[i])
            np.testing.assert_allclose(results[i], want, rtol=1e-5,
                                       atol=1e-6)
        snap = batcher.stats.snapshot()
        assert snap["requests"] == 12
        # the barrier makes all 12 requests near-simultaneous and the 200 ms
        # window is huge relative to queue hops: they must coalesce
        assert snap["batches"] < 12
        assert snap["max_batch_size"] > 1
    finally:
        batcher.close()


def test_batching_mixed_kinds_and_errors(rec):
    batcher = BatchingScorer(rec, max_batch=8, max_delay_ms=50)
    try:
        out = {}

        def do_score():
            out["score"] = batcher.score(["N1"], ["N10", "N11"])

        def do_rec():
            out["rec"] = batcher.recommend(["N2"], k=3)

        ts = [threading.Thread(target=do_score),
              threading.Thread(target=do_rec)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        np.testing.assert_allclose(out["score"],
                                   rec.score(["N1"], ["N10", "N11"]),
                                   rtol=1e-5, atol=1e-6)
        ids, scores = out["rec"]
        assert ids == rec.recommend(["N2"], k=3)
        assert len(scores) == 3
    finally:
        batcher.close()
    with pytest.raises(RuntimeError):
        batcher.score(["N1"], ["N2"])  # closed


@pytest.fixture(scope="module")
def http_srv(rec):
    srv = serve(rec, host="127.0.0.1", port=0, max_batch=8, max_delay_ms=5)
    yield srv
    srv.shutdown()
    srv.batcher.close()


def _post(srv, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=30)
    conn.request("POST", path, body=json.dumps(payload),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read().decode())
    conn.close()
    return resp.status, body


def _get(srv, path):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read().decode())
    conn.close()
    return resp.status, body


def test_http_healthz_stats(http_srv, rec):
    status, body = _get(http_srv, "/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["corpus_size"] == len(rec.news_index)
    status, body = _get(http_srv, "/stats")
    assert status == 200
    assert body["requests"] >= 1  # warmup counted


def test_http_score_and_recommend(http_srv, rec):
    hist = ["N1", "N2"]
    cands = ["N10", "N20", "N30"]
    status, body = _post(http_srv, "/score",
                         {"history": hist, "candidates": cands})
    assert status == 200
    np.testing.assert_allclose(body["scores"], rec.score(hist, cands),
                               rtol=1e-5, atol=1e-6)
    assert body["ranked"] == rec.rank(hist, cands)

    status, body = _post(http_srv, "/recommend", {"history": hist, "k": 4})
    assert status == 200
    assert body["doc_ids"] == rec.recommend(hist, k=4)
    assert len(body["scores"]) == 4


def test_run_server_from_checkpoint(tmp_path):
    """The CLI --mode serve path: checkpoint + data dir -> live server."""
    import jax

    from newsrecommendation_tpu.ckpt import save_checkpoint
    from newsrecommendation_tpu.data import build_news_features, read_news
    from newsrecommendation_tpu.data.synthetic import generate_corpus
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.server import run_server
    from newsrecommendation_tpu.train import create_train_state

    data_dir = str(tmp_path / "dev")
    generate_corpus(data_dir, num_news=50, num_users=10,
                    num_impressions=40, seed=5)
    cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=8,
        user_log_length=10, word_embedding_dim=16, news_dim=16,
        num_attention_heads=4, news_query_vector_dim=8,
        user_query_vector_dim=8, filter_num=0, deterministic=True,
        user_log_mask=True, mode="serve", model_dir=str(tmp_path / "model"),
        test_data_dir=data_dir, load_ckpt_name="latest", serve_port=0,
    )
    corpus = read_news(f"{data_dir}/news.tsv", cfg, "train")
    rng = np.random.default_rng(0)
    table = rng.normal(0, 0.1, size=(len(corpus.word_dict) + 1,
                                     16)).astype(np.float32)
    model = get_model(cfg.model)
    state = create_train_state(
        cfg, model.init(jax.random.PRNGKey(0), cfg, table))
    save_checkpoint(cfg.model_dir, "epoch-1.ckpt", state, cfg,
                    category_dict=corpus.category_dict,
                    subcategory_dict=corpus.subcategory_dict,
                    word_dict=corpus.word_dict)

    srv = run_server(cfg, block=False)
    try:
        status, body = _get(srv, "/healthz")
        assert status == 200 and body["status"] == "ok"
        docs = list(read_news(f"{data_dir}/news.tsv", cfg,
                              "train").news_index)
        hist, cands = docs[:2], docs[2:6]
        status, body = _post(srv, "/score",
                             {"history": hist, "candidates": cands})
        assert status == 200 and len(body["scores"]) == 4
        before = body["scores"]

        # hot swap: newer checkpoint with different params; `latest`
        # re-resolves on /reload
        state2 = create_train_state(
            cfg, model.init(jax.random.PRNGKey(7), cfg, table))
        save_checkpoint(cfg.model_dir, "epoch-2.ckpt", state2, cfg,
                        category_dict=corpus.category_dict,
                        subcategory_dict=corpus.subcategory_dict,
                        word_dict=corpus.word_dict)
        status, body = _post(srv, "/reload", {})
        assert status == 200 and body["status"] == "reloaded"
        status, body = _post(srv, "/score",
                             {"history": hist, "candidates": cands})
        assert status == 200
        assert not np.allclose(body["scores"], before)
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_reload_without_rebuild_source(http_srv):
    status, body = _post(http_srv, "/reload", {})
    assert status == 501 and "rebuild" in body["error"]


def test_bf16_cache_preserves_ranking(rec):
    """serve_cache_dtype=bfloat16: scores agree to bf16 precision and the
    induced ranking matches the f32 cache on a spread-out candidate set."""
    rec16 = Recommender(rec.model, rec.params, rec.cfg, rec.news_index,
                        rec.news_scoring, cache_dtype="bfloat16")
    assert rec16.news_scoring.dtype.name == "bfloat16"
    hist = ["N1", "N5", "N9"]
    cands = [f"N{i}" for i in range(10, 40, 3)]
    s32 = rec.score(hist, cands)
    s16 = rec16.score(hist, cands)
    np.testing.assert_allclose(s16, s32, rtol=0.05, atol=0.05)
    assert rec16.rank(hist, cands) == rec.rank(hist, cands)


def test_http_bad_requests(http_srv):
    status, body = _post(http_srv, "/score", {"history": ["N1"]})
    assert status == 400 and "candidates" in body["error"]
    status, body = _post(http_srv, "/score",
                         {"history": "N1", "candidates": ["N2"]})
    assert status == 400
    # a JSON string for candidates must 400, not be iterated per-character
    status, body = _post(http_srv, "/score",
                         {"history": ["N1"], "candidates": "N10"})
    assert status == 400 and "list" in body["error"]
    status, body = _post(http_srv, "/nope", {})
    assert status == 404
    # over-bucket requests are rejected, never silently truncated
    status, body = _post(http_srv, "/score", {
        "history": ["N1"], "candidates": [f"N{i}" for i in range(500)]})
    assert status == 400 and "bucket" in body["error"]
    status, body = _post(http_srv, "/recommend",
                         {"history": ["N1"], "k": 4096})
    assert status == 400 and "bucket" in body["error"]
    status, body = _post(http_srv, "/recommend",
                         {"history": ["N1"], "k": 0})
    assert status == 400


def test_padded_cache_reuse_keeps_real_rows(rec):
    """Constructing a Recommender from an ALREADY bucket-padded cache (as
    the bf16/dense-scorer variants above do) must not inflate the real row
    count: corpus_size comes from news_index, and corpus-wide top-k still
    returns every real doc (pad rows never displace them)."""
    rec2 = Recommender(rec.model, rec.params, rec.cfg, rec.news_index,
                       rec.news_scoring)
    assert rec2.corpus_size == len(rec.news_index) == rec.corpus_size
    n = len(rec.news_index)
    ids, scores = rec2.recommend_batch([["N1"]], k=n)
    assert len(ids[0]) == n and len(set(ids[0])) == n


def test_reload_conflict_returns_409(http_srv):
    """While one reload is in flight, a second POST /reload is rejected
    with 409 instead of running a duplicate minutes-long rebuild."""
    http_srv.rebuild = lambda: (_ for _ in ()).throw(
        AssertionError("must not rebuild while lock is held"))
    try:
        assert http_srv.reload_lock.acquire(blocking=False)
        try:
            status, body = _post(http_srv, "/reload", {})
            assert status == 409 and "in flight" in body["error"]
        finally:
            http_srv.reload_lock.release()
    finally:
        http_srv.rebuild = None


def test_pipeline_depths_equivalent(rec):
    """pipeline_depth 0 (synchronous) and 2 (dispatch/complete overlap)
    must return identical results under concurrent mixed load."""
    outs = {}
    for depth in (0, 2):
        batcher = BatchingScorer(rec, max_batch=8, max_delay_ms=50,
                                 pipeline_depth=depth)
        try:
            n = 10
            results = [None] * n
            barrier = threading.Barrier(n)

            def worker(i, b=batcher, res=results, bar=barrier):
                bar.wait()
                if i % 3 == 2:
                    res[i] = b.recommend([f"N{1 + i}"], k=5)
                else:
                    res[i] = b.score([f"N{1 + i}"],
                                     [f"N{10 + i}", f"N{20 + i}"])

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            outs[depth] = results
        finally:
            batcher.close()
    # coalescing timing differs per depth, so requests may land in
    # different padded batch tiers whose executables round differently
    # (~1e-8 abs) — same tolerance as test_batching_matches_direct
    for a, b in zip(outs[0], outs[2]):
        if isinstance(a, tuple):
            assert a[0] == b[0]
            np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pipeline_close_with_inflight_batches(rec):
    """close() must deliver results for batches already dispatched to the
    completer (FIFO sentinel), not strand their callers."""
    batcher = BatchingScorer(rec, max_batch=4, max_delay_ms=1,
                             pipeline_depth=3)
    results = []
    threads = [threading.Thread(
        target=lambda i=i: results.append(
            batcher.score([f"N{1 + i}"], [f"N{10 + i}"])))
        for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()
    assert len(results) == 6
    assert all(np.isfinite(r).all() for r in results)
