"""End-to-end acceptance: training lifts ranking metrics well above chance
on the synthetic corpus — the analogue of the reference's metric-based
validation on MIND-dev (SURVEY.md §4, BASELINE.json config 1)."""

import os
import tempfile

import pytest

from newsrecommendation_tpu.cli import main, run_test, run_train
from newsrecommendation_tpu.config import Config
from newsrecommendation_tpu.data.synthetic import generate_corpus
from newsrecommendation_tpu.data.embeddings import create_news_embeddings


def _dims(**kw):
    base = dict(
        num_words_title=8, user_log_length=10, word_embedding_dim=32,
        news_dim=32, num_attention_heads=4, news_query_vector_dim=16,
        user_query_vector_dim=16, category_emb_dim=8, batch_size=8,
        lr=3e-3, filter_num=0, log_steps=1000, eval_batch_size=16,
        max_candidates=16, npratio=4,
    )
    base.update(kw)
    return base


@pytest.fixture(scope="module")
def corpus_dirs():
    tmp = tempfile.mkdtemp()
    train, dev = os.path.join(tmp, "train"), os.path.join(tmp, "dev")
    generate_corpus(train, num_news=120, num_users=40, num_impressions=600,
                    seed=1)
    generate_corpus(dev, num_news=120, num_users=40, num_impressions=150,
                    seed=2)
    return train, dev


@pytest.mark.slow
def test_nrms_word_ids_beats_chance(corpus_dirs, tmp_path):
    train, dev = corpus_dirs
    cfg = Config(model="NRMS", title_source="word_ids", epochs=8,
                 train_data_dir=train, test_data_dir=dev,
                 model_dir=str(tmp_path), **_dims())
    state, vocabs, stats = run_train(cfg)
    assert stats["final_acc"] > 0.4  # chance = 0.2 for 1+4 slots
    results = run_test(cfg, state=state, vocabs=vocabs)
    assert results["auc"] > 0.60, results
    assert results["ndcg10"] > 0.60, results


@pytest.mark.slow
def test_naml_doc_table_multiview_beats_chance(corpus_dirs, tmp_path):
    train, dev = corpus_dirs
    create_news_embeddings(train, 8, dim=32, backend="hash")
    create_news_embeddings(dev, 8, dim=32, backend="hash")
    cfg = Config(model="NAML", title_source="doc_table", epochs=6,
                 use_category=True, use_subcategory=True,
                 freeze_embedding=True,
                 train_data_dir=train, test_data_dir=dev,
                 model_dir=str(tmp_path), **_dims())
    state, vocabs, stats = run_train(cfg)
    results = run_test(cfg, state=state, vocabs=vocabs)
    assert results["auc"] > 0.62, results


@pytest.mark.slow
def test_bf16_matches_f32_quality(corpus_dirs, tmp_path):
    train, dev = corpus_dirs
    cfg = Config(model="NRMS", title_source="word_ids", epochs=6,
                 compute_dtype="bfloat16",
                 train_data_dir=train, test_data_dir=dev,
                 model_dir=str(tmp_path), **_dims())
    state, vocabs, _ = run_train(cfg)
    results = run_test(cfg, state=state, vocabs=vocabs)
    assert results["auc"] > 0.58, results
