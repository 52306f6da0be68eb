"""Execute the BERT title-embedding backend offline.

The real bert-base-uncased weights are network-gated in this environment
(docs/PARITY.md records the attempts), but the BACKEND CODE — tokenizer
round trip, last-4-hidden-layer sum, [CLS]/[SEP] stripping, truncation/
padding, table persistence (reference preprocess.py:80-103, 170-225) —
is model-size-independent. These tests build a tiny randomly-initialized
BERT locally (config-constructed, save_pretrained to disk, loaded via
NEWSREC_BERT_MODEL) so the path runs end-to-end with zero network.
"""

import gzip
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from newsrecommendation_tpu.data.embeddings import (  # noqa: E402
    create_news_embeddings,
    read_news_embeddings,
)

HIDDEN = 16
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "news", "story", "about", "cats", "dogs", "sports",
         "team", "wins", "big", "game", "a", "##s", "##ing"]


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinybert")
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    tok = transformers.BertTokenizerFast(vocab_file=str(vocab_file),
                                         do_lower_case=True)
    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=HIDDEN, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32)
    model = transformers.BertModel(cfg)
    tok.save_pretrained(str(d))
    model.save_pretrained(str(d))
    return str(d)


@pytest.fixture()
def corpus_dir(tmp_path):
    lines = [
        "N1\tsports\tfootball\tthe team wins big game\t\t\t\t",
        "N2\tnews\tpets\ta story about cats\t\t\t\t",
        "N3\tnews\tpets\tdogs\t\t\t\t",
        "N4\tnews\tempty\t\t\t\t\t",  # empty title -> zero rows
    ]
    (tmp_path / "news.tsv").write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_bert_backend_end_to_end(tiny_bert_dir, corpus_dir, monkeypatch):
    monkeypatch.setenv("NEWSREC_BERT_MODEL", tiny_bert_dir)
    t = 6
    table = create_news_embeddings(corpus_dir, t, dim=HIDDEN, backend="bert")
    assert table.shape == (5, t * HIDDEN)
    assert np.all(table[0] == 0.0)          # unknown-news row
    assert np.all(table[4] == 0.0)          # empty title -> zero row
    assert np.any(table[1] != 0.0) and np.any(table[2] != 0.0)
    # persisted artifact round-trips through the loader
    loaded = read_news_embeddings(corpus_dir, backend="bert")
    np.testing.assert_array_equal(loaded, table)


def test_bert_last4_sum_and_special_token_strip(tiny_bert_dir, monkeypatch):
    """The embedder must equal a direct transformers computation: sum of
    the last 4 hidden states with [CLS]/[SEP] removed
    (reference preprocess.py:80-103)."""
    from newsrecommendation_tpu.data.embeddings import make_embedder

    monkeypatch.setenv("NEWSREC_BERT_MODEL", tiny_bert_dir)
    emb = make_embedder("bert", HIDDEN)
    title = "the team wins"
    got = emb.embed(title)

    enc = emb.tokenizer.encode_plus(title, return_tensors="pt")
    with torch.no_grad():
        out = emb.model(**enc)
    want = sum(out.hidden_states[i] for i in (-4, -3, -2, -1)).squeeze(0)
    want = want[1:-1].numpy()               # strip [CLS]/[SEP]
    assert got.shape == (3, HIDDEN)         # 3 real tokens
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bert_truncation_pads_like_reference(tiny_bert_dir, corpus_dir,
                                             monkeypatch):
    """num_tokens_title shorter than the title: truncate then flatten
    (preprocess.py:146-148,156)."""
    monkeypatch.setenv("NEWSREC_BERT_MODEL", tiny_bert_dir)
    t2 = 2
    table = create_news_embeddings(corpus_dir, t2, dim=HIDDEN,
                                   backend="bert")
    assert table.shape == (5, t2 * HIDDEN)
    # "dogs" has 1 token -> second slot zero-padded
    row3 = table[3].reshape(t2, HIDDEN)
    assert np.any(row3[0] != 0.0) and np.all(row3[1] == 0.0)
