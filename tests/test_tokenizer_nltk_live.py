"""Live cross-check of the vendored Treebank tokenizer against installed nltk.

The vendored tokenizer (data/tokenizer.py) reimplements the 3.4-3.6-era
TreebankWordTokenizer rules the reference's 2020/2021 env would have used
(env.yaml pins nltk; preprocess.py:29-30 tokenizes titles with
word_tokenize). nltk 3.10 IS importable in this image — only
word_tokenize's Punkt sentence-splitter data is absent — so the rule engine
can be fuzz-checked live instead of relying solely on recorded goldens
(VERDICT r3 task 7).

Known 3.5 -> 3.10 rule drift (deliberate: we match the REFERENCE era):
  - ``more'n``: old CONTRACTIONS2 has ``\\b(mor)('n)\\b`` (matches only
    "mor'n"), 3.10 has ``\\b(more)('n)\\b`` -> 3.10 splits "more'n" into
    ``more`` + ``'n`` while the old rules (and we) keep it whole.
  - ENDING_QUOTES gained a leading unconditional ``('')`` -> `` '' `` rule
    in 3.7+; the old ``(\\S)('')`` rule we carry only splits a LITERAL
    ``''`` off a preceding non-space, so inputs containing a literal ``''``
    sequence (not produced from ``"``) can tokenize differently. Real
    titles write double quotes as ``"`` — which both engines convert
    identically (fuzz-verified below) — so the drift is confined to
    already-tokenized-style input.
"""

import random

import pytest

nltk = pytest.importorskip("nltk")

from newsrecommendation_tpu.data.tokenizer import treebank_word_tokenize  # noqa: E402

# punctuation-rich vocabulary exercising every rule family: quotes,
# contractions, currency, percent, parens, ellipses, abbreviations,
# commas/colons with and without digits, double dashes
VOCAB = [
    "the", "market's", "u.s.", "said", "can't", "won't", "stocks,", "rise:",
    "fall", "(live)", "update...", "#1", "$5", "q&a", "it's", "dr.", "vs.",
    "50%", "--", '"quote"', "'single'", "end.", "mr.", "don't", "gonna",
    "cannot", "'tis", "gimme", "hello;", "[x]", "<b>", "a-b", "co-op",
    "3.5", "1,000", "they'll", "we're", "i've", "he'd", "i'm", "wanna",
    "gotta", "lemme", "d'ye", "'twas", "y'all", "o'clock", "?", "!",
]
# 3.5-vs-3.10 drift cases excluded from the equality fuzz (see module doc)
DRIFT_MARKERS = ("more'n", "mor'n", "''")


def _nltk_tokenizer():
    return nltk.tokenize.TreebankWordTokenizer()


def test_fuzz_matches_live_nltk_treebank():
    t = _nltk_tokenizer()
    rng = random.Random(1234)
    checked = 0
    for _ in range(8000):
        title = " ".join(
            rng.choice(VOCAB) for _ in range(rng.randint(1, 12))).lower()
        if any(m in title for m in DRIFT_MARKERS):
            continue
        assert treebank_word_tokenize(title) == t.tokenize(title), repr(title)
        checked += 1
    assert checked > 7000


def test_fuzz_random_ascii_matches_live_nltk():
    """Character-level soup — catches rule-order bugs the word fuzz misses."""
    t = _nltk_tokenizer()
    rng = random.Random(99)
    alphabet = "abc .',\"!?;:$%&#()[]<>-123"
    checked = 0
    for _ in range(4000):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 40))).lower()
        if any(m in s for m in DRIFT_MARKERS):
            continue
        assert treebank_word_tokenize(s) == t.tokenize(s), repr(s)
        checked += 1
    assert checked > 3900


def test_known_era_drift_more_n():
    """We intentionally keep the 3.4-3.6 behavior the reference era had."""
    ours = treebank_word_tokenize("more'n a feeling")
    theirs = _nltk_tokenizer().tokenize("more'n a feeling")
    assert ours == ["more'n", "a", "feeling"]
    assert theirs == ["more", "'n", "a", "feeling"]  # 3.10 rule change
    # the spelling the OLD rule targeted still splits identically
    assert treebank_word_tokenize("mor'n") == ["mor", "'n"]


def test_corpus_titles_match_live_nltk(synthetic_dirs):
    """Every title the synthetic corpus generator emits tokenizes
    identically under both engines (lowercased, as preprocess.py:29-30)."""
    import os

    t = _nltk_tokenizer()
    train_dir, _ = synthetic_dirs
    with open(os.path.join(train_dir, "news.tsv"), encoding="utf-8") as f:
        for line in f:
            title = line.split("\t")[3].lower()
            assert treebank_word_tokenize(title) == t.tokenize(title)
