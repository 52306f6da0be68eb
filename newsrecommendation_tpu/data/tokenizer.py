"""NLTK-faithful Treebank word tokenizer (dependency-free).

The upstream pipeline the README numbers were produced with tokenizes
titles as ``word_tokenize(title.lower())`` (reference preprocess.py:29-30,
commented in the fork; nltk listed in env.yaml:1-51). Vocabulary identity —
and therefore real-MIND accuracy parity — depends on reproducing that
tokenization, but nltk is not in this image. This module re-implements the
TreebankWordTokenizer rule set of the nltk generation the reference's env
pins (the 2020/2021-era 3.4-3.6 rules: no unicode-quote or ``*`` handling,
``...`` not ``\\.{2,}``), verified two ways: against recorded nltk 3.5
word_tokenize goldens (tests/test_data.py::TestTreebankTokenizer) and by a
live fuzz against the installed nltk's TreebankWordTokenizer
(tests/test_tokenizer_nltk_live.py — nltk 3.10 IS importable in this
image; only word_tokenize's Punkt sentence-model data is unavailable).
The fuzz also documents the two known 3.5->3.10 rule drifts we
deliberately do NOT follow (``more'n`` contraction, unconditional
literal-``''`` split) because vocab parity targets the reference's era.

One deliberate delta: nltk's word_tokenize first splits sentences with the
statistical Punkt model, then Treebank-tokenizes each sentence. News titles
are single sentences essentially always (and are lowercased first, which
suppresses Punkt's capital-letter boundary cue), so this applies Treebank
to the whole title. The visible effect is only on the rare multi-sentence
title: an inner sentence-final period stays attached to its word instead of
splitting.
"""

from __future__ import annotations

import re
from typing import List

# Rule set of nltk.tokenize.TreebankWordTokenizer (3.4-3.6), applied in the
# same order as its tokenize() method.

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"`` "),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # sentence-final period (kept attached elsewhere: abbreviations)
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")

_DOUBLE_DASHES = (re.compile(r"--"), r" -- ")

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS2 = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]

_CONTRACTIONS3 = [
    re.compile(r"(?i) ('t)(?#X)(is)\b"),
    re.compile(r"(?i) ('t)(?#X)(was)\b"),
]


def treebank_word_tokenize(text: str) -> List[str]:
    """nltk TreebankWordTokenizer.tokenize(), rule-for-rule."""
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)

    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)

    regexp, substitution = _PARENS_BRACKETS
    text = regexp.sub(substitution, text)

    regexp, substitution = _DOUBLE_DASHES
    text = regexp.sub(substitution, text)

    text = " " + text + " "

    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)

    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)

    return text.split()
