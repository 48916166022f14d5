"""Pin the vectorized trigram tokenizer (index/build._trigram_rows)
against the regex reference path it replaced on the positionless
trigram fields: same (doc, term, tf, dl) rows for adversarial inputs
— newlines/carriage returns (Python's ``.`` excludes only LF), astral
code points (UTF-32 windows, not UTF-16 units), case-fold expansions
('İ'.lower() is two code points, and two raw trigrams that lower to
the same string must merge their tf), and empty/short documents."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from codeindex_spark.index.build import (
    TRIGRAM_RE,
    _doc_term_rows,
    _trigram_rows,
)


def _rows(gen):
    out = []
    for pdf in gen:
        for r in pdf.itertuples(index=False):
            out.append((r.doc_id, r.field, r.term, int(r.tf), int(r.dl)))
    return sorted(out)


CASES = [
    "", "a", "ab", "abc", "a\nb", "ab\ncd", "\n\n\n", "abc\rdef",
    "İİİabc", "\U0001F600\U0001F600\U0001F600x", "  a  b  ",
    "aaaa", "ab" * 10, "x\x0by\fz",
]


def _random_cases(n=200, seed=42):
    rng = random.Random(seed)
    chars = list("abcdefg \n\r\t\x0b") + ["\U0001F600", "É", "ß", "İ", "Ω"]
    return ["".join(rng.choice(chars) for _ in range(rng.randint(0, 40)))
            for _ in range(n)]


def test_trigram_rows_matches_regex_reference():
    cases = CASES + _random_cases()
    for pre_lower in (True, False):
        for start in range(0, len(cases), 7):
            batch = cases[start:start + 7]
            ids = np.arange(start, start + len(batch), dtype=np.int64)
            texts = pd.Series(batch)
            if pre_lower:
                texts = texts.str.lower()
            ref = _rows(_doc_term_rows(
                ids, texts, None, "content_trigram",
                regex=TRIGRAM_RE, emit_positions=False))
            got = _rows(_trigram_rows(ids, texts, "content_trigram"))
            assert got == ref, (start, pre_lower)


def test_trigram_rows_null_and_empty_batch():
    ids = np.array([1, 2], dtype=np.int64)
    texts = pd.Series([None, "ab"])  # fillna + too-short: no rows
    assert _rows(_trigram_rows(ids, texts, "content_trigram")) == []
