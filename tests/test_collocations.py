"""Collocation PMI-lift and Flesch readability vs pure-Python references."""

import re
from collections import Counter

from usgs_geomag_algorithms_spark.operators.textops import (
    collocations,
    readability,
)

DOCS = [
    (0, "new york is a big city"),
    (1, "new york new york so nice they named it twice"),
    (2, "the city of new york is big"),
    (3, "a big dog and a big cat"),
    (4, "x"),  # single word: no bigrams
    (5, "new york"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def ref_collocations(docs, min_count):
    pairs = Counter()
    for _, t in docs:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
    n = sum(pairs.values())
    left, right = Counter(), Counter()
    for (a, b), c in pairs.items():
        left[a] += c
        right[b] += c
    return {
        (a, b): (c, left[a], right[b], n, (c * n) / (left[a] * right[b]))
        for (a, b), c in pairs.items()
        if c >= min_count
    }


class TestCollocations:
    def test_matches_reference(self, spark):
        got = {
            (r.w1, r.w2): (r.c_xy, r.c_x, r.c_y, r.n_pairs, r.lift)
            for r in collocations(docs_df(spark), min_count=2).collect()
        }
        assert got == ref_collocations(DOCS, 2)
        assert ("new", "york") in got
        # "new york" is a genuine collocation: every 'new' is followed by
        # 'york', so lift = N / c_y — far above independence
        c, cx, cy, n, lift = got[("new", "york")]
        assert c == cx == cy and lift == n / c

    def test_min_count_filters(self, spark):
        # counts: ("new","york") = 5, ("a","big") = 3, everything else < 3
        got = collocations(docs_df(spark), min_count=4).collect()
        assert {(r.w1, r.w2) for r in got} == {("new", "york")}


def ref_readability(text):
    n_words = len(re.findall(r"[^ ]+", text))
    n_sents = max(1, len(re.findall(r"[.!?]+", text)))
    vg = len(re.findall(r"[aeiouyAEIOUY]+", text))
    vw = len(re.findall(r"(?:^| )[^ ]*[aeiouyAEIOUY][^ ]*", text))
    n_syll = vg + (n_words - vw)
    if n_words == 0:
        return n_words, n_sents, n_syll, None
    score = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words)
    return n_words, n_sents, n_syll, score


class TestReadability:
    TEXTS = [
        (0, "The cat sat on the mat. It was happy!"),
        (1, "Incomprehensibility characterizes bureaucratic documentation."),
        (2, "brr psst hmm"),  # no vowels: 1 syllable per word
        (3, ""),
        (4, "one two three? four five."),
    ]

    def test_matches_reference(self, spark):
        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch)
            for r in readability(df).collect()
        }
        for doc_id, text in self.TEXTS:
            assert got[doc_id] == ref_readability(text), (doc_id, text)

    def test_ordering_simple_beats_complex(self, spark):
        df = spark.createDataFrame(self.TEXTS, "doc_id long, text string")
        got = {r.doc_id: r.flesch for r in readability(df).collect()}
        assert got[0] > got[1]
        assert got[3] is None
