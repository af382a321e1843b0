"""TF-IDF keyword extraction vs a pure-Python reference."""

import math
from collections import Counter

from usgs_geomag_algorithms_spark.operators.textops import tfidf_keywords

DOCS = [
    (0, "spark spark spark join window"),
    (1, "join join window filter"),
    (2, "window filter filter duck duck duck"),
    (3, "unique solitary singleton"),
]


def ref_tfidf(docs, top_n):
    tf = {d: Counter(t.split(" ")) for d, t in docs}
    df = Counter(w for c in tf.values() for w in c)
    n = len([d for d, c in tf.items() if c])
    out = {}
    for d, c in tf.items():
        scored = [
            (w, c[w], df[w], round(c[w] * math.log(1.0 + n / df[w]), 4))
            for w in c
        ]
        scored.sort(key=lambda r: (-r[3], r[0]))
        out[d] = [
            (w, t, dfw, s, i + 1)
            for i, (w, t, dfw, s) in enumerate(scored[:top_n])
        ]
    return out


class TestTfidfKeywords:
    def test_matches_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {}
        for r in tfidf_keywords(df, top_n=2).collect():
            got.setdefault(r.doc_id, []).append(
                (r.word, r.tf, r.df_t, r.score, r.rank)
            )
        for d in got:
            got[d].sort(key=lambda x: x[4])
        assert got == ref_tfidf(DOCS, 2)

    def test_rare_term_beats_common(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        top1 = {
            r.doc_id: r.word
            for r in tfidf_keywords(df, top_n=1).collect()
        }
        # doc 2: "duck" is rare (df=1) and frequent (tf=3) -> keyword;
        # doc 0: repeated "spark" (df=1, tf=3) dominates shared terms
        assert top1[2] == "duck" and top1[0] == "spark"

    def test_tie_breaks_alphabetically(self, spark):
        df = spark.createDataFrame(
            [(0, "beta alpha"), (1, "gamma")], "doc_id long, text string"
        )
        rows = sorted(
            (r.rank, r.word)
            for r in tfidf_keywords(df, top_n=2).collect()
            if r.doc_id == 0
        )
        # equal tf and df -> equal score -> alphabetical rank order
        assert rows == [(1, "alpha"), (2, "beta")]
