"""Bigram LM scoring (operators/lmscore.py): integer bit-surprisal vs a
pure-Python reference, true cross-entropy vs NumPy, unseen/OOV charging,
and the short-doc sequence guard."""

import math
from collections import Counter

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.operators.lmscore import (
    bigram_bits,
    bigram_cross_entropy,
    bigram_lm,
    bigrams,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran to the mat"),
    (2, "a dog sat on a log"),
]
SCORE = TRAIN + [
    (3, "the cat sat on a log"),  # all-seen contexts, one unseen pair
    (4, "zebra quark the cat"),  # OOV contexts + unseen pairs
    (5, "mat"),  # single word: no bigrams, no output row
]


def _ref_model(rows):
    c12 = Counter()
    for _, text in rows:
        w = text.split(" ")
        for i in range(len(w) - 1):
            c12[(w[i], w[i + 1])] += 1
    c1 = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    return c12, c1


def _bl(x):
    return int(x).bit_length() - 1


def _ref_bits(rows, c12, c1):
    total_bl = _bl(sum(c12.values()))
    out = {}
    for doc_id, text in rows:
        w = text.split(" ")
        if len(w) < 2:
            continue
        n = unseen = oov = bits = 0
        for i in range(len(w) - 1):
            pair = (w[i], w[i + 1])
            n += 1
            if pair in c12:
                bits += _bl(c1[pair[0]]) - _bl(c12[pair])
            elif pair[0] in c1:
                unseen += 1
                bits += _bl(c1[pair[0]])
            else:
                unseen += 1
                oov += 1
                bits += total_bl
        out[doc_id] = (n, unseen, oov, bits)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SCORE, "doc_id long, text string")


@pytest.fixture(scope="module")
def lm(spark, docs):
    from pyspark.sql import functions as F

    return bigram_lm(docs.where(F.col("doc_id") <= 2))


class TestBigramBits:
    def test_matches_reference(self, docs, lm):
        got = {
            r["doc_id"]: (
                r["n_bigrams"],
                r["n_unseen"],
                r["n_ctx_oov"],
                r["bits"],
            )
            for r in bigram_bits(docs, lm).collect()
        }
        c12, c1 = _ref_model(TRAIN)
        assert got == _ref_bits(SCORE, c12, c1)

    def test_avg_is_exact_division(self, docs, lm):
        for r in bigram_bits(docs, lm).collect():
            assert r["avg_bits"] == r["bits"] / r["n_bigrams"]

    def test_single_word_doc_emits_nothing(self, docs, lm):
        ids = {r["doc_id"] for r in bigram_bits(docs, lm).collect()}
        assert 5 not in ids and ids == {0, 1, 2, 3, 4}

    def test_training_docs_have_no_unseen(self, docs, lm):
        rows = {
            r["doc_id"]: r for r in bigram_bits(docs, lm).collect()
        }
        for d in (0, 1, 2):
            assert rows[d]["n_unseen"] == 0 and rows[d]["n_ctx_oov"] == 0
        assert rows[4]["n_ctx_oov"] >= 1  # zebra/quark contexts OOV

    def test_empty_lm_raises(self, spark, docs):
        from pyspark.sql import functions as F

        empty = bigram_lm(docs.where(F.lit(False)))
        with pytest.raises(ValueError, match="empty"):
            bigram_bits(docs, empty)


class TestCrossEntropy:
    def test_matches_numpy(self, docs, lm):
        c12, c1 = _ref_model(TRAIN)
        got = {
            r["doc_id"]: (r["n_seen"], r["cross_entropy"])
            for r in bigram_cross_entropy(docs, lm).collect()
        }
        for doc_id, text in SCORE:
            w = text.split(" ")
            costs = [
                math.log2(c1[w[i]]) - math.log2(c12[(w[i], w[i + 1])])
                for i in range(len(w) - 1)
                if (w[i], w[i + 1]) in c12
            ]
            if not costs:
                assert doc_id not in got
                continue
            n, h = got[doc_id]
            assert n == len(costs)
            np.testing.assert_allclose(h, np.mean(costs), rtol=1e-12)


class TestBigrams:
    def test_pairs_and_guard(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "x")], "doc_id long, text string"
        )
        rows = sorted(
            (r["doc_id"], r["w1"], r["w2"])
            for r in bigrams(df).collect()
        )
        assert rows == [(0, "a", "b"), (0, "b", "c")]
