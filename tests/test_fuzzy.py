"""Blocked Levenshtein fuzzy-match join."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.fuzzy import (
    blocked_levenshtein_pairs,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumped"),  # dist 2 from 1
        (3, "the quick brown cat naps"),    # dist vs 1: several edits
        (4, "a totally different string"),
        (5, "the quick brown fox jumps"),   # exact dup of 1 -> dist 0
        (6, "THE QUICK brown fox leaps"),   # case-folded by the key expr
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, max_dist, block_n=10):
    out = blocked_levenshtein_pairs(
        _docs(spark),
        key=F.lower(F.col("text")),
        block=F.lower(F.substring("text", 1, block_n)),
        max_dist=max_dist,
    )
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


class TestBlockedLevenshtein:
    def test_matches_and_distances(self, spark):
        got = _pairs(spark, max_dist=6)
        assert got[(1, 5)] == 0
        assert got[(1, 2)] == 2
        assert got[(2, 5)] == 2
        assert got[(1, 6)] == 3  # jumps -> leaps via case-folded key
        assert (1, 4) not in got  # different block
        # id ordering invariant
        assert all(a < b for a, b in got)

    def test_threshold_filters(self, spark):
        tight = _pairs(spark, max_dist=0)
        assert set(tight) == {(1, 5)}

    def test_blocking_recall_trade(self, spark):
        # doc 3 shares the 10-char block with 1/2/5/6 but is > 6 edits
        # from all of them at max_dist=6; raising the budget finds it
        got = _pairs(spark, max_dist=12)
        assert (1, 3) in got
        # a pair split across blocks is never compared, however close:
        rows = [(1, "aaaa hello world"), (2, "bbbb hello world")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = blocked_levenshtein_pairs(
            df,
            key=F.col("text"),
            block=F.substring("text", 1, 4),
            max_dist=15,
        )
        assert out.count() == 0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            blocked_levenshtein_pairs(
                _docs(spark), key=F.col("text"), block=F.col("text"),
                max_dist=-1,
            )
