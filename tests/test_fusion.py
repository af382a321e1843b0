"""RRF fusion vs a pure-Python reference."""

import pytest

from usgs_geomag_algorithms_spark.operators.fusion import rrf_fuse

SCALE = 10**9


def ref_rrf(lists, k_rrf, topk):
    score, votes = {}, {}
    for lst in lists:
        for doc, rank in lst:
            score[doc] = score.get(doc, 0) + SCALE // (k_rrf + rank)
            votes[doc] = votes.get(doc, 0) + 1
    order = sorted(score, key=lambda d: (-score[d], d))[:topk]
    return {
        d: (votes[d], score[d], i + 1) for i, d in enumerate(order)
    }


LEX = [(10, 1), (11, 2), (12, 3), (13, 4)]
SEM = [(12, 1), (10, 2), (14, 3)]
REC = [(14, 1), (15, 2), (10, 3)]


def _df(spark, lst):
    return spark.createDataFrame(lst, "doc_id long, rank long")


class TestRrf:
    def test_matches_reference(self, spark):
        got = {
            r.doc_id: (r.n_lists, r.rrf_score, r.rank)
            for r in rrf_fuse(
                [_df(spark, l) for l in (LEX, SEM, REC)], topk=10
            ).collect()
        }
        assert got == ref_rrf([LEX, SEM, REC], 60, 10)
        # doc 10 is in all three lists -> top fused rank
        assert got[10][0] == 3 and got[10][2] == 1

    def test_topk_truncates_deterministically(self, spark):
        got = rrf_fuse(
            [_df(spark, l) for l in (LEX, SEM)], topk=2
        ).collect()
        ref = ref_rrf([LEX, SEM], 60, 2)
        assert {(r.doc_id, r.rank) for r in got} == {
            (d, rk) for d, (_, _, rk) in ref.items()
        }

    def test_tie_breaks_to_smaller_id(self, spark):
        # two docs each appearing once at the same rank -> equal scores
        a = _df(spark, [(7, 1)])
        b = _df(spark, [(3, 1)])
        got = rrf_fuse([a, b], topk=2).collect()
        assert [(r.doc_id, r.rank) for r in got] == [(3, 1), (7, 2)]

    def test_single_list_is_identity_order(self, spark):
        got = rrf_fuse([_df(spark, LEX)], topk=4).collect()
        assert [(r.doc_id, r.rank) for r in got] == [
            (d, rk) for d, rk in LEX
        ]

    def test_rejects_bad_args(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([_df(spark, LEX)], k_rrf=-1)
