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


class TestRrfMultiQuery:
    """query_col path: per-query keys everywhere so a batched fuse never
    funnels through one window partition (VERDICT r3 #4)."""

    def _q(self, spark, rows):
        return spark.createDataFrame(rows, "q string, doc_id long, rank long")

    def test_per_query_matches_single_query(self, spark):
        a = [("q1", 1, 1), ("q1", 2, 2), ("q2", 9, 1)]
        b = [("q1", 2, 1), ("q2", 8, 1), ("q2", 9, 2)]
        multi = rrf_fuse(
            [self._q(spark, a), self._q(spark, b)], topk=2, query_col="q"
        ).collect()
        by_q = {}
        for r in multi:
            by_q.setdefault(r.q, []).append((r.rank, r.doc_id, r.rrf_score))
        for q in ("q1", "q2"):
            single = rrf_fuse(
                [
                    self._q(spark, [x for x in a if x[0] == q]).drop("q"),
                    self._q(spark, [x for x in b if x[0] == q]).drop("q"),
                ],
                topk=2,
            ).collect()
            assert sorted(by_q[q]) == sorted(
                (r.rank, r.doc_id, r.rrf_score) for r in single
            )

    def test_topk_applies_per_query(self, spark):
        rows = [("q1", i, i) for i in range(1, 6)] + [("q2", 10 + i, i) for i in range(1, 4)]
        got = rrf_fuse([self._q(spark, rows)], topk=2, query_col="q").collect()
        counts = {}
        for r in got:
            counts[r.q] = counts.get(r.q, 0) + 1
        assert counts == {"q1": 2, "q2": 2}

    def test_window_is_partitioned_in_plan(self, spark):
        rows = [("q1", 1, 1), ("q2", 2, 1)]
        df = rrf_fuse([self._q(spark, rows)], query_col="q")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every Window node must carry the query-id partition spec
        win = [l for l in plan.splitlines() if "Window" in l]
        assert win and all("q#" in w for w in win)
