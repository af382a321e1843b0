"""As-of join vs a brute-force reference; boundary and payload-NULL rules."""

import random

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.asof import asof_join


def frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "k long, t_us long, lv double")
    r = spark.createDataFrame(right_rows, "k long, t_us long, rid long, rv double")
    return l, r


class TestAsofJoin:
    def test_matches_brute_force(self, spark):
        rng = random.Random(5)
        left_rows = [
            (k, rng.randrange(0, 1000), float(i))
            for i, k in enumerate(rng.choices(range(8), k=120))
        ]
        right_rows = [
            (k, rng.randrange(0, 1000), i, float(i) * 2)
            for i, k in enumerate(rng.choices(range(8), k=150))
        ]
        # dedup right per (k, t): keep max rid — same rule as tie_col
        best = {}
        for k, t, rid, rv in right_rows:
            if (k, t) not in best or rid > best[(k, t)][0]:
                best[(k, t)] = (rid, rv)

        l, r = frames(spark, left_rows, right_rows)
        out = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"],
            tie_col="rid",
        ).collect()
        assert len(out) == len(left_rows)
        for row in out:
            cands = [
                (t, rid, rv)
                for (k, t), (rid, rv) in best.items()
                if k == row.k and t <= row.t_us
            ]
            if not cands:
                assert row.rid_r is None and row.t_us_r is None
            else:
                t, rid, rv = max(cands)
                assert (row.t_us_r, row.rid_r, row.rv_r) == (t, rid, rv), row

    def test_equal_ts_is_visible(self, spark):
        l, r = frames(spark, [(1, 100, 0.0)], [(1, 100, 7, 9.9)])
        row = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"]
        ).collect()[0]
        assert row.rid_r == 7 and row.t_us_r == 100

    def test_no_earlier_right_row_gives_nulls(self, spark):
        l, r = frames(spark, [(1, 50, 0.0)], [(1, 100, 7, 9.9)])
        row = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"]
        ).collect()[0]
        assert row.rid_r is None and row.rv_r is None and row.t_us_r is None

    def test_null_payload_field_not_stitched(self, spark):
        # right row B (later) has rv=NULL; its rid must arrive with rv NULL,
        # NOT with the rv carried from the earlier row A
        r = spark.createDataFrame(
            [(1, 10, 1, 5.0), (1, 20, 2, None)],
            "k long, t_us long, rid long, rv double",
        )
        l = spark.createDataFrame([(1, 30, 0.0)], "k long, t_us long, lv double")
        row = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"]
        ).collect()[0]
        assert row.rid_r == 2 and row.rv_r is None and row.t_us_r == 20

    def test_keys_isolated(self, spark):
        l, r = frames(spark, [(1, 100, 0.0)], [(2, 50, 7, 9.9)])
        row = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"]
        ).collect()[0]
        assert row.rid_r is None

    def test_plan_single_shuffle_no_join(self, spark):
        # the union-and-carry plan must contain no join operator at all and
        # exactly one exchange (the window's key partitioning)
        rng = random.Random(6)
        l, r = frames(
            spark,
            [(k, rng.randrange(1000), 0.0) for k in range(20)],
            [(k, rng.randrange(1000), k, 1.0) for k in range(20)],
        )
        out = asof_join(
            l, r, on=["k"], ts_col="t_us", right_cols=["rid", "rv"],
            tie_col="rid",
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
