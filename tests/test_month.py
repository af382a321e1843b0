"""Calendar-month tier: variable-width boxcar semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.month import (
    DAY_STAMP_OFF_US,
    DAY_US,
    US,
    rollup_month,
)

JAN1 = 1704067200 * US  # 2024-01-01T00:00:00Z
FEB1 = 1706745600 * US  # 2024-02-01 (2024 is a leap year: 29 days)


def day_rows(month_start_us, values):
    """values[i] -> day-i sample at its 11:59:30 center stamp."""
    return [
        ("u", "H", month_start_us + i * DAY_US + DAY_STAMP_OFF_US, v)
        for i, v in enumerate(values)
    ]


def mk(spark, rows):
    return spark.createDataFrame(
        rows, "url string, channel string, t_us long, value double"
    )


class TestMonthRollup:
    def test_full_month_mean_and_stamp(self, spark):
        vals = [float(i) for i in range(31)]
        df = mk(spark, day_rows(JAN1, vals))
        out = rollup_month(
            df, JAN1, JAN1 + 31 * DAY_US, emit_coverage=True
        ).collect()
        assert len(out) == 1
        r = out[0]
        np.testing.assert_allclose(r.value, np.mean(vals))
        # stamp: Jan 16 11:29:30 = month_start + 43200*31 - 30 s
        assert r.t_us == JAN1 + (43_200 * 31 - 30) * US
        assert r.n_valid == 31 and r.weight_sum == 1.0

    def test_ten_percent_rule_boundary(self, spark):
        # 28/31 = 0.903 valid -> value; 27/31 = 0.871 -> NULL
        ok_vals = [1.0] * 28 + [None] * 3
        bad_vals = [1.0] * 27 + [None] * 4
        for vals, expect_value in ((ok_vals, True), (bad_vals, False)):
            df = mk(spark, day_rows(JAN1, vals))
            out = rollup_month(df, JAN1, JAN1 + 31 * DAY_US).collect()
            assert len(out) == 1
            assert (out[0].value is not None) == expect_value

    def test_absent_rows_equal_null_rows(self, spark):
        with_nulls = mk(spark, day_rows(JAN1, [1.0] * 28 + [None] * 3))
        absent = mk(spark, day_rows(JAN1, [1.0] * 28))
        a = rollup_month(with_nulls, JAN1, JAN1 + 31 * DAY_US).collect()
        b = rollup_month(absent, JAN1, JAN1 + 31 * DAY_US).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_leap_february(self, spark):
        vals = [2.0] * 29
        df = mk(spark, day_rows(FEB1, vals))
        out = rollup_month(df, FEB1, FEB1 + 29 * DAY_US, emit_coverage=True).collect()
        assert len(out) == 1
        r = out[0]
        assert r.value == 2.0 and r.n_valid == 29
        assert r.t_us == FEB1 + (43_200 * 29 - 30) * US
        # 26/29 = 0.897 -> NULL (the rule uses the month's true length)
        df2 = mk(spark, day_rows(FEB1, [2.0] * 26))
        out2 = rollup_month(df2, FEB1, FEB1 + 29 * DAY_US).collect()
        assert out2[0].value is None

    def test_window_must_fit_scan_range(self, spark):
        # range stops before Jan 31's day stamp -> January ineligible
        df = mk(spark, day_rows(JAN1, [1.0] * 31))
        out = rollup_month(df, JAN1, JAN1 + 30 * DAY_US).collect()
        assert out == []

    def test_multi_month_multi_series(self, spark):
        rows = day_rows(JAN1, [1.0] * 31) + day_rows(FEB1, [3.0] * 29)
        rows += [("v", "H", t, v * 10) for (_, _, t, v) in day_rows(JAN1, [1.0] * 31)]
        df = mk(spark, rows)
        out = rollup_month(df, JAN1, FEB1 + 29 * DAY_US).collect()
        got = {(r.url, r.value) for r in out}
        assert got == {("u", 1.0), ("u", 3.0), ("v", 10.0)}


class TestRefreshMonth:
    def _seed_day_tier(self, spark, store, months):
        rows = []
        for m0, vals in months:
            rows += [
                ("u", "H", t, v)
                for (_, _, t, v) in [
                    ("u", "H", m0 + i * DAY_US + DAY_STAMP_OFF_US, v)
                    for i, v in enumerate(vals)
                ]
            ]
        df = spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        )
        store.write(df, "day")

    def test_fills_missing_months_idempotently(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.refresh import refresh_month
        from usgs_geomag_algorithms_spark.sources.store import TierStore

        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        self._seed_day_tier(
            spark, store, [(JAN1, [1.0] * 31), (FEB1, [3.0] * 29)]
        )
        m = refresh_month(store, JAN1, FEB1 + 29 * DAY_US)
        assert m["gaps_filled"] == 2 and m["rows_written"] == 2
        got = {r.t_us: r.value for r in store.read("month").collect()}
        assert sorted(got.values()) == [1.0, 3.0]
        # second run: both stamps present -> nothing recomputed
        m2 = refresh_month(store, JAN1, FEB1 + 29 * DAY_US)
        assert m2["gaps_filled"] == 0 and m2["skipped"] == 2
        # lineage recorded for both runs
        assert len(store.read_lineage("month")) >= 2

    def test_force_recomputes(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.plans.refresh import refresh_month
        from usgs_geomag_algorithms_spark.sources.store import TierStore

        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        self._seed_day_tier(spark, store, [(JAN1, [1.0] * 31)])
        refresh_month(store, JAN1, JAN1 + 31 * DAY_US)
        # backfill changes the day tier; force recompute picks it up
        patch = spark.createDataFrame(
            [("u", "H", JAN1 + i * DAY_US + DAY_STAMP_OFF_US, 2.0) for i in range(31)],
            "url string, channel string, t_us long, value double",
        )
        store.upsert(patch, "day")
        m = refresh_month(store, JAN1, JAN1 + 31 * DAY_US, force=True)
        assert m["gaps_filled"] == 1
        got = [r.value for r in store.read("month").collect()]
        assert got == [2.0]


class TestMonthStampCol:
    def test_column_matches_scalar(self, spark):
        """month_stamp_col is the one Spark mirror of month_stamp_us."""
        from pyspark.sql import functions as F

        from usgs_geomag_algorithms_spark.operators.month import (
            month_stamp_col,
            month_stamp_us,
            months_in_range,
        )

        US = 1_000_000
        lo = 1577836800 * US  # 2020-01 (leap year)
        hi = lo + 400 * 86400 * US
        months = months_in_range(lo, hi)
        # an arbitrary in-month timestamp maps to that month's stamp
        rows = [(m0 + 5 * 86400 * US + 12345 * US, month_stamp_us(m0, nd))
                for m0, nd, _s in months]
        df = spark.createDataFrame(rows, "t_us long, want long")
        bad = (
            df.select("want", month_stamp_col(F.col("t_us")).alias("got"))
            .where(F.col("got") != F.col("want"))
            .count()
        )
        assert bad == 0
