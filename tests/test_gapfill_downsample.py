"""Gap-fill (LOCF / linear), counter-increase, LTOB downsample, and
histogram tier — hand-computed fixtures plus NumPy cross-checks."""

import numpy as np

from usgs_geomag_algorithms_spark.operators.counters import counter_increase
from usgs_geomag_algorithms_spark.operators.downsample import ltob_downsample
from usgs_geomag_algorithms_spark.operators.gapfill import gapfill
from usgs_geomag_algorithms_spark.operators.rollup import histogram_rollup

M = 60_000_000  # one minute in us


def sig_df(spark, slots_vals, series="a"):
    return spark.createDataFrame(
        [(series, int(s) * M, int(v)) for s, v in slots_vals],
        "series string, t_us long, v long",
    )


class TestGapfill:
    def test_locf_and_linear(self, spark):
        # slots 0,1,4,5 observed; 2,3 are gaps
        out = {
            r.t_us // M: r
            for r in gapfill(
                sig_df(spark, [(0, 10), (1, 20), (4, 50), (5, 40)]), M
            ).collect()
        }
        assert sorted(out) == [0, 1, 2, 3, 4, 5]
        # observed slots keep v, locf == v, age 0, interp == v
        for s, v in [(0, 10), (1, 20), (4, 50), (5, 40)]:
            r = out[s]
            assert (r.v, r.v_locf, r.locf_age, r.v_interp) == (v, v, 0, float(v))
        # gap slots: LOCF carries 20; linear walks 20 -> 50 over 3 slots
        assert (out[2].v, out[2].v_locf, out[2].locf_age) == (None, 20, 1)
        assert (out[3].v_locf, out[3].locf_age) == (20, 2)
        assert out[2].v_interp == 30.0
        assert out[3].v_interp == 40.0

    def test_exact_rational_division(self, spark):
        # gap of 3 slots between 0 and 1: interp = k/3 — the division
        # must be the single correctly-rounded double, not a rounded one
        out = {
            r.t_us // M: r.v_interp
            for r in gapfill(sig_df(spark, [(0, 0), (3, 1)]), M).collect()
        }
        assert out[1] == 1.0 / 3.0
        assert out[2] == 2.0 / 3.0

    def test_multi_series_spans(self, spark):
        df = sig_df(spark, [(0, 1), (2, 3)], "a").union(
            sig_df(spark, [(5, 7)], "b")
        )
        rows = gapfill(df, M).collect()
        by = {(r.series, r.t_us // M): r for r in rows}
        # series spines are bounded by each series' own span
        assert {k for k in by} == {("a", 0), ("a", 1), ("a", 2), ("b", 5)}
        assert by[("a", 1)].v_interp == 2.0
        assert by[("b", 5)].locf_age == 0

    def test_matches_numpy_interp(self, spark):
        rng = np.random.default_rng(7)
        slots = np.sort(rng.choice(200, size=40, replace=False))
        vals = rng.integers(0, 1000, size=40)
        out = gapfill(sig_df(spark, list(zip(slots, vals))), M).collect()
        dense_slots = np.arange(slots[0], slots[-1] + 1)
        expect = np.interp(dense_slots, slots, vals.astype(float))
        got = {r.t_us // M: r.v_interp for r in out}
        assert len(got) == len(dense_slots)
        for s, e in zip(dense_slots, expect):
            assert abs(got[int(s)] - e) < 1e-9


class TestCounterIncrease:
    def rows(self, spark, samples):
        df = spark.createDataFrame(
            [("a", t, c) for t, c in samples],
            "series string, t_us long, counter long",
        )
        return {
            r.t_us: r
            for r in counter_increase(df, 10 * M, counter_col="counter").collect()
        }

    def test_plain_increase(self, spark):
        out = self.rows(spark, [(0, 100), (M, 150), (2 * M, 175)])
        r = out[0]
        assert (r.increase, r.n_samples, r.n_resets) == (75, 2, 0)

    def test_reset_credits_current_reading(self, spark):
        # 100 -> 150 -> reset -> 30: increase = 50 + 30 (PromQL convention)
        out = self.rows(spark, [(0, 100), (M, 150), (2 * M, 30)])
        r = out[0]
        assert (r.increase, r.n_samples, r.n_resets) == (80, 2, 1)

    def test_first_sample_has_no_baseline(self, spark):
        out = self.rows(spark, [(0, 999)])
        r = out[0]
        assert (r.increase, r.n_samples, r.n_resets) == (0, 0, 0)

    def test_bucket_split(self, spark):
        # samples straddling two 10-minute buckets; the delta into the
        # second bucket is credited to the bucket OF that sample
        out = self.rows(
            spark, [(0, 0), (9 * M, 90), (11 * M, 110), (19 * M, 150)]
        )
        assert out[0].increase == 90
        assert out[10 * M].increase == 60  # (110-90) + (150-110)


class TestLtob:
    def test_picks_largest_triangle(self, spark):
        # flat run with one spike at slot 3: the spike wins its bucket
        vals = [(0, 10), (1, 10), (2, 10), (3, 90), (4, 10), (5, 10)]
        out = {
            r.t_us: r
            for r in ltob_downsample(sig_df(spark, vals), 6 * M).collect()
        }
        assert out[0].pt_us == 3 * M and out[0].v == 90

    def test_endpoints_survive_lonely_buckets(self, spark):
        # each point alone in its bucket: endpoints have area -1 but emit
        vals = [(0, 5), (10, 6), (20, 7)]
        out = ltob_downsample(sig_df(spark, vals), 10 * M).collect()
        assert sorted(r.v for r in out) == [5, 6, 7]
        assert {r.tri_area2 for r in out if r.pt_us in (0, 20 * M)} == {-1}

    def test_area_matches_numpy(self, spark):
        rng = np.random.default_rng(3)
        vals = [(i, int(v)) for i, v in enumerate(rng.integers(0, 100, 30))]
        out = ltob_downsample(sig_df(spark, vals), 10 * M).collect()
        t = np.array([s * M for s, _ in vals], dtype=np.int64)
        v = np.array([x for _, x in vals], dtype=np.int64)
        area = np.full(len(v), -1, dtype=np.int64)
        for i in range(1, len(v) - 1):
            area[i] = abs(
                (t[i - 1] - t[i + 1]) * (v[i] - v[i - 1])
                - (t[i - 1] - t[i]) * (v[i + 1] - v[i - 1])
            )
        for bucket in (0, 10 * M, 20 * M):
            idx = [i for i in range(len(v)) if t[i] // (10 * M) * (10 * M) == bucket]
            best = max(idx, key=lambda i: (area[i], -t[i]))
            got = next(r for r in out if r.t_us == bucket)
            assert (got.pt_us, got.v, got.tri_area2) == (
                int(t[best]), int(v[best]), int(area[best])
            )


class TestHistogramRollup:
    def test_bins_and_clamping(self, spark):
        df = spark.createDataFrame(
            [("a", 0, -5.0), ("a", M, 0.5), ("a", 2 * M, 3.0),
             ("a", 3 * M, 3.9), ("a", 4 * M, 99.0)],
            "series string, t_us long, value double",
        )
        out = {
            (r.t_us, r.bin): r.n
            for r in histogram_rollup(df, 3600 * 1_000_000, 2.0, 4).collect()
        }
        # -5 clamps to bin 0; 0.5 -> bin 0; 3.0, 3.9 -> bin 1; 99 -> overflow 3
        assert out == {(0, 0): 2, (0, 1): 2, (0, 3): 1}

    def test_counts_merge_across_tiers(self, spark):
        # hour histograms summed == day histogram (mergeability)
        rng = np.random.default_rng(5)
        rows = [
            ("a", int(i) * M, float(v))
            for i, v in enumerate(rng.integers(0, 16, 300))
        ]
        df = spark.createDataFrame(rows, "series string, t_us long, value double")
        H, D = 3600 * 1_000_000, 86400 * 1_000_000
        hour = histogram_rollup(df, H, 2.0, 8)
        day = histogram_rollup(df, D, 2.0, 8)
        from pyspark.sql import functions as F

        re_day = (
            hour.groupBy(
                "series", F.expr(f"(t_us div {D}) * {D}").alias("t_us"), "bin"
            )
            .agg(F.sum("n").alias("n"))
        )
        assert sorted(map(tuple, re_day.collect())) == sorted(
            map(tuple, day.collect())
        )
        # and the operator form of the same merge
        from usgs_geomag_algorithms_spark.operators.rollup import (
            histogram_merge,
        )

        assert sorted(map(tuple, histogram_merge(hour, D).collect())) == sorted(
            map(tuple, day.collect())
        )


class TestHistogramQuantile:
    def _hist(self, spark, values, width=2.0, n_bins=8):
        from usgs_geomag_algorithms_spark.operators.rollup import (
            histogram_rollup,
        )

        df = spark.createDataFrame(
            [("a", int(i) * M, float(v)) for i, v in enumerate(values)],
            "series string, t_us long, value double",
        )
        # one window spanning every sample (minutes 0..len-1)
        return histogram_rollup(df, 86400 * M, width, n_bins)

    def test_matches_reference(self, spark):
        import math

        from usgs_geomag_algorithms_spark.operators.rollup import (
            histogram_quantile,
        )

        rng = np.random.default_rng(3)
        values = [int(v) for v in rng.integers(0, 16, 500)]
        width, n_bins = 2.0, 8
        for q_num, q_den in ((1, 2), (19, 20), (1, 100), (1, 1)):
            got = histogram_quantile(
                self._hist(spark, values, width, n_bins), q_num, q_den, width
            ).collect()
            assert len(got) == 1
            r = got[0]
            bins = sorted(min(int(v // width), n_bins - 1) for v in values)
            thr = math.ceil(q_num * len(bins) / q_den)
            exp_bin = bins[thr - 1]
            assert r.bin == exp_bin and r.total == len(values)
            assert (r.value_lo, r.value_hi) == (
                exp_bin * width, (exp_bin + 1) * width,
            )

    def test_sparse_bins_and_series_isolation(self, spark):
        from usgs_geomag_algorithms_spark.operators.rollup import (
            histogram_quantile,
            histogram_rollup,
        )

        rows = [("a", 0, 0.0)] * 9 + [("a", M, 15.0)] + [("b", 0, 15.0)]
        df = spark.createDataFrame(
            [(s, t + i, v) for i, (s, t, v) in enumerate(rows)],
            "series string, t_us long, value double",
        )
        hist = histogram_rollup(df, 3600 * M, 2.0, 8)
        p90 = {
            r.series: r.bin
            for r in histogram_quantile(hist, 9, 10, 2.0).collect()
        }
        # series a: 10 samples, ceil(0.9*10)=9 -> bin 0; b: 1 sample bin 7
        assert p90 == {"a": 0, "b": 7}

    def test_rejects_bad_fraction(self, spark):
        import pytest

        from usgs_geomag_algorithms_spark.operators.rollup import (
            histogram_quantile,
        )

        hist = self._hist(spark, [1, 2, 3])
        for num, den in ((0, 10), (11, 10), (-1, 2)):
            with pytest.raises(ValueError):
                histogram_quantile(hist, num, den, 2.0)
