"""Rolling z-score anomaly detection vs a NumPy reference."""

import numpy as np

from usgs_geomag_algorithms_spark.operators.anomaly import rolling_zscore


def sig_df(spark, vals, series="a"):
    return spark.createDataFrame(
        [(series, i * 60_000_000, int(v)) for i, v in enumerate(vals)],
        "series string, t_us long, v long",
    )


class TestRollingZscore:
    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(4)
        vals = rng.poisson(50, 200)
        out = {
            r.t_us // 60_000_000: (r.z, r.n_trail)
            for r in rolling_zscore(
                sig_df(spark, vals), window=60, min_points=30
            ).collect()
        }
        for i in range(len(vals)):
            trail = vals[max(0, i - 60): i].astype(float)
            z, n = out[i]
            assert n == len(trail)
            if len(trail) < 30 or trail.std(ddof=1) == 0:
                assert z is None
            else:
                expect = (vals[i] - trail.mean()) / trail.std(ddof=1)
                assert abs(z - expect) < 1e-3, (i, z, expect)

    def test_spike_flagged(self, spark):
        vals = [50] * 100 + [500] + [50] * 10
        rng = np.random.default_rng(1)
        vals = [v + int(rng.integers(-3, 4)) for v in vals]
        rows = rolling_zscore(sig_df(spark, vals), window=60).collect()
        flagged = {r.t_us // 60_000_000 for r in rows if r.is_anomaly}
        assert 100 in flagged
        normal = [r for r in rows if r.t_us // 60_000_000 in range(40, 100)]
        assert sum(1 for r in normal if r.is_anomaly) <= 2

    def test_warmup_and_zero_variance_null(self, spark):
        vals = [7] * 50
        rows = rolling_zscore(sig_df(spark, vals), window=60).collect()
        assert all(r.z is None for r in rows)  # zero variance throughout
        short = rolling_zscore(sig_df(spark, [1, 2, 3]), window=60).collect()
        assert all(r.z is None for r in short)  # under min_points

    def test_series_isolated(self, spark):
        a = sig_df(spark, [10] * 40, "a")
        b = sig_df(spark, [1000] * 40, "b")
        rows = rolling_zscore(a.union(b), window=60).collect()
        # constant within each series -> zero variance -> no z anywhere;
        # cross-series contamination would produce huge variance and z's
        assert all(r.z is None for r in rows)


class TestApproxDistinctParity:
    def test_hll_close_to_exact(self, spark):
        # the unbounded-cardinality path for active_users_hour: HLL sketch
        # within 5% of the exact two-phase distinct at 10k keys
        from pyspark.sql import functions as F

        df = spark.range(100_000).select(
            (F.col("id") % 9973).alias("user_id")
        )
        exact = df.agg(F.countDistinct("user_id")).first()[0]
        approx = df.agg(
            F.approx_count_distinct("user_id", rsd=0.02)
        ).first()[0]
        assert exact == 9973
        assert abs(approx - exact) / exact < 0.05


class TestMadOutliers:
    M = 60_000_000

    def _df(self, spark, values, series="a"):
        return spark.createDataFrame(
            [(series, i * self.M, int(v)) for i, v in enumerate(values)],
            "series string, t_us long, v long",
        )

    def test_matches_python_reference(self, spark):
        import numpy as np

        from usgs_geomag_algorithms_spark.operators.anomaly import (
            robust_window_stats,
        )

        rng = np.random.default_rng(9)
        values = [int(v) for v in rng.integers(0, 100, 180)]
        H = 60 * self.M  # one hour of minutes
        got = {
            r.t_us: (r.n, r.med, r.mad)
            for r in robust_window_stats(
                self._df(spark, values), H
            ).collect()
        }
        for w in (0, 1, 2):
            vs = sorted(values[w * 60 : (w + 1) * 60])
            med = vs[(len(vs) + 1) // 2 - 1]
            mad = sorted(abs(v - med) for v in vs)[(len(vs) + 1) // 2 - 1]
            assert got[w * H] == (60, med, mad), (w, got[w * H])

    def test_spike_flags_mean_shift_does_not_drag(self, spark):
        from usgs_geomag_algorithms_spark.operators.anomaly import (
            mad_outliers,
        )

        # 59 quiet samples + one huge spike: the spike cannot drag the
        # median/MAD the way it drags mean/stddev
        values = [10 + (i % 3) for i in range(59)] + [10_000]
        out = {
            r.t_us // self.M: r.is_outlier
            for r in mad_outliers(
                self._df(spark, values), 3600 * self.M, k=3
            ).collect()
        }
        assert out[59] is True
        assert sum(out.values()) == 1

    def test_odd_even_medians_and_zero_mad(self, spark):
        from usgs_geomag_algorithms_spark.operators.anomaly import (
            mad_outliers,
            robust_window_stats,
        )

        # even n: low median picks element (n+1)//2 = 2 of [1,2,3,4] -> 2
        st = robust_window_stats(
            self._df(spark, [3, 1, 4, 2]), 3600 * self.M
        ).collect()[0]
        assert (st.n, st.med) == (4, 2)
        # constant window: mad == 0 -> any deviation flags
        out = mad_outliers(
            self._df(spark, [5, 5, 5, 5, 6]), 3600 * self.M, k=3
        ).collect()
        flags = {r.v: r.is_outlier for r in out}
        assert flags[6] is True and flags[5] is False
