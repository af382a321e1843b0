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
