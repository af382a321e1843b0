"""HLL sketch tier: error bounds, mergeability, storability."""

import pyspark.sql.functions as F

from usgs_geomag_algorithms_spark.operators.sketches import (
    DAY_US,
    HOUR_US,
    approx_users_day,
    hll_hour_sketches,
    hll_rollup,
)


def _events(spark, n_users=700, hours=30, per_hour=50):
    # deterministic synthetic events: user ids cycle with an offset so
    # hours overlap heavily (the case exact hour counts cannot roll up)
    rows = (
        spark.range(hours * per_hour)
        .select(
            F.expr("id % " + str(hours * per_hour)).alias("i"),
            F.expr(f"id div {per_hour}").alias("h"),
        )
        .select(
            F.expr(
                f"timestamp_micros(cast(h * {HOUR_US} + (i % {per_hour})"
                " * 1000000 as bigint))"
            ).alias("ts"),
            F.expr(f"cast((i * 13) % {n_users} as bigint)").alias(
                "user_id"
            ),
        )
    )
    return rows


class TestHllTier:
    def test_estimate_within_hll_error(self, spark):
        ev = _events(spark)
        exact = {
            r["d_us"]: r["n"]
            for r in ev.select(
                F.expr(
                    f"(unix_micros(ts) div {DAY_US}) * {DAY_US}"
                ).alias("d_us"),
                "user_id",
            )
            .groupBy("d_us")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        got = {
            r["d_us"]: r["approx_users"]
            for r in approx_users_day(ev).collect()
        }
        assert set(got) == set(exact)
        for d, est in got.items():
            assert abs(est - exact[d]) / exact[d] < 0.05

    def test_union_matches_direct_day_sketch(self, spark):
        """Unioning 24 hour sketches must estimate like sketching the
        day directly — the property that makes the tier derivable."""
        ev = _events(spark)
        merged = {
            r["d_us"]: r["approx_users"]
            for r in hll_rollup(hll_hour_sketches(ev)).collect()
        }
        direct = {
            r["t_us"]: int(r["est"])
            for r in ev.select(
                F.expr(f"(unix_micros(ts) div {DAY_US}) * {DAY_US}").alias(
                    "t_us"
                ),
                F.col("user_id").cast("string").alias("_k"),
            )
            .groupBy("t_us")
            .agg(
                F.expr(
                    "cast(hll_sketch_estimate(hll_sketch_agg(_k, 12))"
                    " as bigint)"
                ).alias("est")
            )
            .collect()
        }
        assert set(merged) == set(direct)
        for d in merged:
            # identical lg_k and input set: allow only sketch-mode jitter
            assert abs(merged[d] - direct[d]) <= max(2, 0.01 * direct[d])

    def test_n_events_sums_through_rollup(self, spark):
        ev = _events(spark)
        total = (
            hll_rollup(hll_hour_sketches(ev))
            .agg(F.sum("n_events").alias("s"))
            .collect()[0]["s"]
        )
        assert total == ev.count()

    def test_sketch_column_is_bounded_binary(self, spark):
        """The hour tier must be storable: binary column, size bounded by
        the register array (2^12 registers -> ~few KB), independent of
        the hour's event count."""
        ev = _events(spark)
        sk = hll_hour_sketches(ev)
        assert dict(sk.dtypes)["sketch"] == "binary"
        mx = sk.select(
            F.max(F.length("sketch")).alias("m")
        ).collect()[0]["m"]
        assert mx <= 4096 + 64
