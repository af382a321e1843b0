"""Bucketed tier tables: the cross-tier join must be exchange-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.sources.bucketed import (
    cotiered_join,
    require_no_exchange,
    save_bucketed,
)

T0 = 1578268800_000000  # 2020-01-06T00:00:00Z in us
MIN = 60_000_000


@pytest.fixture(scope="module")
def tier_tables(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS t_minute_b")
    spark.sql("DROP TABLE IF EXISTS t_hour_b")
    urls = [f"https://site{i}.example/" for i in range(20)]
    minute = spark.createDataFrame(
        [
            (u, "text_len", T0 + m * MIN, float(100 + m))
            for u in urls
            for m in range(120)
        ],
        "url string, channel string, t_us long, value double",
    )
    hour = spark.createDataFrame(
        [(u, "text_len", T0 + h * 60 * MIN, float(1000 + h)) for u in urls for h in range(2)],
        "url string, channel string, t_us long, value double",
    )
    save_bucketed(minute, "t_minute_b", n_buckets=4)
    save_bucketed(hour, "t_hour_b", n_buckets=4)
    yield "t_minute_b", "t_hour_b"
    spark.sql("DROP TABLE IF EXISTS t_minute_b")
    spark.sql("DROP TABLE IF EXISTS t_hour_b")


class TestBucketedJoin:
    def test_join_is_exchange_free(self, spark, tier_tables):
        left, right = tier_tables
        # disable broadcast so the co-location (not a broadcast) carries it
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = cotiered_join(spark, left, right, on=["url"])
            require_no_exchange(j)
            assert j.count() == 20 * 120 * 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_unbucketed_join_does_shuffle(self, spark, tier_tables):
        # control: the same join against a non-bucketed side must fail the
        # no-exchange guard, proving the guard detects shuffles at all
        left, _ = tier_tables
        plain = spark.table(left).select("url", "channel", "t_us", "value")
        plain = plain.withColumn("value", F.col("value") + 0.0).repartition(3)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table(left).join(plain, ["url"])
            with pytest.raises(AssertionError):
                require_no_exchange(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_groupby_on_bucket_col_is_exchange_free(self, spark, tier_tables):
        # bucketing also serves aggregation: groupBy(url) reuses the layout
        left, _ = tier_tables
        agg = spark.table(left).groupBy("url").agg(F.avg("value").alias("avg_value"))
        require_no_exchange(agg)
        assert agg.count() == 20

    def test_join_values_correct(self, spark, tier_tables):
        left, right = tier_tables
        j = cotiered_join(spark, left, right, on=["url"])
        row = (
            j.where((F.col("url") == "https://site3.example/"))
            .agg(F.count("*").alias("n"))
            .collect()[0]
        )
        assert row.n == 120 * 2
