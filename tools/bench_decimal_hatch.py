"""Cost probe for the decimal escape hatches at x100 scale (VERDICT r3
next-round #4): on the 10M-row time-shifted events table
(tools/bench_big.py cache), time window_corr and cusum_changepoints in
their default BIGINT form vs the exact_decimal form, and report the
overhead ratio.  Answers "what does the hatch cost when you need it" —
correctness of both paths is asserted in
tests/test_stats.py::TestScaleEscapeHatches.

Usage: python tools/bench_decimal_hatch.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.changepoint import (
    cusum_changepoints,
)
from usgs_geomag_algorithms_spark.operators.stats import window_corr
from usgs_geomag_algorithms_spark.session import get_spark

BIG = "/tmp/spark_graft_big"
HOUR_US = 3_600_000_000
MIN_US = 60_000_000


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-decimal", cores=cpus,
                      shuffle_partitions=cpus)
    if not os.path.exists(os.path.join(BIG, "events.parquet")):
        from tools.bench_big import build_big

        build_big(spark)
    ev = spark.read.parquet(os.path.join(BIG, "events.parquet"))
    # aligned integer minute channels: click vs view counts
    minute = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.expr(f"(unix_micros(cast(ts as timestamp)) div {MIN_US}) * {MIN_US}").alias("t_us")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("y"),
        )
    )
    minute.persist().count()
    series = ev.select(
        F.col("user_id").cast("string").alias("series"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.col("value").cast("long").alias("v"),
    )
    series.persist().count()
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name, mk in (
        ("window_corr_long", lambda: window_corr(minute, HOUR_US, "x", "y")),
        ("window_corr_decimal", lambda: window_corr(
            minute, HOUR_US, "x", "y", exact_decimal=True)),
        ("cusum_long", lambda: cusum_changepoints(
            series, baseline=16, k=1, h=8)),
        ("cusum_decimal", lambda: cusum_changepoints(
            series, baseline=16, k=1, h=8, exact_decimal=True)),
    ):
        # warm then timed
        t(mk())
        out[name] = t(mk())
        spark.catalog.clearCache()
        minute.persist().count()
        series.persist().count()
    out["corr_decimal_over_long"] = round(
        out["window_corr_decimal"] / out["window_corr_long"], 2
    )
    out["cusum_decimal_over_long"] = round(
        out["cusum_decimal"] / out["cusum_long"], 2
    )
    line = json.dumps({"metric": "decimal_hatch_x100", "cores": cpus, **out})
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
