"""100x-scale probe for the timeseries query suite (the sf1 the driver
doesn't ship): replicate sf0.1's ``events`` 100x (100k -> 10M rows) by deterministic
time-shifting (each replica moves forward one 30-day block, so per-bucket
cardinality and skew are preserved while the time axis grows 10x), then
time the heaviest timeseries queries against it.

Why: at sf0.1 several all-SQL queries are plan-compile-bound (1-4 s of
codegen against <1 s of execution — NOTES.md round-2 characterization),
so suite deltas there say little about operator cost. At 100x the data the
codegen constant amortizes and per-operator signal emerges — the thing
VERDICT r2 asked to examine "if the driver adds sf1 data".

No external data: the replicas are pure column arithmetic on the driver-
provided sf0.1 parquet. documents/embeddings symlink unchanged (text
queries aren't the target here — their cost is string math, already
visible at sf0.1).

Usage: python tools/bench_big.py [out_json]
Writes the 100x dataset under /tmp/spark_graft_big (reused if present),
prints one JSON line with per-query seconds at 100x beside sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from usgs_geomag_algorithms_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = "/tmp/spark_graft_big"
SHIFT_US = 30 * 86_400_000_000  # one replica = one 30-day block forward

#: the timeseries-heavy subset where sf0.1 timings are codegen-bound
QUERIES = [
    "rollup_hour_value",
    "rollup_hour_count",
    "rollup_hour_pctl",
    "rollup_day_pctl_sketch",
    "rollup_month_value",
    "gap_detect_minute",
    "dbdt_minute",
    "rate_anomaly",
    "mad_outliers_hour",
    "active_users_hour",
    "distinct_users_day",
    "hll_users_day",
    "ewma_minute",
    "gapfill_minute",
    "top_minutes",
    "user_sessions",
    # round-3 additions: the remaining events-heavy families
    "purchase_asof_view",
    "funnel_steps",
    "session_purchases",
    "event_transitions",
    "cohort_retention",
    "ohlc_hour",
    "hist_p95_hour",
    "twa_hour",
    "state_durations",
    "counter_increase_hour",
    "churn_day",
    "acf_minute",
    "xcorr_minute",
    "trend_minute",
    "theilsen_drift",
    "spearman_hour",
    "changepoint_cusum",
    "rolling_p95_day",
    "rollup_day_pctl",
]


def build_big(spark, replicas: int = 100) -> None:
    if os.path.exists(os.path.join(BIG, "events.parquet", "_SUCCESS")):
        return
    os.makedirs(BIG, exist_ok=True)
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    from pyspark.sql import functions as F

    out = None
    for r in range(replicas):
        rep = ev.withColumn(
            "ts",
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.lit(r * SHIFT_US)
            ),
        ).withColumn(
            # keep event ids unique across replicas (session/asof queries
            # tie-break on them)
            "event_id",
            F.col("event_id") + F.lit(r * 1_000_000_000),
        )
        out = rep if out is None else out.unionByName(rep)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(BIG, "events.parquet")
    )
    # the suite loads documents/embeddings lazily; only link what exists
    for name in ("documents", "embeddings", "orders", "lineitem", "region",
                 "nation", "customer", "supplier", "part"):
        src = os.path.join(SRC, name + ".parquet")
        dst = os.path.join(BIG, name + ".parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench-big", cores=cpus, shuffle_partitions=cpus
    )
    build_big(spark)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for sf_dir, tag in ((SRC, "sf01"), (BIG, "x100")):
        timings = {}
        for name in QUERIES:
            t = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.perf_counter() - t, 3)
            except Exception as e:  # record, keep probing
                timings[name] = f"error: {type(e).__name__}"
            spark.catalog.clearCache()
        out[tag] = timings
    ratio = {
        k: round(out["x100"][k] / out["sf01"][k], 2)
        for k in QUERIES
        if isinstance(out["x100"][k], float) and isinstance(out["sf01"][k], float)
    }
    line = json.dumps(
        {
            "metric": "x100_probe",
            "cores": cpus,
            "sf01": out["sf01"],
            "x100": out["x100"],
            "x100_over_sf01": ratio,
        }
    )
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
