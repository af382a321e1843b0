"""spark-submit entry point for tier health monitoring — the
``geomag-monitor`` CLI analog (reference ``geomagio/processing/
monitor.py``: per-channel percent-missing gap report for alerting),
extended with the engine's anomaly monitors.

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_monitor.py --store /data/tiers --tier minute \
        --start 2020-01-06T00:00:00 --end 2020-01-06T23:59:00 \
        [--delta-s 60] [--warn-pct 10] [--cusum-baseline 240 --cusum-h 50]

Prints ONE JSON report (cluster-log friendly — the reference emails
HTML; a cluster job emits structured output for the alerting layer):
per-series coverage, the worst offenders, and — when a CUSUM baseline
is configured — per-series level-shift flags over the window.
Exit code 1 when any series breaches ``--warn-pct`` (cron-alert
contract), 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True)
    ap.add_argument("--tier", default="minute")
    ap.add_argument(
        "--mode",
        choices=["coverage", "layout"],
        default="coverage",
        help="coverage: gap/CUSUM health over a window (default); "
        "layout: metadata-only maintenance advisor (small files, bucket "
        "skew, aged equality deletes, unfinished spec migrations, stale "
        "refs) -- no data scan, no --start/--end needed",
    )
    ap.add_argument(
        "--small-files", type=int, default=4,
        help="layout mode: files-per-partition compaction threshold",
    )
    ap.add_argument(
        "--skew-ratio", type=float, default=8.0,
        help="layout mode: hottest-bucket/median rows evolve threshold",
    )
    ap.add_argument(
        "--fsck", action="store_true",
        help="layout mode: also verify manifest<->disk consistency per "
        "tier (missing live files flip the exit code to 1)",
    )
    ap.add_argument(
        "--fsck-repair", action="store_true",
        help="with --fsck: sweep crash-debris orphans and dead trash "
        "entries (missing LIVE files are never auto-repaired)",
    )
    ap.add_argument("--start", required=False)
    ap.add_argument("--end", required=False)
    ap.add_argument("--delta-s", type=float, default=60.0)
    ap.add_argument("--warn-pct", type=float, default=10.0)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--cusum-baseline", type=int, default=0)
    ap.add_argument("--cusum-k", type=int, default=0)
    ap.add_argument("--cusum-h", type=int, default=8)
    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.operators.changepoint import (
        cusum_changepoints,
    )
    from usgs_geomag_algorithms_spark.operators.gaps import coverage_metrics
    from usgs_geomag_algorithms_spark.sources.store import TierStore
    from usgs_geomag_algorithms_spark.tiers import iso_to_us

    spark = SparkSession.builder.getOrCreate()
    store = TierStore(spark, args.store, n_buckets=args.n_buckets)
    if args.mode == "layout":
        tiers = (
            [args.tier]
            if args.tier != "all"
            else sorted(
                d
                for d in os.listdir(args.store)
                if os.path.isdir(os.path.join(args.store, d))
                and not d.startswith("_")
            )
        )
        reports = []
        unsafe = 0
        for t in tiers:
            rep = store.maintenance_report(
                t,
                small_files_per_partition=args.small_files,
                skew_ratio=args.skew_ratio,
            )
            if args.fsck:
                rep["fsck"] = store.fsck(t, repair=args.fsck_repair)
                unsafe += 0 if rep["fsck"]["ok"] else 1
            reports.append(rep)
        print(json.dumps({"mode": "layout", "tiers": reports}))
        return 1 if unsafe else 0
    if not args.start or not args.end:
        ap.error("--start/--end required in coverage mode")
    t0, t1 = iso_to_us(args.start), iso_to_us(args.end)
    df = store.read(args.tier, t0, t1)

    cov = coverage_metrics(df, args.delta_s, t0, t1).cache()
    summary = cov.agg(
        F.count("*").alias("n_series"),
        F.sum("n_valid").alias("valid_points"),
        F.sum(
            (F.col("pct_missing") > args.warn_pct).cast("long")
        ).alias("n_breaching"),
    ).first()
    worst = [
        {
            "url": r.url,
            "channel": r.channel,
            "pct_missing": round(r.pct_missing, 3),
            "n_valid": r.n_valid,
        }
        for r in cov.orderBy(
            F.col("pct_missing").desc(), F.col("url").asc()
        ).limit(args.top).collect()
    ]

    shifts = None
    if args.cusum_baseline > 0:
        flagged = (
            cusum_changepoints(
                df.select(
                    "url", "channel", "t_us",
                    F.col("value").cast("long").alias("v"),
                ),
                baseline=args.cusum_baseline,
                k=args.cusum_k,
                h=args.cusum_h,
                series_cols=("url", "channel"),
            )
            .where(F.col("is_change"))
            .groupBy("url", "channel")
            .agg(
                F.count("*").alias("n_flagged"),
                F.min("t_us").alias("first_flag_us"),
            )
        )
        shifts = [
            {
                "url": r.url,
                "channel": r.channel,
                "n_flagged": r.n_flagged,
                "first_flag_us": r.first_flag_us,
            }
            for r in flagged.orderBy(
                F.col("n_flagged").desc(), F.col("url").asc()
            ).limit(args.top).collect()
        ]

    report = {
        "tier": args.tier,
        "start_us": t0,
        "end_us": t1,
        "n_series": summary.n_series,
        "valid_points": summary.valid_points,
        "n_breaching": summary.n_breaching,
        "warn_pct": args.warn_pct,
        "worst": worst,
        "level_shifts": shifts,
    }
    print(json.dumps(report, sort_keys=True))
    return 1 if (summary.n_breaching or 0) > 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
