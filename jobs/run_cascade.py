"""spark-submit entry point for the rollup pipeline (the Controller/
``geomag.py`` CLI analog, re-imagined for cluster runs).

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_cascade.py --pages /data/pages --store /data/tiers \
        --start 2020-01-06T00:00:00 --end 2020-01-07T00:00:00 \
        [--mode build|update|maintain|sync] [--update-limit 1] \
        [--retention-now <iso>] [--since-version N]

Modes mirror the reference: ``build`` = bulk backfill (Controller.run),
``update`` = gap-driven incremental refresh (Controller.run_as_update),
``sync`` = CDC-driven staleness propagation (recompute downstream slots
whose minute-tier inputs changed since --since-version; late-data and
deletion repair the gap audit cannot see), plus retention partition
drops. Without --since-version, sync is cursor-managed: the store
remembers each --consumer's resume pointer (first poll baselines it,
every later poll syncs from it and advances it after the work lands) —
a bare cron ``--mode sync`` needs no state threading.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone

# allow running as a plain script (spark-submit ships the package via
# --py-files; local runs resolve it from the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def iso_to_us(s: str) -> int:
    from usgs_geomag_algorithms_spark.tiers import iso_to_us as _iso

    return _iso(s)


def parse_deprecated_arguments(args, error=None):
    """Legacy-argument rewrite — the Controller's deprecated-flag mapping
    (``parse_deprecated_arguments``, Controller.py:1311-1383): old names
    keep working, rewritten onto the current arguments with the
    reference's exact warning text.  Mixing an old flag with its new
    spelling is ambiguous (which wins?) and is rejected rather than
    silently overridden."""

    def _err(msg):
        if error is not None:
            error(msg)
        raise SystemExit(2)

    using_deprecated = False
    if args.observatory is not None:
        if args.series is not None:
            _err("--observatory is deprecated; do not combine it with --series")
        args.series = args.observatory
        using_deprecated = True
    if args.observatory_foreach:
        args.series_foreach = True
        using_deprecated = True
    if args.input_pages is not None:
        if args.pages is not None:
            _err("--input-pages is deprecated; do not combine it with --pages")
        args.pages = args.input_pages
        using_deprecated = True
    if args.output_store is not None:
        if args.store is not None:
            _err("--output-store is deprecated; do not combine it with --store")
        args.store = args.output_store
        using_deprecated = True
    if using_deprecated:
        print(
            "WARNING: you are using deprecated arguments,"
            + " please update your usage",
            file=sys.stderr,
        )
    return args


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=False, help="pages parquet/table path")
    ap.add_argument("--store", required=False, help="tier store root")
    ap.add_argument("--start", required=False)
    ap.add_argument("--end", required=False)
    ap.add_argument(
        "--mode",
        choices=["build", "update", "maintain", "sync", "erase", "publish"],
        default="build",
    )
    ap.add_argument("--since-version", type=int, default=None)
    ap.add_argument(
        "--consumer",
        default="downstream",
        help="cursor name for --mode sync without --since-version",
    )
    ap.add_argument("--channels", nargs="*", default=["text_len", "lang_en"])
    ap.add_argument("--update-limit", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--retention-now", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument(
        "--urls", nargs="*", default=None,
        help="victim series for --mode erase (GDPR across all tiers)",
    )
    ap.add_argument(
        "--hard", action="store_true",
        help="erase mode: physically unlink replaced files NOW",
    )
    ap.add_argument(
        "--series", nargs="*", default=None,
        help="restrict build to these series (url) values",
    )
    ap.add_argument("--series-col", default="url")
    ap.add_argument(
        "--series-foreach", action="store_true",
        help="run the build once per --series value (per-series run_id, "
        "lineage, and metrics; failures are reported per series)",
    )
    # deprecated aliases — the reference Controller's observatory
    # vocabulary and legacy-argument rewrite (Controller.py:696-712,
    # parse_deprecated_arguments :1311-1383)
    ap.add_argument("--observatory", nargs="*", default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--observatory-foreach", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--input-pages", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--output-store", default=None, help=argparse.SUPPRESS)
    args = parse_deprecated_arguments(ap.parse_args(argv), error=ap.error)
    if not args.store:
        ap.error("--store required")
    if args.series is not None and len(args.series) == 0:
        # an empty restriction list would otherwise behave like an
        # UNRESTRICTED overwrite build (no series filter, no upsert guard)
        ap.error("--series requires at least one value")
    if args.series_foreach and args.mode != "build":
        ap.error("--series-foreach applies to build mode")
    if args.series_foreach and not args.series:
        ap.error("--series-foreach requires --series values")

    from usgs_geomag_algorithms_spark.plans import pipeline
    from usgs_geomag_algorithms_spark.sources.store import TierStore

    from usgs_geomag_algorithms_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark(app_name="run_cascade")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    store = TierStore(spark, args.store, n_buckets=args.n_buckets)
    try:
        if args.mode not in ("sync", "erase", "publish"):
            if not args.start or not args.end:
                ap.error(f"--start/--end required in {args.mode} mode")
            start_us, end_us = iso_to_us(args.start), iso_to_us(args.end)
        retention_now_us = (
            iso_to_us(args.retention_now) if args.retention_now else None
        )
    except ValueError as e:
        ap.error(f"--start/--end/--retention-now must be ISO timestamps: {e}")

    if args.mode == "build":
        if not args.pages:
            ap.error("--pages required in build mode")
        from pyspark.sql import functions as F

        pages = spark.read.parquet(args.pages)
        if args.series_foreach:
            # per-series fan-out (Controller.py:696-712): each series
            # builds independently with its own run_id + lineage rows;
            # a failure is reported and the loop continues, and ANY
            # failure exits 1 at the end (the reference sets its
            # observatory_exception flag nowhere, so its exit(1) is
            # unreachable — fixed here rather than copied)
            metrics = {"series": {}, "failed": []}
            for sv in args.series:
                try:
                    m = pipeline.build_tiers(
                        pages.where(F.col(args.series_col) == sv),
                        store, start_us, end_us,
                        channels=tuple(args.channels),
                        run_id=f"{args.run_id or 'build'}-{sv}",
                        upsert=True,
                    )
                    metrics["series"][sv] = m
                except Exception as e:
                    print(
                        f"Exception processing series {sv}", str(e),
                        file=sys.stderr,
                    )
                    metrics["failed"].append(sv)
            if retention_now_us is not None:
                metrics["retention_dropped"] = pipeline.apply_retention(
                    store, retention_now_us
                )
            print(json.dumps(metrics, default=str))
            return 1 if metrics["failed"] else 0
        if args.series:
            pages = pages.where(F.col(args.series_col).isin(args.series))
        metrics = pipeline.build_tiers(
            pages, store, start_us, end_us,
            channels=tuple(args.channels), run_id=args.run_id,
            # a series-filtered build must merge: partition overwrite
            # would retire the other series' rows in shared partitions
            upsert=bool(args.series),
        )
    elif args.mode == "maintain":
        metrics = pipeline.maintain(store, end_us)
    elif args.mode == "erase":
        if not args.urls:
            ap.error("--urls required in erase mode")
        metrics = pipeline.erase_urls(store, args.urls, hard=args.hard)
    elif args.mode == "publish":
        metrics = pipeline.publish_tiers(store)
    elif args.mode == "sync":
        if args.since_version is not None:
            metrics = pipeline.sync_changed(
                store, args.since_version, run_id=args.run_id
            )
        else:
            # cursor-managed: the store remembers this consumer's resume
            # pointer; a bare cron `--mode sync` needs no state threading
            metrics = pipeline.sync_from_cursor(
                store, consumer=args.consumer, run_id=args.run_id
            )
    else:
        metrics = pipeline.update_tiers(
            store, start_us, end_us,
            update_limit=args.update_limit, run_id=args.run_id,
        )
    if retention_now_us is not None and args.mode != "maintain":
        # maintain mode already ran retention inside pipeline.maintain
        metrics["retention_dropped"] = pipeline.apply_retention(
            store, retention_now_us
        )
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
