"""spark-submit entry point for realtime derived products — the reference's
``geomag-cron`` processing commands (``geomagio/processing/derived.py``
adjusted/average, ``geomagio/processing/efield.py`` realtime,
``geomagio/processing/filters.py`` cadences).

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_derived.py adjusted --store /data/tiers \
        --tier-in second --tier-out second_adjusted \
        --matrix /data/adjusted_BOU.json --now 2020-01-06T01:00:00

Commands
--------
adjusted   apply an affine matrix (statefile JSON: ``{"matrix": [[...]],
           "pier_correction": p}``) over the realtime window, filling
           output gaps only (ref derived.py:16-69).
calibrated apply each observatory's OWN latest matrix from the store's
           calibration state table (plans/calibration.py — the full
           residual→affine→adjusted loop's serving leg).
average    multi-observatory average onto an output observatory
           (ref derived.py:72-113).
efield     invert 1 Hz E-E/E-N polarity into the adjusted tier, then
           minute-filter both tiers (ref efield.py:15-57).

Every command takes ``--now`` (ISO time; the cron tick) and
``--realtime-interval`` seconds, mirroring ``get_realtime_interval``
(Controller.py:639-644); omitting ``--now`` uses the current time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _window(args) -> tuple[int, int]:
    from usgs_geomag_algorithms_spark.plans.realtime import (
        get_realtime_interval,
    )
    from usgs_geomag_algorithms_spark.tiers import iso_to_us

    now_us = iso_to_us(args.now) if args.now else int(time.time() * 1_000_000)
    return get_realtime_interval(args.realtime_interval, now_us)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "command", choices=["adjusted", "average", "efield", "calibrated"]
    )
    ap.add_argument("--store", required=True)
    ap.add_argument("--tier-in", default="second")
    ap.add_argument("--tier-out", required=True)
    ap.add_argument("--now", help="ISO cron tick time (default: wall clock)")
    ap.add_argument("--realtime-interval", type=int, default=600)
    ap.add_argument("--update-limit", type=int, default=10)
    ap.add_argument("--interval-us", type=int, default=1_000_000)
    # adjusted
    ap.add_argument("--matrix", help="adjusted statefile JSON path")
    ap.add_argument("--in-channels", default="H,E,Z,F")
    ap.add_argument("--out-channels", default="X,Y,Z,F")
    # average
    ap.add_argument("--observatories", default="")
    ap.add_argument("--input-channel", default="H")
    ap.add_argument("--output-observatory", default="USGS")
    ap.add_argument("--output-channel")
    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.plans import realtime as RT
    from usgs_geomag_algorithms_spark.sources.store import TierStore

    spark = SparkSession.builder.getOrCreate()
    store = TierStore(spark, args.store)
    start_us, end_us = _window(args)
    common = dict(
        start_us=start_us,
        end_us=end_us,
        interval_us=args.interval_us,
        realtime_interval_s=args.realtime_interval,
        update_limit=args.update_limit,
    )

    if args.command == "calibrated":
        from usgs_geomag_algorithms_spark.plans.calibration import (
            adjusted_from_calibration,
        )

        metrics = adjusted_from_calibration(
            store,
            args.tier_out,
            args.tier_in,
            start_us,
            end_us,
            in_channels=args.in_channels.split(","),
            out_channels=args.out_channels.split(","),
            interval_us=args.interval_us,
            realtime_interval_s=args.realtime_interval,
            update_limit=args.update_limit,
        )
    elif args.command == "adjusted":
        if not args.matrix:
            raise SystemExit("adjusted requires --matrix (statefile JSON)")
        with open(args.matrix) as f:
            state = json.load(f)
        metrics = RT.adjusted_update(
            store,
            args.tier_out,
            args.tier_in,
            state["matrix"],
            pier_correction=float(state.get("pier_correction", 0.0)),
            in_channels=args.in_channels.split(","),
            out_channels=args.out_channels.split(","),
            **common,
        )
    elif args.command == "average":
        obs = [o for o in args.observatories.split(",") if o]
        if not obs:
            raise SystemExit("average requires --observatories a,b,c")
        metrics = RT.average_update(
            store,
            args.tier_out,
            args.tier_in,
            obs,
            args.input_channel,
            output_observatory=args.output_observatory,
            output_channel=args.output_channel,
            **common,
        )
    else:  # efield: polarity inversion, then minute-filter both tiers
        metrics = RT.efield_update(
            store, args.tier_out, args.tier_in, **common
        )
        from usgs_geomag_algorithms_spark.plans.refresh import run_as_update
        from usgs_geomag_algorithms_spark.tiers import STEPS

        sec_min = STEPS[1]  # 1 Hz -> 1 minute stage
        for t_in, t_out in (
            (args.tier_in, f"{args.tier_in}_minute"),
            (args.tier_out, f"{args.tier_out}_minute"),
        ):
            m = run_as_update(
                store, t_in, t_out, sec_min, start_us, end_us,
                update_limit=args.update_limit,
            )
            metrics[f"minute_{t_out}_rows"] = m["rows_written"]

    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
