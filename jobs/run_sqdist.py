"""spark-submit entry point for realtime SqDist over a tier store — the
reference's cron ``geomag.py --algorithm sqdist --realtime`` loop
(``geomagio/Controller.py:292-324``, ``test/Controller_test.py:36-213``:
six sequential invocations with a persisted statefile).

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_sqdist.py --store /data/tiers --tier minute \
        --start 2020-01-06T00:00:00 --end 2020-01-06T01:00:00 \
        --statefile /data/sqdist_state.json --out /data/sqdist

Each invocation reads [start, end] from the tier, resumes every series
from the statefile (strict continuity: a window that does not begin at a
series' ``next_start`` raises, exactly like the reference's
AlgorithmException), appends decomposition rows to ``--out``, and
rewrites the statefile. Deterministic: re-running a window after a crash
(statefile not yet advanced) reproduces identical rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def iso_to_us(s: str) -> int:
    from usgs_geomag_algorithms_spark.tiers import iso_to_us as _iso

    return _iso(s)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True)
    ap.add_argument("--tier", default="minute")
    ap.add_argument("--start", required=True)
    ap.add_argument("--end", required=True)
    ap.add_argument(
        "--statefile",
        help="JSON statefile (driver-side; small series counts / reference "
        "CLI parity)",
    )
    ap.add_argument(
        "--state-store",
        help="name of a parquet state table inside --store: state is "
        "cogrouped table-to-table and written back by executors — the "
        "driver never materializes it (millions-of-series scale path)",
    )
    ap.add_argument("--out", required=True, help="output parquet dir (append)")
    ap.add_argument("--alpha", type=float, default=0.1)
    ap.add_argument("--beta", type=float, default=0.0)
    ap.add_argument("--gamma", type=float, default=0.2)
    ap.add_argument("--m", type=int, default=1440)
    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.operators.sqdist import (
        HWParams,
        split_state_df,
        split_state_rows,
        sqdist_apply,
    )
    from usgs_geomag_algorithms_spark.session import get_spark
    from usgs_geomag_algorithms_spark.sources.store import TierStore
    from usgs_geomag_algorithms_spark.tiers import INTERVAL_SECONDS

    spark = SparkSession.getActiveSession() or get_spark(app_name="sqdist")
    store = TierStore(spark, args.store)
    if args.tier not in INTERVAL_SECONDS:
        ap.error(
            f"--tier must be one of {sorted(INTERVAL_SECONDS)} (got {args.tier!r})"
        )
    delta_s = INTERVAL_SECONDS[args.tier]
    start_us, end_us = iso_to_us(args.start), iso_to_us(args.end)

    if bool(args.statefile) == bool(args.state_store):
        ap.error("exactly one of --statefile / --state-store is required")

    params = HWParams(m=args.m, alpha=args.alpha, beta=args.beta, gamma=args.gamma)

    if args.state_store:
        states = store.read_state(args.state_store)
    else:
        states = {}
        if os.path.exists(args.statefile):
            with open(args.statefile) as f:
                states = json.load(f)
        states = states or None

    df = store.read(args.tier, start_us, end_us)
    # explicit window: continuity is window-vs-state, and data missing at
    # the window edges free-runs as a gap instead of wedging the series
    from pyspark.storagelevel import StorageLevel

    out = sqdist_apply(
        df, params, delta_s, states=states,
        range_start_us=start_us, range_end_us=end_us,
    ).persist(StorageLevel.MEMORY_AND_DISK)  # one recurrence run, 3 consumers
    from pyspark.sql import functions as F

    if args.state_store:
        data, new_state_df = split_state_df(out)
    else:
        data, new_states = split_state_rows(out)
    # engine gap convention: NaN (kernel) -> NULL on disk
    data = data.withColumn(
        "value", F.when(~F.isnan("value"), F.col("value"))
    )
    n = data.count()
    if n:
        # window-keyed overwrite: a crash between this write and the
        # state advance below makes the rerun REPLACE the same
        # partition instead of appending duplicates
        (
            data.write.mode("overwrite")
            .parquet(f"{args.out}/window={start_us}")
        )
    if args.state_store:
        # executor-side state writeback; atomic swap = advances only
        # after the data landed, same contract as the statefile path
        store.write_state(new_state_df, args.state_store)
        n_series = store.read_state(args.state_store).count()
        out.unpersist()
    else:
        out.unpersist()
        states = dict(states or {})
        states.update(new_states)
        n_series = len(new_states)
        tmp = args.statefile + ".tmp"
        with open(tmp, "w") as f:
            json.dump(states, f, sort_keys=True)
        os.replace(tmp, args.statefile)  # advances only after data lands

    print(json.dumps({"rows": n, "series": n_series}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
