"""Mergeable distinct-count sketches as a retention tier.

Exact ``count(DISTINCT user)`` cannot roll up: the hour tier's counts
can NOT be summed into a day (users repeat across hours), so a naive
continuous aggregate re-scans raw data for every coarser tier. The
standard fix at 100 TB is to store a MERGEABLE sketch per fine bucket —
Apache DataSketches HLL, exposed by Spark as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — and derive every coarser
tier by unioning fine-tier sketches, exactly like this engine's boxcar
tiers derive day from hour (tiers.py) without touching raw data.

Scale shape: building the hour tier is ONE groupBy whose map-side
partial is already a sketch (bytes, not user ids — the shuffle carries
lg_k-bounded binaries, never the user column); the day tier unions 24
sketches per day — shuffle bounded by the OUTPUT tier cardinality; and
the sketch column stores alongside Gorilla-packed values as a binary
tier column. Estimates are approximate (~1.6%/sqrt(2^lg_k) RSE), so
the driver entry is rows-only — the exact twin (distinct_users_day)
carries the DuckDB oracle for the same plan shape minus the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

#: DataSketches lgConfigK — 2^12 registers, ~2.3% relative standard error
LG_K = 12


def hll_hour_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = LG_K,
) -> DataFrame:
    """(t_us, sketch binary, n_events): the storable hour tier. The
    aggregate's partial state IS the sketch — no shuffle of raw keys."""
    return (
        events.select(
            F.expr(
                f"(unix_micros(cast({ts_col} as timestamp)) div {HOUR_US})"
                f" * {HOUR_US}"
            ).alias("t_us"),
            F.col(key_col).cast("string").alias("_k"),
        )
        .groupBy("t_us")
        .agg(
            F.expr(f"hll_sketch_agg(_k, {lg_k})").alias("sketch"),
            F.count("*").alias("n_events"),
        )
    )


def hll_rollup(
    hour_sketches: DataFrame, out_us: int = DAY_US
) -> DataFrame:
    """Derive a coarser distinct-count tier by UNIONING fine-tier
    sketches — never re-reading raw events. (d_us, approx_users,
    n_events)."""
    return (
        hour_sketches.select(
            F.expr(f"(t_us div {out_us}) * {out_us}").alias("d_us"),
            "sketch",
            "n_events",
        )
        .groupBy("d_us")
        .agg(
            F.expr(
                "cast(hll_sketch_estimate(hll_union_agg(sketch)) as bigint)"
            ).alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


def approx_users_day(
    events: DataFrame, ts_col: str = "ts", key_col: str = "user_id"
) -> DataFrame:
    """Hour sketch tier -> day union -> estimate, composed."""
    return hll_rollup(
        hll_hour_sketches(events, ts_col=ts_col, key_col=key_col),
        out_us=DAY_US,
    )


def rolling_users_sketch(
    hour_sketches: DataFrame, window_hours: int = 24
) -> DataFrame:
    """Trailing-``window_hours`` distinct count ending at each present
    hour — the classically expensive sliding-window distinct, computed as
    a range-frame ``hll_union_agg`` over the HOUR TIER (one row per hour,
    so the unpartitioned window is bounded by calendar hours — 8,760/yr —
    regardless of corpus size; raw events are never re-read). Output:
    (t_us, approx_users, n_events) where n_events is the exact trailing
    event count (sums slide exactly; distincts need the sketch)."""
    from pyspark.sql import Window

    w = (
        Window.orderBy("t_us")
        .rangeBetween(-(int(window_hours) - 1) * HOUR_US, 0)
    )
    # the union must be the whole window expression; the estimate wraps
    # it in an OUTER projection (an aggregate nested inside a scalar call
    # is not a valid window function)
    from ..functions.winguard import guard_bounded

    return hour_sketches.select(
        "t_us",
        F.expr("hll_union_agg(sketch)").over(w).alias("_merged"),
        # calendar-bounded global window (one row per hour; the default
        # guard ceiling is ~114 years of hours) — fails loudly if ever
        # fed raw events instead of the hour tier
        guard_bounded(
            F.sum("n_events").over(w), what="rolling sketch over hour tier"
        ).alias("n_events"),
    ).select(
        "t_us",
        F.expr("cast(hll_sketch_estimate(_merged) as bigint)").alias(
            "approx_users"
        ),
        "n_events",
    )


def rolling_users_exact(
    events: DataFrame,
    window_hours: int = 24,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Exact twin of :func:`rolling_users_sketch` (carries the DuckDB
    oracle): each distinct (hour, user) pair explodes to the
    ``window_hours`` trailing windows it contributes to, then one
    distinct aggregate per window end — the standard expand plan, with
    its deliberate ``window_hours``-fold amplification (the cost the
    sketch path exists to avoid). Output restricted to window ends that
    are themselves present hours, so the row set matches the sketch
    path."""
    hu = events.select(
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp)) div {HOUR_US})"
            f" * {HOUR_US}"
        ).alias("h_us"),
        F.col(key_col).alias("_k"),
    )
    pairs = hu.distinct()
    counts = hu.groupBy("h_us").agg(F.count("*").alias("_n"))
    span = (int(window_hours) - 1) * HOUR_US
    exploded = pairs.select(
        "_k",
        F.explode(
            F.expr(f"sequence(h_us, h_us + {span}, {HOUR_US})")
        ).alias("t_us"),
    )
    users = exploded.groupBy("t_us").agg(
        F.countDistinct("_k").alias("n_users")
    )
    ev_counts = counts.select(
        "h_us",
        F.explode(
            F.expr(f"sequence(h_us, h_us + {span}, {HOUR_US})")
        ).alias("t_us"),
        "_n",
    ).groupBy("t_us").agg(F.sum("_n").alias("n_events"))
    present = counts.select(F.col("h_us").alias("t_us"))
    return (
        users.join(ev_counts, "t_us")
        .join(present, "t_us")
        .select("t_us", "n_users", "n_events")
    )


# ------------------------------------------------------- store integration
#
# The sketch tier persists through the SAME snapshot-manifest TierStore as
# the signal tiers (sources/store.py) — value_schema="sketch binary,
# n_events long" — so it inherits partition pruning, snapshot isolation,
# optimistic upsert (a recomputed hour REPLACES its sketch; sketches are
# never unioned on upsert, which would double-count re-ingested events),
# retention partition drops, and time travel, unchanged.


def sketch_store(spark, root: str, metric_col: str = "metric"):
    """A TierStore configured for sketch tiers: one series column (the
    metric name) and (sketch, n_events) value columns."""
    from ..sources.store import TierStore

    return TierStore(
        spark,
        root,
        series_cols=(metric_col,),
        value_schema="sketch binary, n_events long",
    )


def write_sketch_tier(
    store,
    sketches: DataFrame,
    metric: str = "users",
    tier: str = "hour_sketch",
) -> None:
    """Upsert an (t_us, sketch, n_events) frame as ``metric`` rows of the
    sketch tier (last-wins per hour: a recompute replaces)."""
    store.upsert(
        sketches.select(
            F.lit(metric).alias(store.series_cols[0]),
            "t_us",
            "sketch",
            "n_events",
        ),
        tier,
    )


def read_sketch_tier(
    store,
    metric: str = "users",
    tier: str = "hour_sketch",
    start_us: int | None = None,
    end_us: int | None = None,
) -> DataFrame:
    """(t_us, sketch, n_events) for one metric — feed to hll_rollup."""
    df = store.read(tier, start_us=start_us, end_us=end_us)
    return df.where(F.col(store.series_cols[0]) == metric).select(
        "t_us", "sketch", "n_events"
    )
