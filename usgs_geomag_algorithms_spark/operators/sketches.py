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
