"""Sessionization: group an irregular event stream into activity sessions
separated by inactivity gaps.

This is the dual of the reference's gap detection
(``geomagio/TimeseriesUtility.py:get_trace_gaps`` — see operators/gaps.py):
where ``get_trace_gaps`` enumerates the *holes* in a regular series,
``sessionize`` enumerates the *islands* of an irregular one (fetch-cadence
bursts per url, user activity bursts per id). The Spark-native form is
``groupBy(key, session_window(ts, gap))`` — Catalyst's built-in merging
session-window aggregation; no window-function sort over whole partitions,
no Python.

Semantics (matching Spark's session_window, boundary pinned by
tests/test_sessions.py): two consecutive events of the same key belong to
one session iff their timestamp difference is <= ``gap`` (the boundary is
INCLUSIVE — an event exactly ``gap`` after the previous one still merges);
a strictly greater difference starts a new session. All outputs
are integers (epoch microseconds / counts) so the DuckDB gaps-and-islands
oracle is bit-exact.

Scale shape: one shuffle keyed on the session key; map-side partial
merging of session fragments happens inside the session-window aggregation
(Spark merges overlapping partial windows at the reduce side). A bot-like
hot key concentrates its events on one reducer by necessity (sessions are
per-key sequential), but state per key is bounded by its session count,
not its event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessions per key -> (key, session_start_us, session_end_us,
    n_events, duration_us, mean_gap_us).

    ``session_start_us``/``session_end_us`` are the first/last observed
    event times (epoch us) — not the watermark-padded window end, so the
    output is engine-agnostic. ``mean_gap_us`` is the integer mean
    inter-event cadence within the session (NULL for single-event
    sessions) — the fetch-cadence signal rolled up at session grain."""
    grouped = (
        df.groupBy(key_col, F.session_window(ts_col, gap).alias("_w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
            F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        )
    )
    dur = F.col("session_end_us") - F.col("session_start_us")
    return grouped.select(
        key_col,
        "session_start_us",
        "session_end_us",
        "n_events",
        dur.alias("duration_us"),
        F.when(
            F.col("n_events") > 1,
            F.expr("(session_end_us - session_start_us) div (n_events - 1)"),
        ).alias("mean_gap_us"),
    )


def session_stats(
    sessions: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Per-key session rollup: session count, total active time, mean
    events per session — the downstream aggregate a crawl-cadence monitor
    reads. All-integer except the mean (rounded on both engines)."""
    return sessions.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.sum("duration_us").alias("active_us"),
        F.round(F.sum("n_events") / F.count("*"), 4).alias(
            "events_per_session"
        ),
    )

def cohort_retention(
    events: DataFrame,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "t_us",
) -> DataFrame:
    """Cohort retention matrix: bucket each key by its FIRST-activity
    window (the cohort), then count how many of each cohort are still
    active k windows later — the classic product-analytics retention
    triangle, and for a crawl corpus the url-survival curve (how many
    urls first seen in week W are still being fetched in week W+k).

    Output: (cohort_us, k, n_active, cohort_size, retention) — all
    integers plus one int64/int64 double division; k=0 rows carry
    ``n_active == cohort_size`` by construction.

    Plan: ONE distinct over (key, window) — the only corpus-sized
    shuffle; the cohort anchor derives from that relation by a key
    aggregate (same hash partitioning, exchange reused), joins back on
    the key, and the final (cohort, k) aggregate is output-bounded.
    Nothing rescans the raw events.
    """
    win = F.expr(f"(cast({ts_col} as bigint) div {window_us}) * {window_us}")
    active = (
        events.select(F.col(key_col).alias("_k"), win.alias("_w"))
        .distinct()
    )
    firsts = active.groupBy("_k").agg(F.min("_w").alias("_cohort"))
    joined = active.join(firsts, "_k").select(
        "_cohort",
        F.expr(f"cast((_w - _cohort) div {window_us} as bigint)").alias("k"),
    )
    counts = joined.groupBy("_cohort", "k").agg(
        F.count("*").cast("long").alias("n_active")
    )
    sizes = counts.where(F.col("k") == 0).select(
        "_cohort", F.col("n_active").alias("cohort_size")
    )
    return (
        counts.join(sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort_us"),
            "k",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )
