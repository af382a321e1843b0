"""Event-path analytics: Markov transition counts and conversion latency.

Two staples of event-stream analysis over the same per-key ordered
stream the churn/session operators use (``operators/churn.py``,
``operators/sessions.py``):

- :func:`event_transitions` — the first-order Markov model of user
  behavior: per (state → next state) count and row probability.  One
  key exchange (the lag window), one bounded aggregate (states²).
- :func:`conversion_latency` — time from each user's FIRST trigger
  event to their first target event at or after it, aggregated per
  trigger-day cohort: conversion counts, LOW-median / mean latency.
  min-aggregates + one join — no per-user collect, power users stay
  O(1) state (the funnel discipline, ``operators/funnel.py``).

Determinism: counts and epoch-µs latencies are integers; the LOW median
is an exact order statistic (rank window, no interpolated halves —
the interarrival_stats convention); mean is one int64/int64 division.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def event_transitions(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "t_us",
    state_col: str = "event_type",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per (state, next_state): ``n`` transitions and ``p`` — the row
    probability among transitions leaving ``state`` (one exact BIGINT
    division; the per-source total re-aggregates the transition counts,
    not the corpus — the collocations marginal trick)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    nxt = F.lead(state_col).over(w)
    trans = (
        events.select(*key_cols, ts_col, *tiebreak_cols, F.col(state_col))
        .withColumn("next_state", nxt)
        .where(F.col("next_state").isNotNull())
        .groupBy(F.col(state_col).alias("state"), "next_state")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w_src = Window.partitionBy("state")
    total = F.sum("n").over(w_src)
    return trans.select(
        "state",
        "next_state",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("p"),
    )


def conversion_latency(
    events: DataFrame,
    trigger: str,
    target: str,
    day_us: int = 86_400_000_000,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "t_us",
    state_col: str = "event_type",
) -> DataFrame:
    """Per trigger-day cohort: users whose first ``trigger`` fell that
    day, how many reached ``target`` at or after it, and the LOW-median /
    mean latency among converters.

    Two min-aggregates (first trigger per key; first target ≥ it per
    key) + one cohort aggregate; the median is a rank window over the
    cohort-bounded converter set."""
    key_cols = list(key_cols)
    firsts = (
        events.where(F.col(state_col) == trigger)
        .groupBy(*key_cols)
        .agg(F.min(ts_col).alias("_t0"))
    )
    targets = events.where(F.col(state_col) == target).select(
        *key_cols, F.col(ts_col).alias("_tt")
    )
    # conditional min INSIDE the aggregate — a where() would drop users
    # whose only targets precede the trigger from the cohort entirely
    conv = (
        firsts.join(targets, key_cols, "left")
        .groupBy(*key_cols, "_t0")
        .agg(
            F.min(
                F.when(F.col("_tt") >= F.col("_t0"), F.col("_tt"))
            ).alias("_tconv")
        )
    )
    cohort = conv.select(
        *key_cols,
        F.expr(f"(_t0 div {day_us}) * {day_us}").alias("cohort_day"),
        (F.col("_tconv") - F.col("_t0")).alias("_lat"),
    )
    w = Window.partitionBy("cohort_day").orderBy("_lat", *key_cols)
    wn = Window.partitionBy("cohort_day")
    ranked = cohort.where(F.col("_lat").isNotNull()).select(
        "cohort_day",
        "_lat",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_nc"),
    )
    med = ranked.where(
        F.col("_rn") == F.expr("(_nc + 1) div 2")
    ).select("cohort_day", F.col("_lat").alias("med_latency_us"))
    agg = cohort.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("n_triggered"),
        F.count("_lat").cast("long").alias("n_converted"),
        F.sum("_lat").cast("long").alias("sum_latency_us"),
    )
    return (
        agg.join(med, "cohort_day", "left")
        .select(
            "cohort_day",
            "n_triggered",
            "n_converted",
            "med_latency_us",
            F.when(
                F.col("n_converted") > 0,
                F.col("sum_latency_us").cast("double")
                / F.col("n_converted").cast("double"),
            ).alias("mean_latency_us"),
        )
    )
