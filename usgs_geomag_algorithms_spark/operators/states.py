"""Time-in-state aggregation (a `state_agg` hyperfunction analog).

Each event sets its entity's state; the state holds (LOCF) until the same
entity's next event. The closed segment between consecutive events is an
exact BIGINT microsecond duration, so every statistic here — totals,
per-day splits, shares — has an exact DuckDB oracle. The open tail after
an entity's last event is EXCLUDED by definition (its length depends on an
arbitrary observation horizon); callers who want a bounded horizon can
append one synthetic end-marker event per entity before calling.

No reference analog (the geomag reference has no entity-state ops); this
is the ops/telemetry layer of the graft, the same role TimescaleDB's
``state_agg``/``duration_in`` plays for monitoring workloads.

Scale shape: ONE shuffle on the entity key for the lead() window (same
key as sessionization — at crawl scale this partitioner is reused across
the session/path/state family), then a states-bounded aggregate with
map-side partials. The day-split variant explodes each segment into the
calendar days it covers — output rows are bounded by segments x days
spanned, and a typical telemetry segment spans 1-2 days, so the explode
is ~1x, not a blow-up; the per-day aggregate shuffles on (day, state),
cardinality-bounded. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DAY_US = 86_400_000_000


def _segments(
    events: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Closed LOCF segments: (entity, state, t_us, nxt_us) with
    nxt_us = next event's timestamp for the same entity (ties broken on
    ``tie_col`` so the segmentation is deterministic cross-engine)."""
    return (
        events.select(
            F.col(entity_col).alias("entity"),
            F.col(state_col).alias("state"),
            F.col(ts_col).cast("long").alias("t_us"),
            F.col(tie_col).alias("tie"),
        )
        .withColumn("nxt_us", F.lead("t_us").over(
            Window.partitionBy("entity").orderBy("t_us", "tie")
        ))
        .where(F.col("nxt_us").isNotNull())
    )


def state_durations(
    events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "t_us",
    tie_col: str = "event_id",
) -> DataFrame:
    """Total time spent in each state across all entities.

    Input needs an integer-microsecond ``ts_col``. Output per state:
    ``total_us``/``n_segments``/``max_us`` (exact BIGINT), ``n_entities``
    (entities with >= 1 closed segment in the state), and ``mean_us``
    (one BIGINT/BIGINT division -> exact DOUBLE).
    """
    seg = _segments(events, entity_col, state_col, ts_col, tie_col)
    dur = F.col("nxt_us") - F.col("t_us")
    return (
        seg.groupBy("state")
        .agg(
            F.sum(dur).alias("total_us"),
            F.count(F.lit(1)).alias("n_segments"),
            F.countDistinct("entity").alias("n_entities"),
            F.max(dur).alias("max_us"),
        )
        .select(
            "state",
            "total_us",
            "n_segments",
            "n_entities",
            "max_us",
            (F.col("total_us").cast("double") / F.col("n_segments"))
            .alias("mean_us"),
        )
    )


def state_share_day(
    events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "t_us",
    tie_col: str = "event_id",
) -> DataFrame:
    """Per (calendar day, state): covered microseconds and the state's
    share of ALL covered time that day.

    Segments crossing midnight are split exactly: a segment [t, nxt)
    contributes ``min(nxt, day_end) - max(t, day_start)`` to each day it
    overlaps. All splits are BIGINT; the share is a ratio of two BIGINTs
    (one division) so the whole result is engine-exact.
    """
    seg = _segments(events, entity_col, state_col, ts_col, tie_col)
    # integer `div` is exact; timestamps are epoch-positive so the
    # truncate-toward-zero / floor distinction never bites here
    d0 = F.expr(f"t_us div {DAY_US}")
    d1 = F.expr(f"(nxt_us - 1) div {DAY_US}")
    days = seg.select(
        "state",
        "t_us",
        "nxt_us",
        F.explode(F.sequence(d0, d1)).alias("day_idx"),
    )
    day_us = F.col("day_idx") * F.lit(DAY_US)
    covered = F.least(F.col("nxt_us"), day_us + F.lit(DAY_US)) - F.greatest(
        F.col("t_us"), day_us
    )
    per = (
        days.select("state", day_us.alias("day_us"), covered.alias("cov"))
        .groupBy("day_us", "state")
        .agg(F.sum("cov").alias("covered_us"))
    )
    tot = Window.partitionBy("day_us")
    return per.select(
        "day_us",
        "state",
        "covered_us",
        (
            F.col("covered_us").cast("double")
            / F.sum("covered_us").over(tot).cast("double")
        ).alias("share"),
    )
