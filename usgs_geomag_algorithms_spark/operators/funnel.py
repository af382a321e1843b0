"""Funnel (ordered sequence-match) analysis over the events stream.

"Did the user view, then click, then purchase — in that order?" is the
event-analytics sibling of the session operators (sessions.py): the
canonical semantics is the EARLIEST CHAIN — step k matches at the first
event of its type strictly after step k-1's match (optionally within a
window of step 1).

Spark shape: one selective scan per step (event_type filter pushed to
parquet) and one user-keyed join per transition — k-1 joins total, all
shuffling on the same user key, so a 100 TB event log re-uses one hash
partitioning across the whole chain and never materializes per-user
event arrays (the collect_list alternative melts on power users; the
join chain is bounded by users × steps).  All outputs are epoch-µs
integers → the driver oracle is exact.

Reference analog: the reference has no funnel (SURVEY §2.5 "ranking —
absent"); this extends the events surface the same way top_minutes /
user_sessions do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    steps=FUNNEL_STEPS,
    window_us: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest-chain match: (user_id, t1_us..tk_us, depth).

    ``depth`` counts completed steps; ``t{k}_us`` is NULL beyond it.
    With ``window_us``, steps 2..k must land within that span of t1.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    # events.ts is TIMESTAMP_NTZ; the session is pinned UTC so the cast
    # is stable (same convention as sketches.hll_hour_sketches)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    users = events.select(F.col(user_col).alias("user_id")).distinct()
    chain = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(us).alias("t1_us"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"t{k - 1}_us"
        cur = f"t{k}_us"
        nxt = (
            events.where(F.col(type_col) == step)
            .select(F.col(user_col).alias("user_id"), us.alias("_t"))
            .join(chain, "user_id")
            .where(F.col("_t") > F.col(prev))
        )
        if window_us is not None:
            nxt = nxt.where(F.col("_t") <= F.col("t1_us") + window_us)
        stepped = nxt.groupBy("user_id").agg(F.min("_t").alias(cur))
        chain = chain.join(stepped, "user_id", "left")
    depth = None
    for k in range(len(steps), 0, -1):
        cond = F.col(f"t{k}_us").isNotNull()
        depth = (
            F.when(cond, F.lit(k))
            if depth is None
            else depth.when(cond, F.lit(k))
        )
    out = users.join(chain, "user_id", "left")
    return out.select(
        "user_id",
        *[f"t{k}_us" for k in range(1, len(steps) + 1)],
        depth.otherwise(F.lit(0)).cast("int").alias("depth"),
    )


def funnel_counts(funnel_df: DataFrame) -> DataFrame:
    """(depth, n_users) conversion table including zero rows — the
    classic funnel report, derived from :func:`funnel`'s output."""
    return (
        funnel_df.groupBy("depth")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("depth")
    )
