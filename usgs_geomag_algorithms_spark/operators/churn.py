"""Crawl-revision churn analytics: revision dedup, churn rate, staleness.

The Common-Crawl side of the graft's timeseries × webtext cell: a crawl
log is a per-url stream of fetches ``(url, t_us, digest)`` where the
digest fingerprints the fetched content.  Three operators reduce it the
way a WARC pipeline does with ``revisit`` records (a fetch whose payload
digest matches the previous capture is stored as a pointer, not a body):

- :func:`revision_dedup` — keep only fetches whose digest differs from
  the key's previous fetch (plus every first fetch); number the kept
  revisions.  This is content-addressed storage dedup across TIME, the
  temporal sibling of ``operators/dedup.py::exact_dedup`` (which dedups
  across DOCUMENTS).
- :func:`churn_rate` — per (group, window): fetch/revisit/changed counts
  and the change ratio — the crawl-scheduler's refresh-rate signal, and
  the churn analog of the reference's coverage ``monitor`` report
  (``geomagio/TimeseriesUtility.py`` gap metrics: percentage of expected
  samples present ↔ percentage of revisits that changed).
- :func:`staleness` — per key: fetches since the last content change and
  the last-change timestamp — the "stop re-crawling this" signal.

Determinism (exact driver oracles): change detection is a string
inequality against ``lag()`` over ``(key ORDER BY t_us, tiebreak)`` —
no floats anywhere except one final BIGINT→DOUBLE division in
:func:`churn_rate`, which is a single IEEE op and exact cross-engine.

Scale shape: one hash exchange on the key columns feeds every window
here (lag / running sum / per-key max are all over the same partitioning
— Spark reuses the Exchange), and keys are urls: billions of small
independent partitions, no skew beyond what a hot url's fetch count
itself is (bounded by crawl policy).  ``churn_rate`` then re-aggregates
map-side-combinably to (group, window) cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _fetch_order(
    key_cols: Sequence[str], ts_col: str, tiebreak_cols: Sequence[str]
) -> Window:
    return Window.partitionBy(*key_cols).orderBy(
        ts_col, *tiebreak_cols
    )


def changed_flag(
    fetches: DataFrame,
    key_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    digest_col: str = "digest",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Annotate each fetch with ``is_first`` (no prior capture of the key)
    and ``is_changed`` (digest differs from the previous capture; first
    fetches count as changed — they introduce content).

    NULL digests (fetch failed, no content hash) are handled: ``is_first``
    comes from a row-existence marker, not from ``lag(digest)`` (whose
    NULL is ambiguous between "no prior row" and "prior digest was
    NULL"), and the digest comparison is null-safe — a NULL-digest
    revisit after a NULL digest is UNchanged, after content it is
    changed."""
    w = _fetch_order(key_cols, ts_col, tiebreak_cols)
    prev = F.lag(digest_col).over(w)
    is_first = F.lag(F.lit(1)).over(w).isNull()
    return (
        fetches.select(
            "*",
            prev.alias("_prev_digest"),
            is_first.alias("is_first"),
        )
        .select(
            "*",
            (
                F.col("is_first")
                | ~F.col(digest_col).eqNullSafe(F.col("_prev_digest"))
            ).alias("is_changed"),
        )
        .drop("_prev_digest")
    )


def revision_dedup(
    fetches: DataFrame,
    key_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    digest_col: str = "digest",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """WARC revisit-record dedup: keep first fetches and changed
    revisits, drop unchanged revisits; ``revision_no`` numbers the kept
    captures 1.. per key in fetch order (a running sum of the change
    flag over the same key partitioning — no second shuffle)."""
    w = _fetch_order(key_cols, ts_col, tiebreak_cols)
    flagged = changed_flag(
        fetches, key_cols, ts_col, digest_col, tiebreak_cols
    )
    rev_no = F.sum(F.col("is_changed").cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("revision_no", rev_no)
        .where(F.col("is_changed"))
        .drop("is_first", "is_changed")
    )


def churn_rate(
    fetches: DataFrame,
    window_us: int,
    group_cols: Sequence[str],
    key_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    digest_col: str = "digest",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per (group, window): ``n_fetches``, ``n_revisits`` (fetches with a
    prior capture), ``n_changed`` (revisits whose digest changed), and
    ``change_ratio = n_changed / n_revisits`` (NULL where no revisits).

    ``group_cols`` may derive from the key (e.g. domain from url) — the
    window-key aggregate after the per-key lag is map-side combinable.
    The ratio is one BIGINT→DOUBLE division: exact cross-engine."""
    flagged = changed_flag(
        fetches, key_cols, ts_col, digest_col, tiebreak_cols
    )
    revisit = ~F.col("is_first")
    changed = revisit & F.col("is_changed")
    out = (
        flagged.groupBy(
            *group_cols,
            F.expr(f"({ts_col} div {window_us}) * {window_us}").alias(
                ts_col
            ),
        )
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum(revisit.cast("long")).cast("long").alias("n_revisits"),
            F.sum(changed.cast("long")).cast("long").alias("n_changed"),
        )
    )
    ratio: Column = F.when(
        F.col("n_revisits") > 0,
        F.col("n_changed").cast("double")
        / F.col("n_revisits").cast("double"),
    )
    return out.select("*", ratio.alias("change_ratio"))


def staleness(
    fetches: DataFrame,
    key_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    digest_col: str = "digest",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per key: ``n_fetches``, ``n_changes`` (kept revisions, ≥1),
    ``last_change_t_us`` (timestamp of the newest changed capture) and
    ``fetches_since_change`` (trailing unchanged revisits — the
    staleness streak a crawl-budget planner demotes on).

    One window (per-key max of change timestamps, same Exchange as the
    lag) + one aggregate; output is key cardinality."""
    flagged = changed_flag(
        fetches, key_cols, ts_col, digest_col, tiebreak_cols
    )
    wk = Window.partitionBy(*key_cols)
    last_change = F.max(
        F.when(F.col("is_changed"), F.col(ts_col))
    ).over(wk)
    return (
        flagged.withColumn("_last_change", last_change)
        .groupBy(*key_cols)
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum(F.col("is_changed").cast("long"))
            .cast("long")
            .alias("n_changes"),
            F.max("_last_change").alias("last_change_t_us"),
            F.sum(
                (F.col(ts_col) > F.col("_last_change")).cast("long")
            )
            .cast("long")
            .alias("fetches_since_change"),
        )
    )
