"""Bucketed tier tables: shuffle-free co-located joins between tiers.

The partitioned-parquet ``TierStore`` prunes on time (``p_date``); this
module adds the *join* dimension of the layout story: tier tables saved
with Spark native bucketing (``bucketBy(n, url).sortBy(url, t_us)`` —
the Iceberg ``bucket(N, url)`` transform) so that any equi-join between
two tiers, or tier-vs-dimension, on ``url`` is co-partitioned at write
time. At read time Spark sees matching ``HashPartitioning(url, n)`` on
both sides and plans a SortMergeJoin with **zero Exchange** — at 100 TB
the cross-tier reconcile (e.g. minute-vs-hour coverage diff, the
``run_as_update`` gap audit) never reshuffles either table.

Requirements for the exchange-free plan (asserted in tests):
- both sides bucketed on the same column with the same bucket count;
- the join keys include the bucket column;
- bucketed scans keep one task per bucket, so bucket count is the
  parallelism floor — size it to the cluster (4096 at 100 TB).

Reference analog: the per-urlInterval chunk alignment of
``TimeseriesFactory.get_timeseries`` (geomagio/TimeseriesFactory.py:66-162)
— the reference co-locates by file naming; we co-locate by declared
table layout so the optimizer can prove it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 16,
    bucket_col: str = "url",
    sort_cols: Sequence[str] = ("url", "t_us"),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a session-catalog parquet table bucketed on
    ``bucket_col`` and sorted within buckets (sorted buckets additionally
    let the SortMergeJoin skip its Sort when keys align)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(n_buckets), bucket_col)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def cotiered_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] = ("url",),
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tier tables on their bucket column. With both
    sides bucketed identically this plans as an exchange-free
    SortMergeJoin; ``require_no_exchange`` verifies it."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def require_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan of ``df`` contains a shuffle Exchange —
    the guard tests use to prove bucket co-location held (a regression to
    a shuffling plan at 100 TB is an outage, not a slowdown)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"shuffle Exchange in plan:\n{plan}")
