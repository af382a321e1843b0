"""Monotone-counter rate extraction with reset handling.

Web-crawl telemetry (fetch counters, byte counters, per-host request
totals) arrives as cumulative counters that occasionally RESET to zero
(process restart, host failover).  The naive ``last - first`` per bucket
under-counts across resets; the PromQL ``increase()`` convention treats
a negative delta as a restart and credits the post-reset reading as the
contribution.  This operator is that convention as a Catalyst plan —
the counter-world sibling of the DbDt lag-difference operator
(operators/dbdt.py; ref ``geomagio/algorithm/DbDtAlgorithm.py`` lag
semantics), sharing its scale shape: one shuffle on the series key, one
forward window pass, map-side partial aggregation into buckets.

All outputs are integers for integer counters — the driver oracle is
bit-exact with no rounding.

At 100 TB the per-series sort runs per time-chunk with a one-row halo
(the previous chunk's last sample), identical to the DbDt/gapfill halo
note; a series' FULL history never needs to be co-resident.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def counter_increase(
    samples: DataFrame,
    bucket_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    counter_col: str = "counter",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per (series, bucket): total increase of a cumulative counter with
    reset handling, plus sample/reset bookkeeping.

    Per-sample contribution (PromQL ``increase`` convention):
    ``delta >= 0 → delta``; ``delta < 0`` (reset) ``→ current reading``
    (everything since the restart); the first sample of a series has no
    baseline and contributes nothing.

    ``order_cols`` breaks timestamp ties to a total order (pass a unique
    id when samples can share a timestamp).

    Output: series + ``t_us`` (bucket anchor) + ``increase`` +
    ``n_samples`` (delta-bearing samples) + ``n_resets``.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    cur = F.col(counter_col)
    prev = F.lag(cur).over(w)
    delta = cur - prev
    contrib = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(delta < 0, cur).otherwise(delta)
    )
    reset = F.when(prev.isNull(), F.lit(None)).otherwise(
        (delta < 0).cast("int")
    )
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(int(bucket_us)))).alias(
        ts_col
    )
    return (
        samples.select(
            *series_cols,
            bucket,
            contrib.alias("_contrib"),
            reset.alias("_reset"),
        )
        .groupBy(*series_cols, ts_col)
        .agg(
            F.coalesce(F.sum("_contrib"), F.lit(0)).cast("long").alias("increase"),
            F.count("_contrib").cast("long").alias("n_samples"),
            F.coalesce(F.sum("_reset"), F.lit(0)).cast("long").alias("n_resets"),
        )
    )
