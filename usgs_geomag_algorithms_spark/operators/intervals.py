"""Binned interval join: point-in-interval enrichment without a range join.

Spark has no native interval/range join operator — a naive
``points JOIN intervals ON t BETWEEN start AND end`` plans as
BroadcastNestedLoopJoin (O(N·M) compares, driver-sized broadcast) the
moment the equi-keys don't carry enough selectivity.  The standard
distributed fix (Iceberg/GeoSpark/TimescaleDB all use a variant) is
BINNING: intervals explode to the fixed-width bins they cover, points map
to their single bin, and the join becomes an EQUI-join on (keys, bin)
with an exact overlap filter after — a plain hash shuffle, no cross
product.  The reference's closest relative is the instrument-metadata
interval join (``geomagio/api/db/metadata_*``), implemented in
``operators/misc.py`` as a broadcast for dimension-sized metadata; this
operator is the LARGE×LARGE path.

Pair uniqueness by construction: a point has exactly ONE bin and an
interval covers that bin at most once, so no post-join dedup is needed —
each (point, interval) pair appears exactly once.  Overlapping intervals
legitimately yield one output row per containing interval.

Scale shape: interval-side row amplification = span/bin_us per interval
(pick ``bin_us`` near the typical interval length: ~1 exploded row per
interval, and at most ~2 bins per point-side candidate window); both
sides hash-partition on (keys, bin).  A pathological months-long
interval amplifies to months/bin rows — exactly the skewed key AQE
splits; cap or pre-split giant intervals upstream if they dominate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    bin_us: int,
    keys: Sequence[str] = ("user_id",),
    start_col: str = "start_us",
    end_col: str = "end_us",
    ts_col: str = "t_us",
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval of the same key containing it
    (HALF-OPEN ``start <= t < end`` — zero-length intervals match
    nothing).  ``how='left'`` keeps unmatched points with NULL interval
    columns.  Output: all point columns + all interval columns.
    """
    if bin_us <= 0:
        raise ValueError(f"bin_us must be positive, got {bin_us}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = list(keys)
    s, e = F.col(start_col), F.col(end_col)
    # (end-1) div bin is the LAST covered bin under half-open semantics;
    # the where-guard avoids sequence()'s descending start>stop trap for
    # empty intervals (NOTES.md)
    ival = (
        intervals.where(e > s)
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"{start_col} div {int(bin_us)}"),
                    F.expr(f"({end_col} - 1) div {int(bin_us)}"),
                )
            ),
        )
    )
    pts = points.withColumn("_bin", F.expr(f"{ts_col} div {int(bin_us)}"))
    t = F.col(ts_col)
    if how == "inner":
        return (
            pts.join(ival, on=keys + ["_bin"], how="inner")
            .where((t >= s) & (t < e))
            .drop("_bin")
        )
    # left: bin-join inner first, then stitch unmatched points back —
    # a bare left join would keep one NULL row PER UNMATCHED BIN pair
    matched = (
        pts.join(ival, on=keys + ["_bin"], how="inner")
        .where((t >= s) & (t < e))
        .drop("_bin")
    )
    ival_cols = [c for c in ival.columns if c not in keys + ["_bin"]]
    unmatched = (
        pts.drop("_bin")
        .join(
            matched.select(*keys, ts_col).distinct(),
            on=keys + [ts_col],
            how="left_anti",
        )
        .select(
            "*",
            *[F.lit(None).cast(ival.schema[c].dataType).alias(c) for c in ival_cols],
        )
    )
    return matched.unionByName(unmatched)
