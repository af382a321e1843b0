"""One-pass table profiling (the pre-ingest audit).

Before a 100 TB build, the first question is always "what is actually
in this table?" — null rates, cardinalities, value/length ranges per
column.  `df.summary()` answers some of it but is float-formatted and
not oracle-checkable; this operator emits an all-exact profile:

* ONE aggregate pass computes every column's statistics side by side
  (Catalyst plans the multi-count-distinct via a single Expand — one
  scan, one shuffle, output bounded by 1 row);
* the per-column layout is then unpivoted driver-free with ``stack``
  into (column, n_rows, n_null, n_distinct, min_num, max_num, min_len,
  max_len, sum_len) — integers and stored min/max values only (no
  means, no stddev), so every cell is bit-exact in any engine.

Numeric columns report min/max as DOUBLE (stored values, no
arithmetic) and NULL lengths; string columns report length stats and
NULL min/max (cross-engine float→string rendering differs, so values
are never stringified).  Timestamps profile as epoch-µs integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
)


def profile_table(df: DataFrame, columns=None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_num, max_num, min_len,
    max_len, sum_len) — one row per profiled column, one scan."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(col.cast("timestamp")).cast("double")
        elif isinstance(dt, _NUMERIC):
            num = col.cast("double")
        else:
            num = F.lit(None).cast("double")
        is_str = isinstance(dt, T.StringType)
        ln = F.length(col) if is_str else F.lit(None).cast("int")
        aggs += [
            F.count(col).cast("long").alias(f"{c}__nn"),
            F.count_distinct(col).cast("long").alias(f"{c}__nd"),
            F.min(num).alias(f"{c}__mn"),
            F.max(num).alias(f"{c}__mx"),
            F.min(ln).cast("long").alias(f"{c}__ln"),
            F.max(ln).cast("long").alias(f"{c}__lx"),
            F.sum(ln).cast("long").alias(f"{c}__ls"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__ln, {c}__lx,"
        f" {c}__ls"
        for c in cols
    )
    return one.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS"
            " (column, n_notnull, n_distinct, min_num, max_num,"
            " min_len, max_len, sum_len)"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).cast("long").alias("n_null"),
        "n_distinct",
        "min_num",
        "max_num",
        "min_len",
        "max_len",
        "sum_len",
    )
