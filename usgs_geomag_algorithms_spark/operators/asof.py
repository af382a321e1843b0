"""As-of join: enrich each left-side event with the most recent right-side
row at-or-before its timestamp, per key.

Generalizes the reference's nearest-sample lookup
(``geomagio/TimeseriesUtility.py`` get_trace_value — see
operators/misc.py:85) from one probe timestamp to a full stream of them —
the canonical time-series enrichment join (quote-for-trade, config-for-
event, profile-for-action).

Spark-first plan — the UNION-AND-CARRY pattern, not a range join:
a naive ``left.ts >= right.ts`` theta-join explodes to O(|L|·|R|) per key
before aggregation prunes it. Instead both sides are unioned into one
stream tagged by side, sorted within each key partition by (ts, side), and
the right row's payload is carried forward with a running
``last(..., ignorenulls)`` window — one shuffle on the key, linear work,
no row amplification. The frame is [unbounded preceding, current row],
cumulative — Spark evaluates it in a single forward pass per partition.

Ordering puts the right row BEFORE the left row at equal timestamps, so an
exactly-simultaneous right row IS visible (ts_right <= ts_left semantics,
matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` which this operator is
oracle-checked against). Multiple right rows on one (key, ts) are reduced
to the last by tie-break column first — as-of would otherwise be
nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "t_us",
    right_cols: Sequence[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's ``ts_col``, matching on the ``on`` keys.

    ``right_cols``: right payload columns to carry (default: all non-key,
    non-ts columns). Carried columns are suffixed with ``suffix``; the
    right row's timestamp arrives as ``{ts_col}{suffix}`` (NULL when no
    right row precedes the left row). ``tie_col`` deterministically picks
    among right rows sharing one (key, ts): the max ``tie_col`` wins.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, ts_col)]
    right_cols = list(right_cols)

    r = right.select(*on, ts_col, *right_cols)
    if tie_col is not None:
        w_tie = Window.partitionBy(*on, ts_col).orderBy(F.col(tie_col).desc())
        r = (
            r.withColumn("_rn", F.row_number().over(w_tie))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    # the whole right payload travels as ONE struct: carrying columns
    # independently with last(ignorenulls) would stitch together fields
    # from different right rows whenever a payload field is NULL
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(ts_col).cast("long").alias("_rts"),
    )
    left_cols = list(left.columns)
    payload_type = r.select(payload.alias("_p")).schema["_p"].dataType
    tagged = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_p"),
    ).unionByName(
        r.select(
            *on,
            ts_col,
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left_cols
                if c not in (*on, ts_col)
            ],
            F.lit(0).alias("_side"),
            payload.alias("_p"),
        )
    )
    # right rows sort before left rows at equal ts => <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        *left_cols,
        "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return enriched.where(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_p.{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("_p._rts").alias(f"{ts_col}{suffix}"),
    )
