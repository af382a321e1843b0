"""Calendar-month retention tier: variable-width boxcar over day samples.

The reference names a ``month`` interval (``geomagio/geomag_types.py:3``,
used by I/O naming) but its fixed-width ``Step`` machinery stops at day.
This operator extends the cascade one tier up with the same semantics
generalized to variable-length intervals:

- input: day-tier samples (center-stamped ``11:59:30``, i.e. day start +
  ``(86400-60)/2`` s — ``geomagio/TimeseriesUtility.py:49-57``);
- output: one sample per calendar month = mean of the month's *valid* day
  samples (uniform weights ⇒ the masked-renormalized dot of
  ``FilterAlgorithm.firfilter:343-392`` reduces to the mean of valid);
- the 10% rule against the month's true day count: NULL when
  ``n_valid/days_in_month < 0.9`` (integer predicate, no fp boundary);
- center-stamped by the same ``(delta-60)/2`` shift with ``delta`` = the
  month's length: ``month_start + (days*86400-60)/2`` s (31-day months at
  day 16 11:29:30, 30-day at day 15 23:59:30).

Plan shape matches the fixed-width average path of ``rollup_step``: one
``groupBy(series, month_anchor)`` with map-side partial aggregation —
shuffle bounded by output cardinality (≤ 1/28th of the day tier).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

US = 1_000_000
DAY_US = 86_400 * US
#: day-tier center-stamp offset from day start: (86400-60)/2 s
DAY_STAMP_OFF_US = 43_170 * US


def month_stamp_us(month_start_us: int, n_days: int) -> int:
    """Center stamp of a calendar month: start + (days*86400-60)/2 s — the
    ONE place the stamp arithmetic lives (``month_stamp_col`` is its one
    Spark mirror; parity asserted in tests)."""
    return month_start_us + (43_200 * n_days - 30) * US


def month_stamp_col(t_us):
    """Column form of :func:`month_stamp_us` for any epoch-us timestamp
    column: the center stamp of the calendar month containing it. Shared
    by ``rollup_month`` and the refresh gap audit so the stamp convention
    has exactly one Spark expression."""
    m0 = F.unix_micros(F.date_trunc("MONTH", F.timestamp_micros(t_us)))
    n_days = F.dayofmonth(F.last_day(F.timestamp_micros(m0))).cast("long")
    return (m0 + n_days * F.lit(43_200 * US) - F.lit(30 * US)).cast("long")


def months_in_range(start_us: int, end_us: int) -> list[tuple[int, int, int]]:
    """(month_start_us, n_days, stamp_us) for every calendar month whose
    center stamp lies in [start_us, end_us]. Driver-side: tiny. The
    canonical month enumeration used by serving and refresh."""
    import datetime as _dt

    utc = _dt.timezone.utc
    dt = _dt.datetime.fromtimestamp(start_us / 1e6, tz=utc)
    cur = _dt.datetime(dt.year, dt.month, 1, tzinfo=utc)
    out: list[tuple[int, int, int]] = []
    while True:
        nxt = _dt.datetime(
            cur.year + (cur.month == 12), cur.month % 12 + 1, 1, tzinfo=utc
        )
        n_days = (nxt - cur).days
        m0 = int(cur.timestamp() * 1e6)
        stamp = month_stamp_us(m0, n_days)
        if stamp > end_us:
            break
        if stamp >= start_us:
            out.append((m0, n_days, stamp))
        cur = nxt
    return out


def rollup_month(
    df: DataFrame,
    range_start_us: int | None = None,
    range_end_us: int | None = None,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    emit_coverage: bool = False,
) -> DataFrame:
    """Roll a day-tier frame into calendar-month samples.

    ``range_start_us``/``range_end_us`` bound the scanned day-tier
    coverage; a month is emitted only when its full day-stamp window
    (first day's 11:59:30 through last day's 11:59:30) lies inside the
    range — absent/NULL days inside an eligible month count against the
    10% rule, exactly like minutes inside an hour window.
    """
    series_cols = list(series_cols)
    t = F.col(ts_col)
    v = F.col(value_col)
    valid = v.isNotNull() & ~F.isnan(v)

    if range_start_us is None or range_end_us is None:
        lo, hi = df.select(F.min(t).alias("lo"), F.max(t).alias("hi")).first()
        if lo is None:
            empty_cols = [
                *series_cols,
                t.cast("long").alias(ts_col),
                v.cast("double").alias(value_col),
            ]
            if emit_coverage:
                empty_cols += [
                    F.lit(0.0).alias("weight_sum"),
                    F.lit(0).cast("long").alias("n_valid"),
                ]
            return df.select(*empty_cols).limit(0)
        range_start_us = range_start_us if range_start_us is not None else lo
        range_end_us = range_end_us if range_end_us is not None else hi

    # month anchor = epoch us of the month containing the day stamp
    # (UTC session timezone pinned in session.py)
    anchor = F.unix_micros(F.date_trunc("MONTH", F.timestamp_micros(t)))
    grouped = (
        df.where(t.between(int(range_start_us), int(range_end_us)))
        .groupBy(*series_cols, anchor.alias("_m0"))
        .agg(
            F.sum(F.when(valid, v)).alias("_vsum"),
            F.count(F.when(valid, True)).alias("_nvalid"),
        )
    )
    m0_ts = F.timestamp_micros(F.col("_m0"))
    n_days = F.dayofmonth(F.last_day(m0_ts)).cast("long")
    ok = F.col("_nvalid") * 10 >= n_days * 9
    first_stamp = F.col("_m0") + F.lit(DAY_STAMP_OFF_US)
    last_stamp = F.col("_m0") + (n_days - 1) * F.lit(DAY_US) + F.lit(DAY_STAMP_OFF_US)
    eligible = (first_stamp >= F.lit(int(range_start_us))) & (
        last_stamp <= F.lit(int(range_end_us))
    )
    # center stamp: month_start + (days*86400 - 60)/2 s = 43200*days - 30 s
    stamp = F.col("_m0") + (n_days * F.lit(43_200 * US) - F.lit(30 * US))
    out_cols = [
        *series_cols,
        stamp.cast("long").alias(ts_col),
        F.when(ok, F.col("_vsum") / F.col("_nvalid")).cast("double").alias(value_col),
    ]
    if emit_coverage:
        out_cols += [
            (F.col("_nvalid") / n_days.cast("double")).alias("weight_sum"),
            F.col("_nvalid").cast("long").alias("n_valid"),
        ]
    return grouped.where(eligible).select(*out_cols)
