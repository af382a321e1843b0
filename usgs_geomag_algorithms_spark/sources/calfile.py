"""CAL calibration-file writer — ``geomagio/residual/CalFileFactory.py`` /
``geomagio/processing/magproc.py:71-89`` (``make_cal.py``) parity.

The reference formats a year of absolute measurements into MagProc's CAL
text: grouped by date, elements ordered H then D then Z, measurements
ordered by start time, D values converted to minutes, each line
``HHMM-HHMM c{baseline:9.2f}{absolute:9.2f}``.

Here the whole rendering is ONE Catalyst plan over an absolutes
DataFrame (``cal_lines`` — line text + sort key as columns), so the
formatter scales to any number of observatory-years and the text output
is itself a DataFrame (API response body / distributed sink).
``format_cal``/``write_cal_file`` collect the final string driver-side —
a year of calibration sessions is a few hundred lines, the reference's
own file granularity.

Rounding note: the reference renders with Python ``%9.2f`` — round-half-
even on the EXACT binary double. Spark's ``format_string`` delegates to
``java.util.Formatter`` (HALF_UP: 0.125 -> 0.13, Python writes 0.12) and
``bround`` half-evens the double's shortest DECIMAL repr (2.135 -> 2.14,
Python sees 2.13499... -> 2.13). Neither matches, so the value is first
snapped to integer cents with explicit floor/frac half-even arithmetic,
then formatted — identical to Python at exact binary ties AND repr ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cents_half_even(col: Column) -> Column:
    """round(value*100) with ties-to-even on the scaled double — Python's
    ``%.2f`` behavior (modulo sub-ULP cases where the *100 scaling itself
    crosses a tie, unreachable from 9-char measurement inputs)."""
    y = col * 100
    f = F.floor(y)
    frac = y - f
    return (
        F.when(frac > 0.5, f + 1)
        .when(frac < 0.5, f)
        .otherwise(f + F.pmod(f, F.lit(2)))
        .cast("long")
    )

def _cal_value(col: Column) -> Column:
    """The double handed to ``%9.2f``: half-even integer cents / 100, with
    the negative-zero edge preserved — Python renders a value in (-0.005, 0]
    with a negative sign ('    -0.00') when the input is negative(-signed),
    and ``col * 0.0`` keeps exactly that sign onto the zero cents."""
    cents = _cents_half_even(col)
    return F.when(cents == 0, col * 0.0).otherwise(cents / 100.0)


#: the CAL element emission order within a date (CalFileFactory.py:33)
_ELEMENT_ORDER = {"H": 0, "D": 1, "Z": 2}


def cal_lines(
    absolutes: DataFrame,
    element_col: str = "element",
    absolute_col: str = "absolute",
    baseline_col: str = "baseline",
    start_us_col: str = "start_us",
    end_us_col: str = "end_us",
) -> DataFrame:
    """Render absolutes to CAL text lines with an explicit sort key.

    Input: one row per absolute with element H/D/Z, absolute/baseline in
    degrees (D) or nT (H/Z), and session start/end epoch-µs. Invalid
    rows (NULL absolute or baseline — ``Absolute.is_valid``,
    Absolute.py:32-38) and non-HDZ elements are dropped, exactly like
    the reference's filter.

    Output columns: ``(date, elem_idx, rank, t_key, line)`` sorted by
    the first four = the file's line order; headers carry ``rank = 0``
    (measurements ``rank = 1``) so they sort first regardless of
    ``t_key`` — a sentinel t_key would collide with pre-1970 epoch
    microseconds, which are negative."""
    el = F.col(element_col)
    valid = (
        absolutes.where(
            F.col(absolute_col).isNotNull()
            & F.col(baseline_col).isNotNull()
            & el.isin(list(_ELEMENT_ORDER))
        )
        .select(
            F.date_format(
                F.timestamp_micros(F.col(start_us_col)), "yyyy MM dd"
            ).alias("date"),
            el.alias("_el"),
            # D renders in minutes (CalFileFactory.py:42-44)
            *[
                F.when(el == "D", F.col(c) * 60)
                .otherwise(F.col(c))
                .alias(c)
                for c in (baseline_col, absolute_col)
            ],
            F.col(start_us_col).alias("_s"),
            F.col(end_us_col).alias("_e"),
        )
        .withColumn(
            "elem_idx",
            F.when(F.col("_el") == "H", 0)
            .when(F.col("_el") == "D", 1)
            .otherwise(2),
        )
    )
    measurement = valid.select(
        "date",
        "elem_idx",
        F.lit(1).alias("rank"),
        F.col("_s").alias("t_key"),
        F.format_string(
            "%s-%s c%9.2f%9.2f",
            F.date_format(F.timestamp_micros(F.col("_s")), "HHmm"),
            F.date_format(F.timestamp_micros(F.col("_e")), "HHmm"),
            _cal_value(F.col(baseline_col)),
            _cal_value(F.col(absolute_col)),
        ).alias("line"),
    )
    header = (
        valid.groupBy("date", "elem_idx", "_el")
        .agg(F.lit(1).alias("_one"))
        .select(
            "date",
            "elem_idx",
            F.lit(0).alias("rank"),
            F.lit(0).cast("long").alias("t_key"),
            F.format_string("--%s (%s)", F.col("date"), F.col("_el")).alias(
                "line"
            ),
        )
    )
    return measurement.unionByName(header).orderBy(
        "date", "elem_idx", "rank", "t_key"
    )


def format_cal(absolutes: DataFrame, **cols) -> str:
    """The full CAL file body (trailing newline included,
    CalFileFactory.py:49-50)."""
    rows = cal_lines(absolutes, **cols).select("line").collect()
    return "".join(r.line + "\n" for r in rows) + "\n"


def write_cal_file(absolutes: DataFrame, path: str, **cols) -> None:
    """``magproc.write_cal_file`` / ``CalFileFactory.write_file`` analog:
    render and write one observatory-year CAL file."""
    import os

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        f.write(format_cal(absolutes, **cols).encode())
