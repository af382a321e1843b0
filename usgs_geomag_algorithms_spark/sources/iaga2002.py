"""IAGA2002 fixed-width text format: scan + sink shim.

The reference parses/writes IAGA2002 as its golden-file interchange format
(``geomagio/iaga2002/IAGA2002Parser.py:53-250``, ``IAGA2002Writer.py:26-303``).
The engine needs it only as a comparison fixture/serving shim, so this is a
compact subset: 4-channel data blocks, sentinel 99999/88888 -> NULL
(``IAGA2002Parser.py:7-9,183-184``), 2-decimal fixed-width values.

Scan path is a real Spark plan: ``spark.read.text`` + substring/split
projections (header lines filtered by prefix) — no Python row loop. The
writer renders with ``format_string`` and coalesces to one partition (text
golden files are inherently single-file)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SENTINELS = (99999.0, 99999.99, 88888.0, 88888.88)


def write_iaga2002(
    wide: DataFrame,
    path: str,
    station: str = "BOU",
    channels=("H", "E", "Z", "F"),
    ts_col: str = "t_us",
) -> None:
    """Render a wide 4-channel frame to IAGA2002-style text (one file)."""
    iaga2002_lines(wide, station, channels, ts_col).coalesce(
        1
    ).write.mode("overwrite").text(path)


def iaga2002_lines(
    wide: DataFrame,
    station: str = "BOU",
    channels=("H", "E", "Z", "F"),
    ts_col: str = "t_us",
) -> DataFrame:
    """IAGA2002 text as an ordered one-column DataFrame (header + data
    lines) — the response body of the /data endpoint's text rendering;
    :func:`write_iaga2002` is this plus a single-file text sink."""
    ts = F.timestamp_micros(F.col(ts_col))
    # the reference's exact data layout (IAGA2002Writer._format_values,
    # IAGA2002Writer.py:264-275): "...DOY   " then " %9.2f" per channel,
    # so values land in the fixed-width parser's [31:40]/[41:50]/[51:60]/
    # [61:70] slices (IAGA2002Parser.py:160-165)
    vals = [
        F.format_string(
            " %9.2f", F.coalesce(F.col(c).cast("double"), F.lit(99999.00))
        )
        for c in channels
    ]
    header = [
        " Format                 IAGA-2002                                    |",
        f" Station                {station}                                          |",
        "DATE       TIME         DOY     "
        + "".join(f"{station + c:>10s}" for c in channels)
        + "   |",
    ]
    lines = wide.select(
        F.concat(
            F.date_format(ts, "yyyy-MM-dd"),
            F.lit(" "),
            F.date_format(ts, "HH:mm:ss.SSS"),
            F.lit(" "),
            F.format_string("%3s", F.date_format(ts, "DDD")),
            F.lit("   "),
            *vals,
        ).alias("value"),
        F.col(ts_col).alias("_t"),
    ).orderBy("_t").select("value")
    hdr = lines.sparkSession.createDataFrame(
        [(h,) for h in header], schema="value string"
    )
    return hdr.unionByName(lines)


def read_iaga2002(
    spark: SparkSession,
    path: str,
    station: str = "BOU",
    channels=("H", "E", "Z", "F"),
) -> DataFrame:
    """Parse IAGA2002-style text back into a wide frame (sentinels->NULL)."""
    raw = spark.read.text(path)
    data = raw.where(F.col("value").rlike(r"^\d{4}-\d{2}-\d{2} "))
    date = F.substring("value", 1, 10)
    timec = F.substring("value", 12, 12)
    ts = F.to_timestamp(F.concat(date, F.lit(" "), timec), "yyyy-MM-dd HH:mm:ss.SSS")
    cols = [F.unix_micros(ts).alias("t_us")]
    # the reference parser's fixed-width slices: line[31:40], [41:50],
    # [51:60], [61:70] (IAGA2002Parser.py:160-165; substring is 1-based)
    for i, c in enumerate(channels):
        v = F.trim(F.substring("value", 32 + i * 10, 9)).cast("double")
        cols.append(
            F.when(v.isin(*[F.lit(s) for s in SENTINELS]), None)
            .otherwise(v)
            .alias(c)
        )
    return data.select(*cols).withColumn("station", F.lit(station))
