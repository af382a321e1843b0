"""Legacy observatory text formats: PCDCP, IMFV122, VBF, TEMP, BinLog.

The reference ships factory/parser/writer shims for several historical
exchange formats (``geomagio/pcdcp/PCDCPParser.py:1-126`` /
``PCDCPWriter.py:1-226``, ``geomagio/imfv122/IMFV122Parser.py:1-142``,
``geomagio/vbf/VBFWriter.py:1-180``, ``geomagio/temperature/
TEMPWriter.py:1-164``, ``geomagio/binlog/BinLogWriter.py:1-233``).  All are
single-file text renderings of a day's 4-channel block.  Re-expressed
Spark-first:

* **Readers** parse with pure Catalyst plans.  A directory of files is the
  unit of parallelism: ``wholetext`` scan -> ``posexplode`` of the line
  array gives a per-file line index (Spark's plain ``text`` scan has no
  order column), per-file header rows are isolated and broadcast-joined
  back onto their data lines.  No Python row loop anywhere.
* **Writers** render data lines with ``format_string`` (JVM codegen) and
  coalesce to one partition per output file, like
  :mod:`..sources.iaga2002` — these are golden-file shims, inherently
  single-file; the partitioned store remains the bulk sink.

Semantics mirrored from the reference (cited per function): sentinel
encodings, fixed widths, multipliers, truncating bin casts, the
prev-reset-on-gap rule in the BinLog change report, and IMFV122's
two-samples-per-line layout and pre-1971 century fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..functions.channels import radians_to_minutes

# PCDCPParser.py:6-9
PCDCP_NINES = 9999999
PCDCP_NINES_RAW = 99999990
PCDCP_NINES_DEG = 9999
# IMFV122Parser.py:8-9
IMF_EIGHTS = 888888.0
IMF_NINES = 999999.0


def _of_day(ts: Column, unit_us: int) -> Column:
    """Minute/second of day for a timestamp column (non-negative -> the
    truncating long cast equals floor division)."""
    return (
        (F.unix_micros(ts) % (86400 * 1_000_000)) / unit_us
    ).cast("long")


def _header_date(ts: Column):
    """``station  year  yearday  DD-Mon-yy`` prefix used by every header
    (PCDCPWriter.py:63-66, VBFWriter.py:56-59, TEMPWriter.py:54-57)."""
    return (
        F.date_format(ts, "yyyy"),
        F.date_format(ts, "DDD"),
        F.date_format(ts, "dd-MMM-yy"),
    )


def _single_file(header: Column, lines: DataFrame, path: str) -> None:
    """Header row + ordered data lines -> one text file."""
    hdr = lines.sparkSession.range(1).select(
        F.lit(None).cast("long").alias("_t"), header.alias("value")
    )
    # NULLs sort first, so the header leads; explicit single-partition sort
    # (union/coalesce alone do not guarantee row order).
    hdr.unionByName(lines.select("_t", "value")).repartition(
        1
    ).sortWithinPartitions("_t").select("value").write.mode(
        "overwrite"
    ).text(path)


# ---------------------------------------------------------------------------
# PCDCP
# ---------------------------------------------------------------------------


def write_pcdcp(
    wide: DataFrame,
    path: str,
    station: str = "BOU",
    channels=("H", "E", "Z", "F"),
    delta_s: int = 60,
    temperatures: bool = False,
    ts_col: str = "t_us",
) -> None:
    """Render a wide frame to PCDCP text.

    Mirrors ``PCDCPWriter`` exactly: minute data keys on minute-of-day
    (``%04d``) with values ``int(round(v*100))`` at width 8 and dead value
    9999999; second data keys on second-of-day (``%05d``) with ``x1000``
    at width 9 and dead 99999990 (PCDCPWriter.py:160-179); temperature
    files multiply by 10 (``:180-181``); a D channel is converted from
    radians to minutes first (``:117-121``); the header carries
    channels + resolution + file version (``:48-95``).
    """
    ts = F.timestamp_micros(F.col(ts_col))
    if delta_s == 1:
        t_fmt, d_fmt, mult, dead = "%05d", "%9d", 1000, PCDCP_NINES_RAW
        day_frac = _of_day(ts, 1_000_000)
        resolution = "0.001nT"
    else:
        t_fmt, d_fmt, mult, dead = "%04d", "%8d", 100, PCDCP_NINES
        day_frac = _of_day(ts, 60_000_000)
        resolution = "0.01nT"
    if temperatures:
        mult, resolution = 10, "Deg-C*10"
        chan_str, version = "  ".join(channels), "1.00"
    else:
        chan_str, version = "".join(channels), "2.00"

    vals = []
    for c in channels:
        v = F.col(c).cast("double")
        if c == "D" and not temperatures:
            v = radians_to_minutes(v)
        # rint = half-to-even, matching the reference's Python round()
        vals.append(
            F.coalesce(
                F.rint(v * mult).cast("long"), F.lit(dead).cast("long")
            )
        )
    lines = wide.select(
        F.format_string(
            " ".join([t_fmt] + [d_fmt] * len(channels)), day_frac, *vals
        ).alias("value"),
        F.col(ts_col).alias("_t"),
    )
    first = F.timestamp_micros(F.lit(wide.agg(F.min(ts_col)).first()[0]))
    year, yday, date = _header_date(first)
    header = F.concat_ws(
        "  ",
        F.lit(station),
        year,
        yday,
        date,
        F.lit(chan_str),
        F.lit(resolution),
        F.lit("File Version " + version),
    )
    _single_file(header, lines, path)


def read_pcdcp(
    spark: SparkSession,
    path: str,
    channels=("H", "E", "Z", "F"),
) -> DataFrame:
    """Parse PCDCP text (a file or directory) into a long frame.

    One Catalyst plan: ``wholetext`` scan keeps a row per file (the
    format's header is per-file state), ``posexplode`` recovers line
    order, the line-0 header is broadcast-joined back onto its file's
    data lines.  Mirrors ``PCDCPParser``: header field split and
    resolution parse (``nT`` suffix vs ``*`` multiplier,
    PCDCPParser.py:79-88), sentinel 9999999/99999990 -> NULL and
    value x resolution (``:100-115``); time is rebuilt from the header's
    year/yearday plus the leading minute-of-day (second-of-day for
    5-digit stamps, the 1-sec layout).
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"),
        F.posexplode(F.split("value", "\r?\n")).alias("_line", "text"),
    )
    raw = raw.where(F.trim("text") != "")
    hdr_fields = F.split(F.trim("text"), r"\s+")
    res_str = hdr_fields.getItem(5)
    headers = raw.where(F.col("_line") == 0).select(
        "_file",
        hdr_fields.getItem(0).alias("station"),
        hdr_fields.getItem(1).cast("int").alias("_year"),
        hdr_fields.getItem(2).cast("int").alias("_yday"),
        F.when(
            res_str.contains("nT"),
            F.split(res_str, "nT").getItem(0).cast("double"),
        )
        .otherwise(F.split(res_str, r"\*").getItem(1).cast("double"))
        .alias("_res"),
    )
    fields = F.split(F.trim("text"), r"\s+")
    data = raw.where(F.col("_line") > 0).select(
        "_file",
        fields.getItem(0).alias("_tod"),
        *[
            fields.getItem(i + 1).cast("double").alias(c)
            for i, c in enumerate(channels)
        ],
    )
    joined = data.join(F.broadcast(headers), "_file")
    midnight = (
        F.unix_micros(
            F.to_timestamp(F.format_string("%04d-01-01", F.col("_year")))
        )
        + (F.col("_yday") - 1) * F.lit(86400 * 1_000_000)
    )
    # 4-digit stamps are minutes of day (1-min data), 5-digit are seconds
    tod_us = F.when(
        F.length("_tod") >= 5, F.col("_tod").cast("long") * 1_000_000
    ).otherwise(F.col("_tod").cast("long") * 60_000_000)
    cols = [
        "station",
        (midnight + tod_us).alias("t_us"),
    ]
    for c in channels:
        v = F.col(c)
        cols.append(
            F.when(v.isin(float(PCDCP_NINES), float(PCDCP_NINES_RAW)), None)
            .otherwise(v * F.col("_res"))
            .alias(c)
        )
    return joined.select(*cols)


# ---------------------------------------------------------------------------
# IMFV122
# ---------------------------------------------------------------------------


def read_imfv122(spark: SparkSession, path: str) -> DataFrame:
    """Parse INTERMAGNET IMFV1.22 text into a long wide-channel frame.

    The format interleaves block headers with data lines holding TWO
    consecutive samples of four channels (``d11 d21 d31 d41 d12 d22 d32
    d42`` — IMFV122Parser.py:104-122).  Spark-first: per-file
    ``posexplode`` line numbering; header lines are those starting with
    the file's station (the content's first three bytes, ``:53-57``);
    every data line is matched to the nearest preceding header with a
    running ``last(..., ignorenulls)`` window per file, then its two
    samples are exploded with their minute offsets.  Windows partition by
    file — a directory of day-files is the scale axis, matching the
    reference's one-stream-per-file model.

    Header semantics mirrored from ``:66-101``: channel letters from the
    components field, two-digit year + pre-1971 century fold, HH vs
    minute-of-day start stamps, colatitude/longitude /10, declination
    base; value scaling from ``:124-140``: 888888/999999 -> NULL, D / 100
    (to minutes), others / 10.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"),
        F.substring("value", 1, 3).alias("_station"),
        F.posexplode(F.split("value", "\r?\n")).alias("_line", "text"),
    )
    raw = raw.where(F.trim("text") != "")
    is_header = F.col("text").startswith(F.col("_station"))
    h = F.split(F.trim("text"), r"\s+")
    year2 = F.substring(h.getItem(1), -2, 2).cast("int")
    year = F.when(year2 + 1900 < 1971, year2 + 2000).otherwise(year2 + 1900)
    start = h.getItem(3)
    hour = F.when(F.length(start) == 2, start.cast("int")).otherwise(
        start.cast("int") / 60
    ).cast("int")
    minute = F.when(F.length(start) == 2, F.lit(0)).otherwise(
        start.cast("int") % 60
    )
    block_start = (
        F.unix_micros(F.to_timestamp(F.format_string("%04d-01-01", year)))
        + (h.getItem(2).cast("int") - 1) * F.lit(86400 * 1_000_000)
        + hour * F.lit(3_600_000_000)
        + minute * F.lit(60_000_000)
    )
    annotated = raw.select(
        "_file",
        "_line",
        "text",
        F.when(is_header, block_start).alias("_hdr_start"),
        F.when(is_header, h.getItem(4)).alias("_hdr_chans"),
        F.when(is_header, F.col("_line")).alias("_hdr_line"),
        F.when(is_header, h.getItem(6)).alias("_hdr_gin"),
        F.when(is_header, h.getItem(8).cast("int")).alias("_hdr_decbas"),
        F.when(
            is_header,
            F.substring(h.getItem(7), 1, 4).cast("double") / 10,
        ).alias("_hdr_lat"),
        F.when(
            is_header,
            F.substring(h.getItem(7), 5, 10).cast("double") / 10,
        ).alias("_hdr_lon"),
        is_header.alias("_is_hdr"),
    )
    w = (
        Window.partitionBy("_file")
        .orderBy("_line")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = annotated.select(
        "_file",
        "_line",
        "text",
        "_is_hdr",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c.lstrip("_"))
            for c in (
                "_hdr_start",
                "_hdr_chans",
                "_hdr_line",
                "_hdr_gin",
                "_hdr_decbas",
                "_hdr_lat",
                "_hdr_lon",
            )
        ],
    )
    d = F.split(F.trim("text"), r"\s+")
    # line k of a block (0-based) holds samples 2k and 2k+1; the
    # reference advances a 60 s cursor per sample for BOTH cadences
    # (IMFV122Parser.py:96-101 sets delta=60 in each branch) — mirrored.
    data = carried.where(~F.col("_is_hdr")).select(
        "_file",
        "hdr_chans",
        "hdr_gin",
        "hdr_decbas",
        "hdr_lat",
        "hdr_lon",
        (
            F.col("hdr_start")
            + (F.col("_line") - F.col("hdr_line") - 1) * 2 * 60_000_000
        ).alias("_t0"),
        *[d.getItem(i).cast("double").alias(f"_v{i}") for i in range(8)],
    )
    sample = F.explode(
        F.array(
            F.struct(
                F.lit(0).alias("off"),
                *[F.col(f"_v{i}").alias(f"c{i}") for i in range(4)],
            ),
            F.struct(
                F.lit(1).alias("off"),
                *[F.col(f"_v{i + 4}").alias(f"c{i}") for i in range(4)],
            ),
        )
    ).alias("s")
    exploded = data.select(
        "hdr_chans",
        "hdr_gin",
        "hdr_decbas",
        "hdr_lat",
        "hdr_lon",
        "_t0",
        sample,
    )
    chan_val = F.explode(
        F.array(
            *[
                F.struct(
                    F.substring("hdr_chans", i + 1, 1).alias("channel"),
                    F.col(f"s.c{i}").alias("raw"),
                )
                for i in range(4)
            ]
        )
    ).alias("cv")
    long = exploded.select(
        (F.col("_t0") + F.col("s.off") * 60_000_000).alias("t_us"),
        F.col("hdr_gin").alias("gin"),
        F.col("hdr_decbas").alias("declination_base"),
        F.col("hdr_lat").alias("geodetic_latitude"),
        F.col("hdr_lon").alias("geodetic_longitude"),
        chan_val,
    )
    raw_v = F.when(
        F.col("cv.raw").isin(IMF_EIGHTS, IMF_NINES), None
    ).otherwise(F.col("cv.raw"))
    return long.select(
        "t_us",
        F.col("cv.channel").alias("channel"),
        F.when(F.col("cv.channel") == "D", raw_v / 100)
        .otherwise(raw_v / 10)
        .alias("value"),
        "gin",
        "declination_base",
        "geodetic_latitude",
        "geodetic_longitude",
    )


# ---------------------------------------------------------------------------
# VBF / TEMP / BinLog
# ---------------------------------------------------------------------------

_VDEAD = 99.999999
_BDEAD = 999


def _volt_bin_cols(channels) -> list[Column]:
    """Alternating volt/bin rendering (VBFWriter.py:139-157): volts are
    value/1000 at ``%10.6f`` (dead 99.999999), bins truncate to int at
    ``%4d`` (dead 999)."""
    cols = []
    for i, c in enumerate(channels):
        v = F.col(c).cast("double")
        if i % 2 == 0:
            cols.append(F.coalesce(v / 1000.0, F.lit(_VDEAD)))
        else:
            cols.append(
                F.coalesce(v.cast("int"), F.lit(_BDEAD))
            )
    return cols


def write_vbf(
    wide: DataFrame,
    path: str,
    station: str = "BOU",
    channels=("Hvolt", "Hbin", "Evolt", "Ebin", "Zvolt", "Zbin"),
    ts_col: str = "t_us",
) -> None:
    """Volt/bin file: ``SSSSS`` second-of-day + three volt/bin pairs
    (VBFWriter.py:119-158); header lists the fixed channel set and
    Version 1.0 (``:41-71``)."""
    ts = F.timestamp_micros(F.col(ts_col))
    sec_of_day = _of_day(ts, 1_000_000)
    lines = wide.select(
        F.format_string(
            "%05d %10.6f %4d %10.6f %4d %10.6f %4d",
            sec_of_day,
            *_volt_bin_cols(channels),
        ).alias("value"),
        F.col(ts_col).alias("_t"),
    )
    first = F.timestamp_micros(F.lit(wide.agg(F.min(ts_col)).first()[0]))
    year, yday, date = _header_date(first)
    header = F.concat_ws(
        "  ",
        F.lit(station),
        year,
        yday,
        date,
        F.lit("Hvolt Hbin Evolt Ebin Zvolt Zbin Version 1.0"),
    )
    _single_file(header, lines, path)


def write_temp(
    wide: DataFrame,
    path: str,
    station: str = "BOU",
    channels=("T1", "T2", "T3", "T4", "V1"),
    ts_col: str = "t_us",
) -> None:
    """Temperature/volt file: ``MMMM`` minute-of-day + five ``x10``
    integer values, dead 9999 (TEMPWriter.py:116-141); header carries the
    channel list and Deg-C*10/volts*10 units (``:39-70``)."""
    ts = F.timestamp_micros(F.col(ts_col))
    min_of_day = _of_day(ts, 60_000_000)
    vals = [
        F.coalesce(
            F.rint(F.col(c).cast("double") * 10).cast("long"),
            F.lit(PCDCP_NINES_DEG).cast("long"),
        )
        for c in channels
    ]
    lines = wide.select(
        F.format_string(
            "%04d " + " ".join(["%5d"] * len(channels)), min_of_day, *vals
        ).alias("value"),
        F.col(ts_col).alias("_t"),
    )
    first = F.timestamp_micros(F.lit(wide.agg(F.min(ts_col)).first()[0]))
    year, yday, date = _header_date(first)
    header = F.concat_ws(
        "  ",
        F.lit(station),
        year,
        yday,
        date,
        F.lit(" ".join(channels) + " Deg-C*10/volts*10  File Version 1.00"),
    )
    _single_file(header, lines, path)


def binlog_changes(
    wide: DataFrame,
    components=("H", "E", "Z"),
    ts_col: str = "t_us",
    series_cols=("station",),
) -> DataFrame:
    """Bin-change detection as a DataFrame: one row per (component,
    change-time) with previous/current bin and voltage.

    Distributed form of ``BinLogWriter._format_values``
    (BinLogWriter.py:141-216): per component, current volt/bin are
    deadened (NaN -> 99.999999 / 999) and compared with a 1-row lag over
    the series' time order; a change is emitted only when both current
    and previous bins are live (!=999) and differ.  The lag carries the
    *deadened* previous values, so a gap row resets the baseline and
    suppresses the following comparison — the reference's prev-array
    behavior, preserved bit-for-bit.  Partitioned by the series columns
    (one station-day per file in the reference; here any number of
    series scale out).
    """
    per_comp = []
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    for c in components:
        volt = F.coalesce(
            F.col(f"{c}volt").cast("double") / 1000.0, F.lit(_VDEAD)
        )
        bin_ = F.coalesce(F.col(f"{c}bin").cast("int"), F.lit(_BDEAD))
        df = wide.select(
            *series_cols,
            F.col(ts_col),
            F.lit(c).alias("component"),
            volt.alias("volt"),
            bin_.alias("bin"),
        ).select(
            "*",
            F.lag("volt").over(w).alias("prev_volt"),
            F.lag("bin").over(w).alias("prev_bin"),
        )
        per_comp.append(
            df.where(
                (F.col("bin") != _BDEAD)
                & (F.col("prev_bin") != _BDEAD)
                & (F.col("bin") != F.col("prev_bin"))
            )
        )
    out = per_comp[0]
    for df in per_comp[1:]:
        out = out.unionByName(df)
    return out


def write_binlog(
    wide: DataFrame,
    path: str,
    station: str = "BOU",
    components=("H", "E", "Z"),
    ts_col: str = "t_us",
) -> None:
    """Render the bin-change report (BinLogWriter.py:46-62,141-216):
    header with start/end day, a column-caption line, then changes
    grouped by component (H, E, Z) separated by blank lines — or the
    no-changes marker."""
    bounds = wide.agg(F.min(ts_col), F.max(ts_col)).first()
    spark = wide.sparkSession
    fmt = F.date_format(F.timestamp_micros(F.lit(bounds[0])), "dd-MMM-yy")
    end = F.date_format(F.timestamp_micros(F.lit(bounds[1])), "dd-MMM-yy")
    header = F.concat(
        F.lit(f"Bin Change Report: {station}  Start Day: "),
        fmt,
        F.lit(" End Day: "),
        end,
    )
    changes = binlog_changes(
        wide.withColumn("station", F.lit(station)),
        components=components,
        ts_col=ts_col,
    )
    ts = F.timestamp_micros(F.col(ts_col))
    sec_of_day = _of_day(ts, 1_000_000)
    rendered = changes.select(
        F.col("component"),
        F.col(ts_col).alias("_t"),
        F.format_string(
            "%3s %s (%05d)  %4d to %4d  %10.6f to %10.6f",
            F.concat(F.lit("("), "component", F.lit(")")),
            F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
            sec_of_day,
            "prev_bin",
            "bin",
            "prev_volt",
            "volt",
        ).alias("value"),
    ).collect()
    lines = [r["value"] for r in sorted(rendered, key=lambda r: r["_t"])]
    body = []
    if lines:
        body.append(" C  Date       Time     DaySec     Bin change    Voltage change")
        for comp in components:
            body.extend(
                r["value"]
                for r in sorted(rendered, key=lambda r: r["_t"])
                if r["component"] == comp
            )
            if comp != components[-1]:
                body.append("")
    else:
        body.append("*** No Bin Changes Found ***")
    hdr_val = spark.range(1).select(header.alias("value")).first()[0]
    rows = [(hdr_val,), ("",)] + [(b,) for b in body]
    spark.createDataFrame(rows, schema="value string").coalesce(
        1
    ).write.mode("overwrite").text(path)
