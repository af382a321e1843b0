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


# ---------------------------------------------------------------------------
# header / comment metadata — IAGA2002Parser parity
# (test vectors: test/iaga2002_test/IAGA2002Parser_test.py)
# ---------------------------------------------------------------------------

#: required-header key mapping (``_parse_header``, IAGA2002Parser.py:81-120)
_HEADER_KEYS = {
    "SOURCE OF DATA": "agency_name",
    "STATION NAME": "station_name",
    "IAGA CODE": "station",
    "GEODETIC LATITUDE": "geodetic_latitude",
    "GEODETIC LONGITUDE": "geodetic_longitude",
    "ELEVATION": "elevation",
    "SENSOR ORIENTATION": "sensor_orientation",
    "DATA INTERVAL TYPE": "data_interval_type",
    "DATA TYPE": "data_type",
}


def parse_header_line(line: str) -> tuple[str, str]:
    """Header name/value split at the reference's fixed columns
    (``_parse_header``: key = line[1:24], value = line[24:69])."""
    return line[1:24].strip(), line[24:69].strip()


def parse_comment_line(line: str) -> str:
    """Strip the ``' # '`` prefix and trailing-pipe padding
    (``_parse_comment``: line[2:69])."""
    return line[2:69].strip()


def parse_channels_line(line: str, iaga_code: str) -> list[str]:
    """Channel names from the data-header line, IAGA code prefix removed
    (``_parse_channels``: 10-char slices from column 30)."""
    return [
        line[lo:hi].strip().replace(iaga_code, "")
        for lo, hi in ((30, 40), (40, 50), (50, 60), (60, 69))
    ]


def merge_comments(comments: list[str]) -> list[str]:
    """Combine multi-line period-delimited comments (``_merge_comments``,
    IAGA2002Parser.py:223-250): lines accumulate until one ends with a
    period; an unterminated tail is kept as-is."""
    merged: list[str] = []
    partial = None
    for comment in comments:
        partial = comment if partial is None else partial + " " + comment
        if partial.endswith("."):
            merged.append(partial)
            partial = None
    if partial is not None:
        merged.append(partial)
    return merged


def read_iaga2002_meta(spark: SparkSession, path: str) -> dict:
    """Parse the header region of an IAGA2002 file into the reference's
    metadata dict: raw ``headers``, mapped required keys, merged
    ``comments``, comment-embedded values (``declination_base`` from
    DECBAS, ``conditions_of_use``, ``filter_comments``,
    ``is_intermagnet``/``is_gin``), and ``channels``
    (``parse``/``_post_process``/``parse_comments``,
    IAGA2002Parser.py:53-222).

    Headers are a bounded prefix of the file (tens of lines) — the scan
    is a Spark text read with the line-order preserved; assembly is
    driver-side like every header-shaped read in the engine."""
    rows = (
        spark.read.text(path, wholetext=True)
        .select(F.posexplode(F.split("value", "\r?\n")).alias("_i", "value"))
        .where(
            F.col("value").rlike(r"^ .*\|\s*$") | F.col("value").startswith("DATE ")
        )
        .orderBy("_i")
        .select("value")
        .collect()
    )
    headers: dict = {}
    metadata: dict = {}
    comments: list[str] = []
    channels: list[str] = []
    for (line,) in rows:
        if line.startswith("DATE "):
            channels = parse_channels_line(line, metadata.get("station", ""))
            break
        if line.startswith(" #"):
            comments.append(parse_comment_line(line))
            continue
        key, value = parse_header_line(line)
        headers[key] = value
        mapped = _HEADER_KEYS.get(key.upper())
        if key.upper() == "DIGITAL SAMPLING":
            # "0.01 second" -> 100 Hz; "xx Hz" -> xx (the reference's
            # sensor_sampling_rate normalization)
            try:
                if "second" in value:
                    metadata["sensor_sampling_rate"] = 1 / float(
                        value.replace("second", "").strip()
                    )
                elif "Hz" in value:
                    metadata["sensor_sampling_rate"] = float(
                        value.replace("Hz", "").strip()
                    )
            except ValueError:
                pass
        elif mapped:
            metadata[mapped] = value
    merged = merge_comments(comments)
    kept, filt = [], []
    conditions_of_use = None
    declination_base = None
    is_intermagnet = is_gin = False
    for comment in merged:
        if comment.startswith("DECBAS"):
            decbas = comment.replace("DECBAS", "").strip()
            # deliberate divergence: the reference slices
            # [:decbas.find(" ")], which drops the last digit (or raises)
            # when nothing follows the number — split() parses the full
            # value in both shapes
            declination_base = int(decbas.split()[0])
        elif comment.startswith("CONDITIONS OF USE:"):
            conditions_of_use = comment.replace("CONDITIONS OF USE:", "").strip()
        else:
            cu = comment.upper()
            if "FILTER" in cu:
                filt.append(comment)
            elif "GIN" in cu:
                is_gin = True
            elif "INTERMAGNET DVD" in cu or "WWW.INTERMAGNET.ORG" in cu:
                is_intermagnet = True
            else:
                kept.append(comment)
    metadata.update(
        comments=tuple(kept),
        filter_comments=tuple(filt),
        conditions_of_use=conditions_of_use,
        declination_base=declination_base,
        is_intermagnet=is_intermagnet,
        is_gin=is_gin,
    )
    return {"headers": headers, "metadata": metadata, "channels": channels}
