"""Signal extraction: pages → long-format channel rows.

Per-url page-derived signal channels play the role of the reference's
observatory channels H/E/Z/F (``geomagio/geomag_types.py``): ``text_len``
(page text length), ``lang_en`` (1.0 when lang == 'en', so tier averages
yield the rolling language share), ``cadence`` (seconds since the previous
crawl of the same url — a window ``lag``). Synthetic geomag-shaped channels
H/E/Z/F (deterministic sinusoid + trend + hash noise) are available for the
cross-channel operators (XYZ/DeltaF/Adjusted parity tests).

Output long format: ``(url, channel, t_us long, value double)`` — the
engine-wide fact-row shape. ``t_us`` = epoch microseconds (exact integer
grid; see operators/rollup.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

TEXT_CHANNELS = ("text_len", "lang_en", "cadence")
GEO_CHANNELS = ("H", "E", "Z", "F")


def page_signals(pages: DataFrame, channels=TEXT_CHANNELS) -> DataFrame:
    """Extract per-page scalar channels and unpivot to long format.

    The cadence channel needs ``lag(warc_ts)`` per url — the only window
    function here; everything else is stateless projection, so the scan
    stays pushdown-friendly (only ``url, warc_ts, text, lang`` read).
    """
    t_us = F.unix_micros(F.col("warc_ts"))
    df = pages.select(
        "url",
        t_us.alias("t_us"),
        F.length("text").cast("double").alias("text_len"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("lang_en"),
    )
    if "cadence" in channels:
        w = Window.partitionBy("url").orderBy("t_us")
        df = df.withColumn(
            "cadence",
            ((F.col("t_us") - F.lag("t_us").over(w)) / 1e6).cast("double"),
        )
    pairs = []
    for ch in channels:
        pairs += [f"'{ch}'", ch]
    return df.select(
        "url",
        "t_us",
        F.expr(f"stack({len(channels)}, {', '.join(pairs)}) as (channel, value)"),
    ).select("url", "channel", "t_us", "value")


def synthetic_geo_signals(pages: DataFrame, declination_deg: float = 15.0) -> DataFrame:
    """Deterministic H/E/Z/F channels on the pages' (url, t) grid for
    cross-channel operator tests: smooth sinusoid + trend + small hash
    noise, with F consistent-ish (sqrt(H^2+E^2+Z^2) + perturbation) so
    DeltaF is nonzero but stable."""
    t_us = F.unix_micros(F.col("warc_ts"))
    tsec = (t_us / 1_000_000).cast("double")
    phase = tsec / 3600.0 * (2 * math.pi)
    noise = (
        F.pmod(F.xxhash64(F.col("url"), t_us), F.lit(1000)).cast("double") / 1000.0
        - 0.5
    )
    h = 20800.0 + 15.0 * F.sin(phase) + noise
    e = 100.0 * F.cos(F.lit(math.radians(declination_deg))) + 10.0 * F.cos(phase) + noise * 0.5
    z = 47000.0 + 5.0 * F.sin(phase / 2) + noise * 0.2
    f = F.sqrt(h * h + e * e + z * z) + 1.5 + noise * 0.1
    df = pages.select(
        "url",
        t_us.alias("t_us"),
        h.alias("H"),
        e.alias("E"),
        z.alias("Z"),
        f.alias("F"),
    )
    pairs = ", ".join(f"'{c}', {c}" for c in GEO_CHANNELS)
    return df.select(
        "url",
        "t_us",
        F.expr(f"stack(4, {pairs}) as (channel, value)"),
    ).select("url", "channel", "t_us", "value")


def text_identity_digest(pages: DataFrame) -> DataFrame:
    """Per-url digest over (warc_ts, sha2(text)) — the byte-identity
    invariant check: any engine stage that claims to preserve extracted text
    must reproduce these digests exactly (``BASELINE.json input_hint``)."""
    per_page = pages.select(
        "url",
        F.unix_micros("warc_ts").alias("t_us"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha"),
    )
    return per_page.groupBy("url").agg(
        F.sha2(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(F.concat_ws(":", F.col("t_us"), F.col("text_sha")))
                ),
            ).cast("binary"),
            256,
        ).alias("url_digest"),
        F.count("*").alias("n_pages"),
    )
