"""Deterministic synthetic Common-Crawl-style pages table (the graft input).

Schema per ``BASELINE.json input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generated entirely Spark-side from ``spark.range`` — no driver loops, no
wall-clock, no randomness outside seeded hash functions — so the same
(n_urls, hours, seed) always yields byte-identical pages at any scale and
any parallelism. Hot-domain skew (Zipf-flavored) comes from per-url crawl
strides: a small head of urls is crawled every base period, the tail at
geometrically sparser strides, mirroring real crawl-frequency skew.

The page *text* is a pure function of (url, warc_ts): the byte-identity
invariant (extracted text per url must survive the engine untouched) is
testable by recomputing ``sha2(text)`` downstream. The ``html`` column
is a realistic page shell (``operators/html.py::wrap_html`` — style/
script blocks, salted comment, entity-escaped body) whose
``html_text`` extraction returns the text column byte-identically, so
the invariant is exercised through a REAL extraction, not an unwrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.html import wrap_html

BASE_TS = "2020-01-06T00:00:00+00:00"  # same epoch family as reference filter tests
BASE_EPOCH = 1578268800  # seconds

_VOCAB = (
    "the crawl web page spark filter rollup minute hour day signal stream "
    "magnet field data index fetch cadence text token lang shard tier gap"
).split()


def generate_pages(
    spark: SparkSession,
    n_urls: int = 32,
    hours: float = 3.0,
    base_period_s: int = 1,
    gap_pct: float = 5.0,
    seed: int = 42,
    n_hot: int | None = None,
) -> DataFrame:
    """Build the synthetic pages table.

    Each url ``k`` gets crawl stride ``base_period_s * 4^tier(k)`` where the
    hottest ``n_hot`` urls (default ~12%) have stride 1 — Zipf-ish volume
    skew with everything still on the base grid. ``gap_pct`` percent of
    samples are deterministically dropped (hash-based) to create gaps.
    """
    if n_hot is None:
        n_hot = max(1, n_urls // 8)
    n_samples = int(hours * 3600 // base_period_s)
    if n_samples < 1:
        raise ValueError(
            f"hours={hours} yields no samples at base_period_s={base_period_s}"
        )

    url = F.concat(
        F.lit("https://site"),
        F.col("k").cast("string"),
        F.lit(".example/p"),
        F.pmod(F.col("k") * 7, F.lit(13)).cast("string"),
    )
    # stride tiers: hot urls every sample, colder urls 4x/16x sparser
    cold_rank = F.greatest(F.col("k") - F.lit(n_hot - 1), F.lit(0))
    stride = F.when(F.col("k") < n_hot, F.lit(1)).otherwise(
        F.least(F.pow(F.lit(4), (cold_rank % 3) + 1), F.lit(64)).cast("long")
    )

    df = (
        spark.range(n_urls)
        .withColumnRenamed("id", "k")
        .withColumn("stride", stride)
        .withColumn("url", url)
        .withColumn(
            "i", F.explode(F.sequence(F.lit(0), F.lit(n_samples - 1), F.col("stride")))
        )
        .withColumn("epoch_s", F.lit(BASE_EPOCH) + F.col("i") * base_period_s)
    )
    # deterministic gap injection
    h = F.abs(F.xxhash64(F.col("url"), F.col("epoch_s"), F.lit(seed)))
    df = df.where(F.pmod(h, F.lit(10_000)) >= int(gap_pct * 100))

    # deterministic token text: 8 + hash%25 tokens drawn from the vocab
    n_tok = (F.pmod(h, F.lit(25)) + 8).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda j: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.col("url"), F.col("epoch_s"), j), F.lit(len(_VOCAB))) + 1).cast("int"),
            ),
        ),
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.pmod(F.xxhash64(F.col("url"), F.col("epoch_s"), F.lit(seed + 1)), F.lit(4)) + 1).cast("int"),
    )
    return df.select(
        F.col("url"),
        F.timestamp_seconds(F.col("epoch_s")).alias("warc_ts"),
        F.encode(wrap_html(text, salt_col=F.col("epoch_s")), "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
