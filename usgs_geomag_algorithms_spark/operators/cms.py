"""Count-min sketch heavy hitters over the token stream.

The frequent-items question ("which tokens/domains dominate the
corpus?") is the frequency twin of the HLL distinct-count tier
(sketches.py): exact per-word counts need a vocabulary-sized shuffle,
but a count-min sketch is a FIXED ``depth × width`` integer grid that
is mergeable by plain addition — per-partition grids sum into a corpus
grid, hourly grids sum into daily, streaming micro-batch grids fold
into the store, all without re-scanning raw data.

Scale shape: building the grid is ONE groupBy over (row, bucket) whose
map-side partial collapses each task's tokens into ≤ depth·width cells
before the exchange — the shuffle carries the GRID, not the vocabulary.
The estimate pass broadcasts the (tiny) grid back onto the candidate
words; `min` across the depth rows gives the classic CMS upper-bounded
estimate (est ≥ true count, overshoot only from bucket collisions).

Every value is an integer and the bucket hashes are md5-derived, so a
DuckDB oracle reproduces the grid cell-for-cell — the driver checks the
estimates EXACTLY, collisions included (`heavy_hitters_cms` also emits
the exact count per word so the sketch error is visible in the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: independent hash rows — P(overshoot) decays as (collision rate)^depth
CMS_DEPTH = 4
#: counters per row; error bound is ~ total_tokens / width per row
CMS_WIDTH = 256


def cms_bucket(word: F.Column, row: F.Column, width: int = CMS_WIDTH) -> F.Column:
    """Row-salted bucket hash: first 8 md5 hex chars of ``'<row>:<word>'``
    mod width (DuckDB: ``('0x'||substr(md5(r||':'||w),1,8))::BIGINT % W``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), word)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))


def _with_rows(words: DataFrame, depth: int) -> DataFrame:
    rows = F.array(*[F.lit(r) for r in range(depth)])
    return words.select("word", F.explode(rows).alias("row"))


def cms_counters(
    df: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """(row, bucket, cnt) grid — ≤ depth·width rows regardless of corpus
    size; the ×depth token amplification collapses map-side."""
    wr = _with_rows(_words(df, text_col), depth)
    return (
        wr.select("row", cms_bucket(F.col("word"), F.col("row"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge sketch grids by cell-wise addition (the property that makes
    the sketch a storable/streamable tier — see sketches.py)."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    candidates: DataFrame,
    grid: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    word_col: str = "word",
) -> DataFrame:
    """Upper-bounded count per candidate word: min over the depth rows of
    the word's grid cell.  The grid broadcasts (≤ depth·width rows); the
    candidate side never shuffles except the final per-word min."""
    wr = _with_rows(candidates.select(F.col(word_col).alias("word")), depth)
    cells = wr.select(
        "word", "row", cms_bucket(F.col("word"), F.col("row"), width).alias("bucket")
    )
    return (
        cells.join(F.broadcast(grid), ["row", "bucket"])
        .groupBy("word")
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    k: int = 50,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus tokens by CMS estimate, with the exact count beside
    the estimate so collision overshoot is observable.  Deterministic
    order: (est_count DESC, word) — words are unique, so the k-boundary
    never ties."""
    words = _words(df, text_col)
    grid = cms_counters(df, depth, width, text_col)
    vocab = words.groupBy("word").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    est = cms_estimate(vocab, grid, depth, width)
    return (
        vocab.join(est, "word")
        .select("word", "est_count", "exact_count")
        .orderBy(F.desc("est_count"), "word")
        .limit(k)
    )
