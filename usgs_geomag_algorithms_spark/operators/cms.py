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


# ------------------------------------------------------------- grid tier
# The grid as a storable tier value: one dense array<long> per time
# bucket (depth·width cells, row-major), the frequency twin of the HLL
# sketch tier (sketches.py). Hour grids live in a TierStore row
# ("grid array<bigint>, n_tokens bigint"); coarser tiers and streaming
# micro-batches fold in by element-wise addition — never a raw rescan.

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def cms_hour_grids(
    events: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """(t_us, grid array<long>, n_tokens) per hour: the storable tier
    row.  Cells collapse map-side (≤ depth·width per task) before the
    hour shuffle; the dense array is assembled per hour from ≤
    depth·width entries — never from raw tokens."""
    words = events.select(
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp)) div {HOUR_US})"
            f" * {HOUR_US}"
        ).alias("t_us"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    rows = F.array(*[F.lit(r) for r in range(depth)])
    wr = words.select("t_us", "word", F.explode(rows).alias("row"))
    cells = (
        wr.select(
            "t_us",
            (
                F.col("row") * width
                + cms_bucket(F.col("word"), F.col("row"), width)
            ).alias("idx"),
        )
        .groupBy("t_us", "idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n = depth * width
    return (
        cells.groupBy("t_us")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "cnt"))
            ).alias("_m"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
        .select(
            "t_us",
            F.expr(
                f"transform(sequence(0, {n - 1}), i -> coalesce(_m[i], 0L))"
            ).alias("grid"),
            # every token is counted once per depth row
            F.expr(f"n_tokens div {depth}").alias("n_tokens"),
        )
    )


def grid_add(a, b):
    """Element-wise sum of two grid arrays (the mergeable-tier fold)."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cms_grid_rollup(
    grids: DataFrame,
    out_us: int = DAY_US,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Coarser grid tier from a finer one by pure addition (24 hour
    grids fold into a day grid — shuffle bounded by the OUTPUT tier
    cardinality, raw tokens never touched; cf. sketches.hll_rollup)."""
    n = depth * width
    return (
        grids.select(
            F.expr(f"(t_us div {out_us}) * {out_us}").alias("t_us"),
            "grid",
            "n_tokens",
        )
        .groupBy("t_us")
        .agg(
            F.expr(
                f"aggregate(collect_list(grid), array_repeat(0L, {n}),"
                " (acc, g) -> zip_with(acc, g, (a, b) -> a + b))"
            ).alias("grid"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def grid_estimate(
    candidates: DataFrame,
    grids: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    word_col: str = "word",
) -> DataFrame:
    """(t_us, word, est_count) from a dense-grid tier: min over the
    depth rows of the word's cell — the grid side broadcasts (one array
    per time bucket)."""
    exprs = [
        F.element_at(
            F.col("grid"),
            (
                F.lit(r * width)
                + cms_bucket(F.col("word"), F.lit(r), width)
                + 1
            ).cast("int"),
        )
        for r in range(depth)
    ]
    return (
        candidates.select(F.col(word_col).alias("word"))
        .distinct()
        .crossJoin(F.broadcast(grids.select("t_us", "grid")))
        .select("t_us", "word", F.least(*exprs).alias("est_count"))
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
