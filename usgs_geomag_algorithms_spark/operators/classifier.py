"""Hashed-feature linear quality classifier (fastText-style gate).

The standard model-based quality gate of a pretraining data build
(CCNet / fastText `__label__wiki` filtering) is a linear model over a
hashed bag of words: ``logit(doc) = Σ_w weight[h(w) % B] / n_words``.
The expensive part at 100 TB is not the model — it is streaming every
token of the corpus through the feature hash.  Both paths below keep
that streaming entirely inside whole-stage codegen:

* :func:`hashed_linear_score` — weights derived **inline** from md5 of
  the bucket id (deterministic placeholder model).  The whole classifier
  is ONE map-side expression tree + ONE groupBy(doc) shuffle: no join,
  no Python, no weight table to ship.  Integer weights summed to an
  int64 logit numerator make the score one int→double division —
  bit-exact in any engine, so the driver oracle checks it exactly.
* :func:`linear_score_with_table` — the production shape: a learned
  weight table (bucket → weight) broadcast onto the hashed token
  stream.  Same contract; pytest asserts bit-identity with the inline
  path when the table holds the md5 weights, and the plan is audited
  broadcast (no corpus-side exchange before the per-doc roll-up).

Reference analog: the reference filters streams through per-channel
algorithm gates (geomagio/algorithm/Algorithm.py process/can_produce);
here the "algorithm" is a scored keep/drop over documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: feature-hash buckets (2^12); production models use 2^20+ — the plan
#: is O(1) in B for the inline path and O(B) only in the broadcast table
N_BUCKETS = 4096
#: logit threshold in NUMERATOR units per word — keep iff logit > 0
WEIGHT_BIAS = 32768


def feature_bucket(word: F.Column, buckets: int = N_BUCKETS) -> F.Column:
    """Feature hash: first 8 md5 hex chars mod ``buckets`` (non-negative,
    engine-portable: DuckDB ``('0x'||substr(md5(w),1,8))::BIGINT % B``)."""
    return (
        F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long") % buckets
    )


def md5_weight(bucket: F.Column) -> F.Column:
    """Deterministic signed 16-bit weight for a bucket id: first 4 md5
    hex chars of ``'w:<bucket>'`` minus 32768 → [-32768, 32767]."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        - WEIGHT_BIAS
    )


def md5_weight_table(spark, buckets: int = N_BUCKETS) -> DataFrame:
    """The md5 placeholder model materialized as a (bucket, weight)
    table — stands in for a learned fastText/logistic model's weights."""
    return spark.range(buckets).select(
        F.col("id").alias("bucket"), md5_weight(F.col("id")).alias("weight")
    )


def _doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )


def _roll_up(scored: DataFrame, id_col: str) -> DataFrame:
    """Per-doc logit from per-word weights: all-integer numerator, one
    int64→double division (bit-exact under any summation order)."""
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("weight").cast("long").alias("logit_num"),
        (F.sum("weight").cast("long") / F.count("*").cast("long")).alias(
            "score"
        ),
        (F.sum("weight").cast("long") > 0).alias("keep"),
    )


def hashed_linear_score(
    df: DataFrame,
    buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inline-weight classifier: map-only token scoring, one shuffle
    keyed by ``id_col``.  At 100 TB this is the cheapest possible model
    gate — the weights live in the expression tree, not in memory."""
    words = _doc_words(df, text_col, id_col)
    scored = words.select(
        id_col, md5_weight(feature_bucket(F.col("word"), buckets)).alias("weight")
    )
    return _roll_up(scored, id_col)


def linear_score_with_table(
    df: DataFrame,
    weights: DataFrame,
    buckets: int = N_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learned-weight classifier: the (bucket, weight) table broadcasts
    onto the hashed token stream (the corpus side never shuffles before
    the per-doc roll-up).  Buckets absent from the table score 0 — a
    pruned/sparsified model stays valid."""
    words = _doc_words(df, text_col, id_col)
    hashed = words.select(
        id_col, feature_bucket(F.col("word"), buckets).alias("bucket")
    )
    scored = hashed.join(F.broadcast(weights), "bucket", "left").select(
        id_col, F.coalesce(F.col("weight"), F.lit(0)).alias("weight")
    )
    return _roll_up(scored, id_col)
