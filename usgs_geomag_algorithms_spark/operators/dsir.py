"""DSIR-style importance weighting: score every raw document by how much
it looks like a TARGET distribution, via hashed-bigram feature
log-ratios (Xie et al., "Data Selection for Language Models via
Importance Resampling" — the hashed n-gram variant; public method).

The reference analog is the corpus-informed scoring family
(``textops.corpus_word_stats``, ``lmscore.bigram_bits``): those score
against ONE corpus; DSIR scores against the RATIO of two (a curated
target slice vs the raw crawl), which is what a pretraining mixture
build actually selects on.

Integer-exact scoring (the ``lmscore`` discipline): the true DSIR weight
is ``sum_g log(p_tgt(g)/p_raw(g))`` — cross-engine ``ln`` is not
bit-contracted, so we quantize each log2 to its integer floor via
bit length: ``BL(x) = length(bin(x)) - 1``.  Per hashed bucket ``b``
with Laplace add-one counts,

    bits(b) = BL(c_tgt[b] + 1) - BL(c_raw[b] + 1)

and the per-document score adds the normalizer once per gram:

    dsir_bits = sum_g bits(b_g) + n_grams * (BL(T_raw + B) - BL(T_tgt + B))

— every term BIGINT, bit-identical in any engine, within n_grams bits
of the real log-ratio.  High scores = target-like documents; importance
RESAMPLING is ``sample_uniform(id) < rate(dsir_bits)`` downstream
(``curate.sample_uniform``), keeping selection deterministic too.

Scale shape: bucket counts are ONE corpus-gram scan aggregating into at
most ``buckets`` rows (map-side combinable — the hash bounds the state,
not the vocabulary); scoring is a second gram scan joined BROADCAST
against the checkpointed bucket table (B rows, pinned explicitly — a
stats-less aggregate meeting a join must have its side pinned). Nothing
corpus-sized shuffles; both scans ride whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bl(c) -> F.Column:
    """floor(log2 c) for c >= 1 as the bit length of bin(c) — exact
    integer expressions, never float log (the lmscore kernel)."""
    return (F.length(F.bin(c)) - F.lit(1)).cast("long")


def bigram_buckets(
    df: DataFrame,
    buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
) -> DataFrame:
    """(id, *carry, bucket): one row per adjacent word pair, hashed into
    ``buckets`` via the md5-first-8-hex trick (dyadic, engine-portable).
    Codegen'd explode(sequence) + element_at — no interpreted lambdas;
    docs under 2 words emit nothing (guarded sequence)."""
    w = F.split(F.col(text_col), " ")
    wi = df.select(id_col, *carry_cols, w.alias("w")).select(
        id_col,
        *carry_cols,
        "w",
        F.explode(
            F.when(F.size("w") >= 2, F.sequence(F.lit(2), F.size("w")))
        ).alias("i"),
    )
    gram = F.concat_ws(
        " ", F.element_at("w", F.col("i") - 1), F.element_at("w", F.col("i"))
    )
    bucket = (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    ).cast("long")
    return wi.select(id_col, *carry_cols, bucket.alias("bucket"))


def dsir_bits(
    df: DataFrame,
    target_col: str = "is_target",
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR bit score against the rows flagged by
    ``target_col`` (a boolean column on ``df`` — e.g. the curated slice
    a mixture build wants more of).

    Output: (id, n_grams, dsir_bits, avg_bits) — all exact (the avg is
    one int64/int64 double division).  Documents with no bigram emit
    nothing; a higher score means more target-like.
    """
    g = bigram_buckets(
        df, buckets, text_col, id_col, carry_cols=(target_col,)
    )
    counts = (
        g.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("c_raw"),
            F.sum(F.when(F.col(target_col), 1).otherwise(0))
            .cast("long")
            .alias("c_tgt"),
        )
        .localCheckpoint(eager=True)  # B rows; computed once, stats known
    )
    totals = counts.agg(
        F.sum("c_raw").cast("long").alias("t_raw"),
        F.sum("c_tgt").cast("long").alias("t_tgt"),
    )
    bits = _bl(F.col("c_tgt") + F.lit(1)) - _bl(F.col("c_raw") + F.lit(1))
    scored = (
        g.join(F.broadcast(counts), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(bits).cast("long").alias("_sum_bits"),
        )
        .crossJoin(F.broadcast(totals))
    )
    norm = _bl(F.col("t_raw") + F.lit(buckets)) - _bl(
        F.col("t_tgt") + F.lit(buckets)
    )
    total_bits = (F.col("_sum_bits") + F.col("n_grams") * norm).cast("long")
    return scored.select(
        id_col,
        "n_grams",
        total_bits.alias("dsir_bits"),
        (total_bits.cast("double") / F.col("n_grams").cast("double")).alias(
            "avg_bits"
        ),
    )
