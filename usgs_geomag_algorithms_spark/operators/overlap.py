"""Cross-source corpus overlap: pairwise n-gram Jaccard between sources.

"How much of corpus A is also in corpus B" is the standard measurement
when documenting a webtext mixture (mirrors, syndication, benchmark
bleed between sources) — the corpus-level analogue of the per-document
near-dup pass, and the same shape as the reference's cross-channel
comparisons (geomagio AverageAlgorithm compares the same quantity
across observatories before merging).

Semantics: for each source, the DISTINCT set of character n-gram
shingles over all its documents; for each source pair (a < b),
``jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|)``. All-integer counts and
ONE terminal division — engine-exact, so the whole matrix carries an
exact DuckDB oracle.

Scale shape (10^12 docs, S sources where S is small — tens to
thousands): one corpus scan explodes shingles, the distinct + groupBy
shuffle on the shingle key with map-side partials, and each shingle row
carries a source SET bounded by S, from which the pair explosion is a
codegen'd generator (sequence + element_at + slice — no interpreted
lambdas, NOTES.md session-7). Nothing is ever joined corpus x corpus;
the intersection aggregate's output is bounded by S², not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import char_shingles


def source_overlap_sketch(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    group_col: str = "source",
    lg_k: int = 14,
) -> DataFrame:
    """Sketch-estimated source-pair overlap — the 10^12-document path for
    :func:`source_overlap`.

    The exact operator shuffles every (source, shingle) row; this one
    reduces each source to ONE HLL sketch in a single aggregate (the
    shuffle carries S sketch binaries, ~16 KB each at lg_k=14), then
    estimates every pairwise intersection by set algebra over the S²
    pairs: ``|A ∩ B| ≈ |A| + |B| - |A ∪ B|`` with the union computed by
    the scalar ``hll_union`` — map-only after the aggregate, no second
    corpus pass. Estimates inherit HLL error (~0.8% RSE at lg_k=14,
    amplified by the subtraction for small intersections), so this is a
    rows-only driver entry; the exact twin ``source_overlap`` carries
    the oracle, and the parity test bounds the relative error.

    Output: (src_a, src_b, n_a, n_b, inter, jaccard) — same shape as the
    exact operator, estimated values, inter clamped at >= 0."""
    sh = char_shingles(
        docs.select(group_col, text_col), n=n, text_col=text_col,
        id_col=group_col, distinct=False,
    )
    sk = sh.groupBy(group_col).agg(
        F.expr(f"hll_sketch_agg(shingle, {lg_k})").alias("sk"),
        F.expr(
            "cast(hll_sketch_estimate("
            f"hll_sketch_agg(shingle, {lg_k})) as bigint)"
        ).alias("n"),
    )
    a = sk.select(
        F.col(group_col).alias("src_a"),
        F.col("sk").alias("_ska"),
        F.col("n").alias("n_a"),
    )
    b = sk.select(
        F.col(group_col).alias("src_b"),
        F.col("sk").alias("_skb"),
        F.col("n").alias("n_b"),
    )
    inter = F.greatest(
        F.lit(0).cast("bigint"),
        F.col("n_a")
        + F.col("n_b")
        - F.expr(
            "cast(hll_sketch_estimate(hll_union(_ska, _skb)) as bigint)"
        ),
    )
    return (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            inter.alias("inter"),
        )
        .where(F.col("inter") > 0)
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )


def source_overlap(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(src_a, src_b, n_a, n_b, inter, jaccard) for every source pair
    sharing at least one shingle, src_a < src_b bytewise."""
    # ONE shingle-keyed shuffle total: collect_set dedups map-side, so no
    # distinct pre-pass is needed, and the per-source distinct-shingle
    # sizes fall out of the same source-set relation by re-exploding it
    # (bounded by S per shingle) instead of a second corpus aggregate.
    sh = char_shingles(
        docs.select(group_col, text_col), n=n, text_col=text_col,
        id_col=group_col, distinct=False,
    )
    sets = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_set(group_col)).alias("_s")
    )
    sizes = (
        sets.select(F.explode("_s").alias(group_col))
        .groupBy(group_col)
        .agg(F.count("*").alias("n"))
    )
    srcs = sets.where(F.size("_s") > 1)
    inter = (
        srcs.select(
            "_s", F.explode(F.expr("sequence(1, size(_s) - 1)")).alias("i")
        )
        .select(
            F.expr("element_at(_s, i)").alias("src_a"),
            F.explode(F.expr("slice(_s, i + 1, size(_s) - i)")).alias(
                "src_b"
            ),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col(group_col).alias("src_a"), F.col("n").alias("n_a")
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col(group_col).alias("src_b"), F.col("n").alias("n_b")
                )
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("inter").cast("bigint").alias("inter"),
            (
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
