"""Chunk-level boilerplate removal: drop cross-document duplicated text
chunks and REWRITE the document (CCNet / RefinedWeb paragraph-dedup,
adapted to unstructured text as fixed word-window chunks).

Where document-level dedup (operators/dedup.py) and substring coverage
(operators/substring.py) MEASURE duplication, this pass EDITS it out: a
navigation header or license footer shared by thousands of pages is
removed from every survivor document rather than dooming the documents
themselves. That is the curation step LLM pipelines actually ship —
dedup the documents, then strip the shared boilerplate inside them.

Plan shape at 100 TB: one corpus scan explodes each doc into ~len/W
chunk rows (map-only; the chunking itself is a per-row ``transform``
over a ``sequence``, no join); the global duplicate-fingerprint set is
one hash-partitioned aggregate on md5(chunk) with a map-side partial
(count distinct docs per fp); the removal is a fingerprint-keyed
LEFT ANTI join (shuffle bounded by chunk count, AQE-skew-safe — a
boilerplate fp repeated 10^6 times is exactly the skewed key AQE
splits); reassembly is one groupBy(doc) with a sorted struct collect
whose width is bounded by the document length, not the corpus. Every
value produced — counts, the rewritten string, the removed fraction
(integer ratio, one terminal division) — is engine-exact, so the whole
pass has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default chunk width in words — small enough that boilerplate shorter
#: than a sentence is still caught, large enough that natural text
#: rarely collides
CHUNK_W = 8


def doc_chunks(
    docs: DataFrame,
    chunk_words: int = CHUNK_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, cidx, chunk): consecutive non-overlapping ``chunk_words``-word
    windows; the final chunk keeps the remainder. Map-only."""
    w = int(chunk_words)
    words = f"split({text_col}, ' ')"
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size({words}) / {w}.0) as int) - 1),"
        f" i -> array_join(slice({words}, i * {w} + 1, {w}), ' '))"
    )
    return docs.select(
        id_col, F.posexplode(chunks).alias("cidx", "chunk")
    )


def remove_duplicate_chunks(
    docs: DataFrame,
    chunk_words: int = CHUNK_W,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_chunks, kept_chunks, removed_fraction, clean_text): every
    chunk whose md5 fingerprint appears in >= ``min_docs`` DISTINCT
    documents is removed from all of them; the document is rebuilt from
    the surviving chunks in order (single-space joined). A document whose
    every chunk was boilerplate survives with ``clean_text = ''`` — the
    caller's length gate (curate pipeline) is the right place to drop it.
    """
    # the chunk explode feeds THREE branches (dup aggregate, anti-join
    # left side, per-doc totals) on different keys — materialize it once
    # or the corpus is scanned and re-split three times
    ch = (
        doc_chunks(docs, chunk_words, id_col, text_col)
        .withColumn("fp", F.md5(F.col("chunk").cast("binary")))
        .localCheckpoint()
    )
    dup = (
        ch.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select("fp")
    )
    kept = ch.join(dup, on="fp", how="left_anti")
    total = ch.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("kept_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("cidx", "chunk"))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        total.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            "n_chunks",
            F.coalesce("kept_chunks", F.lit(0)).alias("kept_chunks"),
            (
                (F.col("n_chunks") - F.coalesce("kept_chunks", F.lit(0)))
                .cast("double")
                / F.col("n_chunks")
            ).alias("removed_fraction"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
