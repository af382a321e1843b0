"""Exact-substring deduplication (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better") re-expressed Spark-first.

The paper's suffix-array construction is a single-machine algorithm over a
flattened corpus; at 100 TB the corpus neither fits one machine nor wants a
global sort. The distributed equivalent detects the same signal — token
runs of length >= W appearing verbatim in more than one document — with a
rolling window fingerprint join:

1. tokenize each document, emit one fingerprint per W-token window
   (``md5`` of the space-joined slice — deterministic, so the whole
   pipeline has an exact DuckDB oracle);
2. shuffle on the fingerprint: windows landing in >= ``min_docs`` distinct
   documents are duplicated substrings.  ``max_docs`` caps runaway
   boilerplate (site chrome appearing in millions of pages) — the
   standard hot-key guard, equivalent to CCNet's frequency cutoffs, and
   the thing that keeps the fingerprint shuffle skew-free at crawl scale;
3. per document, merge the hit windows' ``[pos, pos+W)`` intervals into
   maximal spans (running-max island detection — one window sort per
   document, O(hits) not O(hits x W): no explode back to token
   granularity) and either report coverage or strip the spans.

``stride`` > 1 samples every stride-th window: detection granularity
coarsens (a duplicated run shorter than W + stride - 1 tokens can slip
between sampled starts) but fingerprint volume drops stride-x — the knob
that makes the pass affordable on a 10^12-document corpus where stride=1
costs one row per token.

Scale shape: one corpus scan; the only corpus-sized shuffles are keyed by
fingerprint (uniform by construction of md5, bounded by ``max_docs``) and
by doc_id (bounded by hit count). No Python in the plan; ``F.slice`` over
the split-token array keeps window assembly inside codegen.

No reference analog (the geomag reference has no document ops); this is
the web-text layer the graft adds, beside ``operators/dedup.py``'s
MinHash/SimHash family (near-dup) — this module is the EXACT-substring
modality those estimators cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def window_fingerprints(
    df: DataFrame,
    w: int = 8,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, fp) — one md5 fingerprint per W-token window starting at
    1-based token index ``pos`` (every ``stride``-th start). Documents
    shorter than ``w`` tokens emit nothing (guarded: ``sequence`` DESCENDS
    when start > stop)."""
    if w < 2:
        raise ValueError(f"window must be >= 2 tokens, got {w}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    words = F.split(F.col(text_col), " ")
    starts = F.when(
        F.size(words) >= w,
        F.sequence(F.lit(1), F.size(words) - w + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        id_col, words.alias("_w"), F.explode(starts).alias("pos")
    ).select(
        id_col,
        "pos",
        F.md5(
            F.concat_ws(" ", F.slice("_w", F.col("pos"), w)).cast("binary")
        ).alias("fp"),
    )


def duplicated_fingerprints(
    fps: DataFrame,
    min_docs: int = 2,
    max_docs: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fingerprints seen in >= ``min_docs`` distinct documents, optionally
    capped at ``max_docs`` (boilerplate guard: a window shared by millions
    of pages is site chrome, not content worth span-merging — and its hit
    list is exactly the skewed key the cap removes before the join back)."""
    agg = fps.groupBy("fp").agg(F.countDistinct(id_col).alias("n_docs"))
    cond = F.col("n_docs") >= min_docs
    if max_docs is not None:
        cond &= F.col("n_docs") <= max_docs
    return agg.where(cond)


def substring_dup_spans(
    df: DataFrame,
    w: int = 8,
    stride: int = 1,
    min_docs: int = 2,
    max_docs: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start, span_end)
    with 1-based token bounds, end exclusive — the union of all duplicated
    windows' [pos, pos+w) intervals, merged per document.

    Island detection is the gap-merge idiom (cf. ``gaps.get_merged_gaps``):
    a window whose start exceeds the running max end of everything before
    it (time-ASC sort, ROWS .. 1 PRECEDING — incremental, never the O(n^2)
    suffix re-aggregation of an UNBOUNDED FOLLOWING frame) opens a new
    island."""
    fps = window_fingerprints(
        df, w=w, stride=stride, text_col=text_col, id_col=id_col
    )
    # the fingerprint relation feeds BOTH the dup aggregation and the hit
    # join; without this the corpus is scanned and re-fingerprinted twice
    # (plan-asserted: exactly one Generate). Lazy localCheckpoint, not
    # persist — same leak rationale as dedup.near_dup_pairs_verified.
    fps = fps.localCheckpoint(eager=False)
    dup = duplicated_fingerprints(
        fps, min_docs=min_docs, max_docs=max_docs, id_col=id_col
    )
    # both sides are corpus-sized and the checkpoint relation is stats-less
    # (the session-4 landmine: Catalyst would happily broadcast a corpus) —
    # pin the join to a shuffle on fp, where md5 uniformity + the max_docs
    # cap keep it skew-free
    hits = fps.hint("merge").join(dup.select("fp"), on="fp").select(
        id_col, "pos", (F.col("pos") + F.lit(w)).alias("end")
    )
    ordered = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("end").over(
        ordered.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1
    ).otherwise(0)
    return (
        hits.withColumn("island", F.sum(brk).over(ordered))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .drop("island")
    )


def substring_dup_fraction(
    df: DataFrame,
    w: int = 8,
    stride: int = 1,
    min_docs: int = 2,
    max_docs: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-token accounting — the curation gate signal:
    (id, n_tokens, dup_tokens, dup_fraction), dup_tokens = total tokens
    covered by at least one duplicated window (0 for clean docs). All
    integer counts, one terminal division -> exact in any engine."""
    spans = substring_dup_spans(
        df, w=w, stride=stride, min_docs=min_docs, max_docs=max_docs,
        text_col=text_col, id_col=id_col,
    )
    covered = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    n_tok = df.select(
        id_col, F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    return n_tok.join(covered, on=id_col, how="left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("dup_tokens"), F.lit(0))
        .cast("long")
        .alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_fraction"),
    )


def strip_dup_spans(
    df: DataFrame,
    w: int = 8,
    stride: int = 1,
    min_docs: int = 2,
    max_docs: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The removal step: every duplicated span deleted from the text
    (the paper's dedup policy — drop the substring, keep the remainder).
    Returns the input columns with ``text_col`` rewritten; documents with
    no duplicated spans pass through byte-identical.

    The span list rides back to the document as ONE sorted array column
    (collect_list per doc is bounded by span count, not token count), and
    the token filter is a JVM higher-order ``F.filter`` with the indexed
    lambda — no explode back to token rows, no Python."""
    spans = substring_dup_spans(
        df, w=w, stride=stride, min_docs=min_docs, max_docs=max_docs,
        text_col=text_col, id_col=id_col,
    )
    span_arr = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    words = F.split(F.col(text_col), " ")
    # 1-based token index i+1 is kept when no span covers it
    kept = F.filter(
        words,
        lambda tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (s["span_start"] <= i + 1) & (i + 1 < s["span_end"]),
        ),
    )
    out_cols = [
        F.concat_ws(" ", kept).alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(span_arr, on=id_col, how="left")
        .withColumn(
            "_spans",
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<span_start:int,span_end:int>>"),
            ),
        )
        .select(*out_cols)
    )
