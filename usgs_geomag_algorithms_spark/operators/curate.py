"""Corpus curation: the composed training-data filter pipeline.

One declarative plan computing the webtext gates the way a 100 TB
pretraining-data build must: every gate — language prediction, quality
features, content hash — is a column expression over ONE scan of the
documents table, and the only shuffle is the dedup window on the content
hash. (The tempting composition — run lang_id / quality_score / dedup as
three DataFrames and join on id — reads the table three times and adds
two join shuffles; at 100 TB that is 2×100 TB of extra scan.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textops import lang_pred_column, quality_columns


def sample_uniform(col: F.Column) -> F.Column:
    """Deterministic uniform(0,1) from a key: first 8 md5 hex chars as a
    32-bit integer over 2^32 — a dyadic rational, so ``u < rate``
    compares bit-identically in any engine (DuckDB:
    ``('0x'||substr(md5(k),1,8))::BIGINT / 4294967296.0``)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Deterministic stratified (domain-mixing) sample: keep each row
    with its stratum's rate, decided by a content-free hash of the id.

    This is the domain-reweighting primitive of a pretraining data build
    (e.g. up/down-sampling web vs reference vs code sources): rates are a
    small literal map folded into ONE ``element_at(map, stratum)``
    expression, so the plan is map-only — no shuffle, no join, no Python;
    at 100 TB it rides the scan for free and is reproducible run-to-run
    (resharding-safe: the decision depends on the id, not the partition).
    Unknown strata default to rate 0.0 (dropped).
    """
    rate = _stratum_rate(rates, stratum_col)
    return df.where(sample_uniform(F.col(id_col)) < rate)


def _stratum_rate(rates: dict, stratum_col: str) -> F.Column:
    """The ONE copy of the stratum-rate contract (literal map fold,
    unknown strata -> 0.0), shared by the down- and up-samplers."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    return F.coalesce(
        F.element_at(rate_map, F.col(stratum_col)), F.lit(0.0)
    )


def curate(
    df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surviving docs after dedup + language + quality gates.

    Output: id, pred_lang, quality_score, mean_token_len, stopword_ratio —
    the curation manifest a downstream tokenizer job would consume."""
    text = F.col(text_col)
    q = quality_columns(text)
    # Gates are applied ABOVE the dedup window, not below it. Filtering
    # before the window looks cheaper (only survivors shuffle) but
    # measured 4x slower: Catalyst collapses Filter(Project) and inlines
    # the heavy text expressions into BOTH the predicate and the
    # projection, doubling the dominant string-processing cost. The
    # window is a hard boundary, so placing the filter above it evaluates
    # every expression exactly once; the extra shuffled bytes are ~100 B
    # of computed features per row vs KBs of re-processed text.
    w = Window.partitionBy("_md5")
    enriched = df.select(
        id_col,
        F.md5(text.cast("binary")).alias("_md5"),
        lang_pred_column(text).alias("pred_lang"),
        q["quality_score"].alias("quality_score"),
        q["mean_token_len"].alias("mean_token_len"),
        q["stopword_ratio"].alias("stopword_ratio"),
    ).withColumn("_keep", F.col(id_col) == F.min(id_col).over(w))
    return enriched.where(
        F.col("_keep")
        & (F.col("pred_lang") == lang)
        & (F.col("quality_score") >= min_quality)
    ).select(
        id_col, "pred_lang", "quality_score", "mean_token_len", "stopword_ratio"
    )


def curate_full(
    df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.7,
    jaccard: float = 0.3,
    max_dup_fraction: float = 0.5,
    k: int = 16,
    shingle_n: int = 8,
    bands: int = 4,
    substr_w: int = 8,
    rates: dict | None = None,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The COMPLETE pretraining-data build: the scalar gates of ``curate``
    (exact dedup + language + quality, one scan) composed with all three
    fuzzy-dedup modalities and the domain-mixing sample:

    - near-dup gate: only each MinHash-LSH/Jaccard cluster's canonical
      document survives (``dedup.near_dup_clusters``);
    - exact-substring gate: documents whose duplicated-span coverage
      exceeds ``max_dup_fraction`` are dropped
      (``substring.substring_dup_fraction``);
    - optional ``rates``: deterministic stratified sampling by
      ``stratum_col`` (``stratified_sample``).

    Gate ORDER is load-bearing, for semantics and cost both: the
    substring pass runs over the corpus that SURVIVES the document-level
    dedups — an exact/near duplicate gives its own canonical ~100%
    window coverage, so fingerprinting before deduplication would drop
    every document that merely *had* duplicates; after it, coverage
    measures residual cross-document duplication (boilerplate, quoted
    runs) among unique documents, which is the signal the gate is for.
    It is also the cheap order: the most expensive pass (one fingerprint
    row per token) runs over the reduced corpus.

    Unlike the scalar gates, the dedup modalities are *inherently*
    extra corpus passes (each shuffles on its own key: content 8-gram
    shingles, window fingerprints); what the composition controls is the
    JOIN cost — every gate reduces to a doc-id-keyed relation no wider
    than the corpus, so the merge is id-hash-partitioned joins that AQE
    co-plans, never a re-scan of text. Output: one manifest row per
    surviving document (id, stratum, pred_lang, quality_score,
    dup_fraction) — what a downstream tokenizer job consumes."""
    from .dedup import near_dup_clusters
    from .substring import substring_dup_fraction

    base = curate(
        df, lang=lang, min_quality=min_quality,
        text_col=text_col, id_col=id_col,
    )
    canonical = near_dup_clusters(
        df, k=k, shingle_n=shingle_n, bands=bands, threshold=jaccard,
        text_col=text_col, id_col=id_col,
    ).where("is_canonical").select(id_col)
    unique = base.join(canonical, on=id_col)
    frac = substring_dup_fraction(
        df.join(unique.select(id_col), on=id_col),
        w=substr_w, text_col=text_col, id_col=id_col,
    ).where(F.col("dup_fraction") <= max_dup_fraction).select(
        id_col, "dup_fraction"
    )
    out = unique.join(frac, on=id_col).join(
        df.select(id_col, stratum_col), on=id_col
    )
    if rates:
        out = stratified_sample(
            out, rates, id_col=id_col, stratum_col=stratum_col
        )
    return out.select(
        id_col, stratum_col, "pred_lang", "quality_score", "dup_fraction"
    )


def leakage_safe_split(
    docs: DataFrame,
    holdout_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    **cluster_kwargs,
) -> DataFrame:
    """Train/holdout split that cannot leak near-duplicates across the
    boundary: documents are clustered first (near_dup_clusters: LSH ->
    exact-Jaccard verify -> connected components), then the WHOLE CLUSTER
    is assigned by a content-free hash of its cluster id — a near-dup of
    a holdout document can never land in train, the failure mode of
    naive per-document splits (test-set contamination).

    Output: (id, cluster_id, is_canonical, split). Deterministic and
    resharding-safe (the decision depends only on cluster_id); with a
    dyadic ``holdout_frac`` the u < frac comparison is bit-identical in
    any engine, so the whole split — including the clustering — is
    exactly oracle-checkable.

    Scale shape: clustering is the dominant cost and is the banded-LSH
    pipeline (never all-pairs); the split itself is one map-only
    expression over the cluster table."""
    from .dedup import near_dup_clusters

    clusters = near_dup_clusters(
        docs, id_col=id_col, text_col=text_col, **cluster_kwargs
    )
    return clusters.select(
        id_col,
        "cluster_id",
        "is_canonical",
        F.when(
            sample_uniform(F.col("cluster_id")) < F.lit(float(holdout_frac)),
            F.lit("holdout"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def cap_per_domain(
    docs: DataFrame,
    max_docs: int,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Keep at most ``max_docs`` documents per domain — the C4/Gopher-style
    guard against a single host dominating the mixture. Selection is a
    content-free md5 order of the doc id (id tiebreak), so the kept set is
    deterministic, resharding-safe, and independent of upstream edits to
    document text. Output: input rows + ``domain_rank`` (1-based kept
    position) for the survivors.

    Scale shape: ONE hash shuffle on the domain key; rank is a running
    window (no unbounded frame). A pathological domain holding a large
    corpus fraction is exactly the skewed key AQE splits — and the cap
    then throws most of its rows away, which is the point."""
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("domain_rank", F.row_number().over(w))
        .where(F.col("domain_rank") <= int(max_docs))
    )


def upsample_stratified(
    df: DataFrame,
    rates: dict,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Mixture weighting with rates ABOVE 1: each row appears
    floor(rate) times plus one more with probability frac(rate) — e.g.
    rate 2.5 -> 2 copies always, a 3rd for half the ids. The common
    pretraining case ``stratified_sample`` cannot express (Wikipedia x5,
    code x2.5 while web stays x0.3); rates <= 1 degrade to exactly its
    keep/drop semantics, so this is a strict superset.

    Output: input rows + ``copy`` (0-based copy index) — the copy index
    keys downstream epoch-order hashing so duplicated documents spread
    through the token stream instead of clumping.

    Deterministic (same md5-dyadic uniform as stratified_sample, so the
    fractional copy is resharding-safe and engine-exact for dyadic
    fractional parts) and map-only: the explode factor is the rate
    itself, there is no shuffle and no join."""
    rate = _stratum_rate(rates, stratum_col)
    whole = F.floor(rate).cast("long")
    extra = (
        sample_uniform(F.col(id_col)) < (rate - whole.cast("double"))
    ).cast("long")
    n_copies = whole + extra
    return (
        df.withColumn("_n", n_copies)
        .where(F.col("_n") > 0)
        .withColumn("copy", F.explode(F.expr("sequence(0, _n - 1)")))
        .drop("_n")
    )
