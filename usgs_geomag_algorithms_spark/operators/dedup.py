"""Document deduplication operators for large-scale training-data pipelines.

No reference analog (the geomag reference has no document ops) — these are
the web-text layer the graft adds. All of them are pure DataFrame plans
built from cross-engine-reproducible primitives (md5-based hashing, integer
modular arithmetic) so every stage has an exact DuckDB oracle:

- exact dedup: content-hash groupBy, first-id-wins
- MinHash: char-shingle -> k modular permutations -> per-doc signature;
  LSH banding -> candidate pairs via band-hash self-join
- SimHash: 60-bit sign-of-weighted-bit-sums over tokens
- n-gram Jaccard: exact set similarity on candidate pairs

Scale shape: everything is explode -> groupBy with map-side partial
aggregation; the LSH self-join shuffles on (band, band_hash) — the standard
near-dup join at crawl scale. Shingle hashing uses the first 8 hex chars of
md5 (32-bit), keeping a*h below 2^62 for exact BIGINT modular math in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def minhash_perms(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation constants via a fixed LCG;
    a < 2^30 so a*h + b stays < 2^63 for 32-bit h."""
    perms = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % ((1 << 30) - 2) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (state >> 16) % MINHASH_PRIME
        perms.append((a, b))
    return perms


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-hash dedup: every row keeps its group's minimum id; rows
    whose id differs are duplicates."""
    w = Window.partitionBy("text_md5")
    return (
        df.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .withColumn("keep_id", F.min(id_col).over(w))
        .select(
            id_col,
            "text_md5",
            (F.col(id_col) != F.col("keep_id")).alias("is_duplicate"),
        )
    )


def char_shingles(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """Character n-grams per document: explode positions 1..len-n+1
    (JVM-side sequence; no Python). ``distinct=False`` skips the dedup
    shuffle for consumers whose downstream aggregate dedups anyway
    (collect_set)."""
    out = (
        df.where(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1)))
            ).alias("_i"),
            F.col(text_col).alias("_t"),
        )
        .select(id_col, F.expr(f"substring(_t, _i, {n})").alias("shingle"))
    )
    return out.distinct() if distinct else out


def _shingle_hash(col: F.Column) -> F.Column:
    """32-bit shingle hash = first 8 hex chars of md5 — identical in DuckDB
    as ('0x' || substr(md5(s),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    k: int = 32,
    shingle_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    shingles: DataFrame = None,
    with_counts: bool = False,
) -> DataFrame:
    """Per-document MinHash signature: array of k minima of
    (a_i * h(shingle) + b_i) mod p, ordered by permutation index.

    One explode (shingles) -> k aggregate minima computed as array-wise
    ``min`` without a second explode: the k permuted hashes are built as an
    array column and reduced with ``zip_with``-style element minima via
    groupBy on arrays? Spark lacks elementwise array-min aggregate, so we
    aggregate each permutation as its own min() column — k literal
    expressions, all in one whole-stage-codegen'd aggregate (no k-fold row
    amplification).

    ``with_counts=True`` adds ``n_sh`` (the per-doc distinct-shingle
    count) to the SAME aggregate — the Jaccard-verify stage needs it, and
    fusing it here means one pass over the shingle relation instead of
    two (the two consumers then share the aggregate's exchange via
    ReusedExchange).
    """
    sh = (
        shingles
        if shingles is not None
        else char_shingles(df, n=shingle_n, text_col=text_col, id_col=id_col)
    )
    h = _shingle_hash(F.col("shingle"))
    hashed = sh.select(id_col, h.alias("_h"))
    aggs = [
        F.min(
            (F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(minhash_perms(k, seed))
    ]
    if with_counts:
        aggs.append(F.count("*").alias("n_sh"))
    sigs = hashed.groupBy(id_col).agg(*aggs)
    out = [
        id_col,
        F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("minhash"),
    ]
    if with_counts:
        out.append(F.col("n_sh"))
    return sigs.select(*out)


def minhash_digest(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature digest for compact comparison: md5 of the comma-joined
    signature values."""
    return sigs.select(
        id_col,
        F.md5(
            F.concat_ws(",", F.col("minhash").cast("array<string>")).cast("binary")
        ).alias("sig_md5"),
    )


def lsh_bands(
    sigs: DataFrame, bands: int, id_col: str = "doc_id", k: int | None = None
) -> DataFrame:
    """Banded LSH relation (id, band, bhash): the signature is split into
    ``bands`` equal slices, each md5-hashed — one row per (doc, band) via a
    single explode, no per-band passes. ``bhash`` is deterministic
    (md5 of the comma-joined slice), so the candidate stage is exactly
    reproducible in any engine. Raises unless ``bands`` evenly divides
    the signature length (a remainder would silently never hash the
    signature tail; ``bands > k`` would hash empty slices — every doc in
    one bucket, an all-pairs explosion)."""
    if k is None:
        row = sigs.select("minhash").first()
        if row is None:
            return sigs.select(
                F.col(id_col),
                F.lit(0).alias("band"),
                F.lit("").alias("bhash"),
            ).limit(0)
        k = len(row[0])
    if bands <= 0 or k % bands != 0 or bands > k:
        raise ValueError(
            f"bands ({bands}) must evenly divide the signature length ({k})"
        )
    rows_per_band = k // bands
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.slice(
                                    F.col("minhash"), i * rows_per_band + 1, rows_per_band
                                ).cast("array<string>"),
                            ).cast("binary")
                        ).alias("bhash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.bhash")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, id_col: str = "doc_id", k: int | None = None
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` equal bands, hash
    each band, self-join on (band_idx, band_hash) -> distinct (id_a < id_b)
    candidate pairs. Shuffle key is the band hash — hot buckets (boilerplate
    shingles) are bounded by band width; AQE skew-join covers the rest.

    Pass ``k`` (the signature length) when known — otherwise it is probed
    with a ``first()``, which runs the signature job eagerly at
    plan-construction time. ``k`` must divide evenly into ``bands``: a
    remainder would silently never hash the signature tail into any band,
    and ``bands > k`` would hash empty slices (every doc in one bucket —
    an all-pairs explosion)."""
    if k is None:
        row = sigs.select("minhash").first()
        if row is None:
            # empty-corpus schema must match the non-empty path for any
            # id_col type (a hardcoded long would break downstream joins)
            return sigs.select(
                F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b")
            ).limit(0)
        k = len(row[0])
    banded = lsh_bands(sigs, bands=bands, id_col=id_col, k=k)
    # the self-join must SHUFFLE on (band, bhash) — the checkpoint-fed
    # signature relation has no stats and Catalyst otherwise broadcasts a
    # corpus-sized side (same failure mode as the verify join, see
    # ngram_jaccard_pairs); the merge hint pins the documented plan
    a = banded.alias("a")
    b = banded.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash(
    df: DataFrame,
    bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """60-bit SimHash over whitespace tokens: token hash h (60-bit from md5
    hex), bit j contributes +1 if set else -1; output bit j = 1 iff the sum
    is positive. One explode (tokens) + one aggregate with ``bits`` codegen
    sum expressions — no per-bit row amplification."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )
    toks = toks.select(id_col, h.alias("_h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"_s{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(bits):
        # NULL sums (token-less doc joined below) fall through to 0
        term = F.when(
            F.col(f"_s{j}") > 0, F.lit(1).cast("long") * F.lit(2 ** j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    # left join back so empty/whitespace-only docs keep a row (simhash 0)
    # instead of silently vanishing from the output
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(id_col, sim.alias("simhash"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame = None,
    counts: DataFrame = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given (id_a, id_b) pairs:
    |A ∩ B| / |A ∪ B| over distinct char n-grams.

    PAIR-DRIVEN plan: expand each pair by its left doc's shingles, then
    equi-join on ``(id_b, shingle)``. Work is Σ over pairs of |shingles(a)|
    — linear in the candidate list. (The tempting alternative — self-join
    the shingle relation on shingle value and filter to pairs afterwards —
    is quadratic in the posting-list length of hot shingles: with
    boilerplate 8-grams shared by most of a web corpus it explodes before
    the filter can save it; measured 42 s vs 3 s at sf0.1.)

    ``counts`` (id, n_sh) lets the caller pass per-doc shingle counts it
    already has (e.g. fused into the MinHash aggregate) instead of this
    function re-scanning the shingle relation for them."""
    sh = (
        shingles
        if shingles is not None
        else char_shingles(df, n=n, text_col=text_col, id_col=id_col)
    )
    if counts is None:
        counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    else:
        counts = counts.select(id_col, "n_sh")
    # JOIN SIDES ARE LOAD-BEARING: the shingle relation is checkpointed,
    # so Catalyst has no stats for it and (measured) elects to BROADCAST
    # it on both verify joins — the full corpus-sized posting table
    # through the driver: superlinear wall at 4x10^4 docs, OOM beyond,
    # fatal at any real scale. The pair list is the small side by
    # construction (candidates ~ O(dups), not O(corpus)) — broadcast it
    # explicitly and pin the posting join to sort-merge.
    common = (
        F.broadcast(pairs)
        .join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
        .join(
            sh.withColumnRenamed(id_col, "id_b").hint("merge"),
            on=["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(common, on=["id_a", "id_b"], how="left")
        .na.fill({"n_common": 0})
        .hint("broadcast")
        .join(counts.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), on="id_a")
        .hint("broadcast")
        .join(counts.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), on="id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def novelty_share(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temporal novelty per document: the fraction of its distinct char
    n-grams whose FIRST appearance in the corpus (minimum doc id =
    ingestion order) is this document. The corpus-growth curve a crawl
    pipeline watches — a feed whose novelty share decays to ~0 is
    re-crawling what the corpus already holds (the document-level analog
    of the reference's coverage `monitor`, ``geomagio/api/secure``-less
    ops view; dedup tells you WHAT to drop, novelty tells you what new
    data is WORTH ingesting).

    One shuffle: a min-window over the shingle relation (partitioned by
    shingle — the same key distribution MinHash/LSH already proved
    balanced), then a map-side-combinable per-doc aggregate. No joins,
    no driver state; at 100 TB the window key is the shingle hash space.
    Integer counts + one double division — exactly oracle-checkable."""
    from pyspark.sql import Window

    sh = char_shingles(df, n=n, text_col=text_col, id_col=id_col)
    first = F.min(id_col).over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("_first", first)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty"
            ),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    n: int = 8,
    min_df: int = 2,
    max_df: int = 4,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric near-dup (quote / subset) detection: pairs where the
    SMALLER document's shingles are >= threshold contained in the other
    — ``|A ∩ B| / min(|A|, |B|)``. Jaccard misses these (a short quote
    inside a long page has tiny |∩|/|∪|); containment is the dedup
    signal for boilerplate extraction and quote-chain collapse.

    Scale shape: candidates are blocked on RARE shingles (document
    frequency in [min_df, max_df]) — a contained quote shares its rare
    n-grams with its source while hot boilerplate shingles never form
    candidates, and the per-shingle pair fan-out is bounded by
    max_df^2. Verification is the pair-driven exact intersection count
    (linear in candidates, same plan as :func:`ngram_jaccard_pairs` —
    broadcast pairs, merge-join posting side). The threshold compares as
    cross-multiplied INTEGERS (den*|∩| >= num*min) so the cut is
    bit-exact in any engine; the reported containment is one double
    division of exact integers."""
    sh = char_shingles(
        df, n=n, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    posting = sh.join(
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df").between(min_df, max_df))
        .select("shingle"),
        "shingle",
        "left_semi",
    )
    pairs = (
        posting.select("shingle", F.col(id_col).alias("id_a"))
        .join(posting.select("shingle", F.col(id_col).alias("id_b")), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    common = (
        F.broadcast(pairs)
        .join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
        .join(
            sh.withColumnRenamed(id_col, "id_b").hint("merge"),
            on=["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    return (
        common.hint("broadcast")
        .join(
            counts.withColumnRenamed(id_col, "id_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            on="id_a",
        )
        .hint("broadcast")
        .join(
            counts.withColumnRenamed(id_col, "id_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            on="id_b",
        )
        .where(
            F.col("n_common") * threshold_den
            >= F.least("n_a", "n_b") * threshold_num
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / F.least("n_a", "n_b")
            ).alias("containment"),
        )
    )


def near_dup_pairs_verified(
    df: DataFrame,
    k: int = 16,
    shingle_n: int = 8,
    bands: int = 4,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: MinHash-LSH candidates verified by exact
    n-gram Jaccard. The shingle relation feeds BOTH the signature and the
    verification stage, and Spark's exchange reuse cannot bridge their
    different shuffle keys — so it is persisted once here (the dominant
    cost: one explode + hash over every document). Deterministic end to
    end (fixed permutations, md5 band hashes) — exactly oracle-checkable
    despite the candidate stage being an approximation.

    The shared relation is a *lazy local checkpoint*, not a ``persist``:
    a persist would sit in the CacheManager until ``clearCache()`` — a
    storage leak in a long-lived session — while checkpoint blocks are
    released by the ContextCleaner as soon as the result DataFrame is
    garbage-collected. Exchange reuse can't do it: the two consumers
    shuffle on different keys."""
    sh = char_shingles(df, n=shingle_n, text_col=text_col, id_col=id_col)
    sh = sh.localCheckpoint(eager=False)
    # minhash + per-doc shingle counts FUSED into one aggregate: the two
    # consumers (LSH banding, Jaccard denominators) then share the
    # aggregate's exchange (ReusedExchange) — one pass over the shingle
    # relation instead of two
    sigs_counts = minhash_signatures(
        df, k=k, shingle_n=shingle_n, text_col=text_col, id_col=id_col,
        seed=seed, shingles=sh, with_counts=True,
    )
    cands = lsh_candidate_pairs(
        sigs_counts.select(id_col, "minhash"), bands=bands, id_col=id_col, k=k
    )
    return ngram_jaccard_pairs(
        df, cands, n=shingle_n, text_col=text_col, id_col=id_col,
        shingles=sh, counts=sigs_counts.select(id_col, "n_sh"),
    ).where(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over an undirected edge list -> (id, component)
    where ``component`` is the minimum node id in each component.

    Iterative min-label propagation with pointer jumping — the scalable
    DataFrame form of union-find (cf. "Connected Components in MapReduce
    and Beyond", Kiveris et al. 2014; GraphX runs the same label-propagation
    shape). Each round:

      1. neighbor-min:  label(v) <- min(label(v), min_{u~v} label(u))
         (one join edges x labels + one groupBy — shuffle keyed on node id)
      2. pointer jump:  label(v) <- min(label(v), label(label(v)))
         (labels self-join — halves pointer-chain depth each round)

    Labels are monotone non-increasing and bounded below by the component
    minimum; at fixpoint every edge has equal labels on both ends, so each
    component is uniformly labeled with its min id. Neighbor-min alone
    needs O(diameter) rounds (a chain of verified near-dups can be long);
    the pointer jump cuts that to O(log diameter).

    Scale shape: the edge list is the *verified near-dup pairs* — orders of
    magnitude smaller than the corpus — and every round is two joins
    shuffling on node id. Each round's labels are eagerly
    ``localCheckpoint``-ed: without it the lineage (and Catalyst plan)
    doubles per iteration and planning time explodes around round ~10; with
    it the per-round plan is constant-size and old checkpoint blocks are
    freed by the ContextCleaner. Driver traffic is one boolean
    (converged-yet) per round — no labels ever reach the driver."""
    sym = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    edges = sym.distinct().localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("component").alias("_nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nl").alias("_nbr_min"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("_nbr_min", "component")
            ).alias("component"),
        )
        # the round's previous label travels through as _old so the
        # convergence probe below is a filter on the checkpointed frame,
        # not another labels join job
        jumped = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("_pid"), F.col("component").alias("_pl")
                ),
                F.col("x.component") == F.col("_pid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.col("x._old").alias("_old"),
                F.least(
                    F.col("x.component"), F.coalesce("_pl", F.col("x.component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.where(F.col("component") != F.col("_old")).limit(1).count()
        )
        labels = jumped.select("id", "component")
        if changed == 0:
            break
    return labels


def near_dup_clusters(
    df: DataFrame,
    k: int = 16,
    shingle_n: int = 8,
    bands: int = 4,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_iter: int = 30,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidates -> exact
    Jaccard verification -> connected components -> canonical selection.

    Output: one row per input document — (id_col, cluster_id,
    is_canonical). ``cluster_id`` is the minimum doc id of the document's
    near-dup component (its own id for singletons); ``is_canonical`` marks
    the one kept representative per cluster, so
    ``where(is_canonical)`` IS the deduplicated corpus manifest.

    Deterministic end to end (fixed permutations, md5 band hashes, min-id
    canonicalization) — exactly oracle-checkable against a recursive-CTE
    transitive closure."""
    pairs = near_dup_pairs_verified(
        df, k=k, shingle_n=shingle_n, bands=bands, threshold=threshold,
        text_col=text_col, id_col=id_col, seed=seed,
    )
    comp = connected_components(pairs, max_iter=max_iter)
    return (
        df.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))
    )


def cluster_weights(
    clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup-aware sampling weights: every document gets weight
    1/|its near-dup cluster|, so a training-data sampler that keeps ALL
    copies (for freshness / formatting diversity) still gives each
    distinct content unit one unit of total probability mass — the
    soft alternative to hard canonical-only dedup. ONE shuffle: a
    count-window on cluster_id (the relation is corpus-sized — every
    singleton is its own cluster — so a groupBy+join would shuffle twice
    and a broadcast would ship the corpus through the driver). Exact:
    integer sizes, one double division."""
    from pyspark.sql import Window

    size = F.count("*").over(Window.partitionBy("cluster_id"))
    return clusters.select(
        id_col,
        "cluster_id",
        size.alias("cluster_size"),
    ).withColumn("weight", F.lit(1.0) / F.col("cluster_size"))


def sparse_cosine_topk(
    df: DataFrame,
    k: int = 3,
    n: int = 3,
    df_max: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical (sparse count-vector) cosine top-k over word n-gram
    shingles via a posting-list self-join — the term-space counterpart
    of the embedding knn family (similarity.py) and the classic
    bag-of-shingles near-dup scorer.

    Plan (all sufficient statistics BIGINT):

    1. tf per (doc, shingle) — one codegen'd explode over gram end
       positions, one shuffle.
    2. document-frequency cap: shingles in more than ``df_max`` docs are
       dropped from the posting AND the norms (cosine is computed in the
       capped term space on both sides of the fraction). This is the
       skew control — the self-join below costs Σ df² per shingle, and
       at web scale boilerplate n-grams have posting lists ~O(corpus);
       capping bounds the join by construction instead of trusting AQE
       to notice.
    3. pairs: posting self-join on shingle (id_a < id_b), map-side
       partial ``Σ tf_a·tf_b``. The three consumers of the tf relation
       (norms + both join sides) share one exchange (ReusedExchange).
    4. ``cos = dot / (sqrt(n2_a)·sqrt(n2_b))`` — the ONLY double tree,
       sqrts kept factored, so the value is bit-identical in any IEEE
       engine and the top-k order is engine-independent.
    5. mirror pairs, ``row_number`` per doc (cos DESC, other_id ASC).
    """
    from . import textops as TX

    grams = TX._exploded_gram_index(df, n, text_col, id_col).select(
        id_col, TX._gram_at(F.col("w"), F.col("i"), n).alias("shingle")
    )
    # the tf relation (the inverted index) feeds FOUR consumers (df cap,
    # norms, both self-join sides); without a checkpoint Catalyst/AQE
    # fails to reuse the exchange across them and re-tokenizes the corpus
    # per consumer (measured: 12 FileScans, 0 ReusedExchange). EAGER so
    # runtime sizes are known and AQE can size-validate the joins.
    tf = (
        grams.groupBy(id_col, "shingle")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("shingle").agg(F.count("*").alias("df"))
    posting = (
        tf.join(dfreq.where(F.col("df") <= df_max), "shingle")
        .select(id_col, "shingle", "tf")
        .localCheckpoint(eager=True)
    )
    n2 = posting.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = posting.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("tf").alias("tf_a")
    )
    b = posting.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("tf").alias("tf_b")
    )
    pairs = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    mirrored = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "dot"
        )
    )
    scored = (
        mirrored.join(
            n2.select(F.col(id_col).alias("id_a"), F.col("n2").alias("n2_a")),
            "id_a",
        )
        .join(
            n2.select(F.col(id_col).alias("id_b"), F.col("n2").alias("n2_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2_a").cast("double"))
                    * F.sqrt(F.col("n2_b").cast("double"))
                )
            ).alias("cos"),
        )
    )
    wnd = Window.partitionBy("id_a").orderBy(
        F.col("cos").desc(), F.col("id_b")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wnd))
        .where(F.col("rn") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("other_id"),
            F.col("rn").cast("int").alias("rank"),
            "dot",
            "cos",
        )
    )
