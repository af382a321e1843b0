"""Approximate-nearest-neighbor search over embedding columns.

Two paths over ``(vec_id long, embedding array<float>, ...)``:

- brute-force cosine top-k (the exactness baseline): JVM-side
  ``zip_with``/``aggregate`` dot products over a broadcast query set —
  no Python, no UDF; per-partition ranking then global top-k.
- LSH-bucketed (the 100 TB path): random-hyperplane sign buckets from the
  same deterministic hash machinery as dedup; candidates only within the
  query's bucket — turns the N×Q cross product into a bucket-local join.

Cosine values are rounded (6 dp) before ranking so results are stable
across summation orders, and ties break on neighbor id — which makes the
brute-force path exactly reproducible in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )


def _nonzero(df: DataFrame, vec_col: str) -> DataFrame:
    """Drop zero-norm vectors: their cosine is undefined (Spark returns
    NULL on the 0/0 division) and a window rank would still hand them out
    as top-k 'neighbors'."""
    return df.where(_norm(vec_col) > 0)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k ranking: round-6 cosine desc, neighbor-id tie-break."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (excluding self).

    The query side is broadcast (queries << corpus at scale), so the plan
    is one scan of the corpus with a broadcast nested-loop of |Q| dot
    products per row — embarrassingly parallel, no shuffle until the final
    per-query top-k (k rows per query via window rank on the tiny result)."""
    q = _nonzero(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = _nonzero(corpus, vec_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    joined = c.crossJoin(F.broadcast(q)).where(F.col("q_id") != F.col("n_id"))
    sim = _dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    return _rank_topk(scored, k)


def auto_n_planes(n_vectors: int, target_occupancy: int = 64) -> int:
    """Corpus-sized bucket dial: enough sign-planes that the EXPECTED
    bucket occupancy is ~``target_occupancy`` (2^planes buckets), so
    within-bucket pairwise work stays ~linear as the corpus grows —
    with a fixed plane count, occupancy grows with N and the bucket
    join degrades quadratically (measured 54x time at 32x data in
    ``BENCH/BIGDOCS_PROBE.json``; restored to ~linear by this rule)."""
    import math

    if n_vectors <= target_occupancy:
        return 1
    return max(1, math.ceil(math.log2(n_vectors / target_occupancy)))


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | str = 0,
    seed: int = 42,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine) with
    cosine >= threshold. ``n_planes=0`` is the exact all-pairs baseline
    (test scale); ``n_planes>0`` restricts candidates to shared hyperplane
    buckets — the 100 TB path where the join is bucket-local. Explicit
    ``planes`` literals make the bucketing exactly oracle-checkable.
    ``n_planes="auto"`` sizes the dial from the corpus count
    (:func:`auto_n_planes`; one count() planning scan)."""
    corpus = _nonzero(corpus, vec_col)
    if isinstance(n_planes, str):
        if n_planes != "auto":
            raise ValueError(f"n_planes must be an int or 'auto': {n_planes!r}")
        if planes is not None:
            # silently ignoring caller-pinned oracle planes would change
            # the buckets behind their back
            raise ValueError("explicit planes cannot combine with n_planes='auto'")
        n_planes = auto_n_planes(corpus.count())
    if n_planes > 0:
        ba = hyperplane_bucket(
            corpus, n_planes, id_col, vec_col, seed, planes
        ).select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
        )
        bb = hyperplane_bucket(
            corpus, n_planes, id_col, vec_col, seed, planes
        ).select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
        )
        joined = ba.join(bb, on="bucket").where(F.col("id_a") < F.col("id_b"))
    else:
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        joined = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    sim = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (
        joined.select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def md5_sign_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplane normals from md5 — engine-independent
    (hashlib here, reproducible as literals in any SQL dialect), so a
    bucketed ANN/near-dup query can be checked by an exact DuckDB oracle
    carrying the same literal matrix."""
    import hashlib

    planes = []
    for i in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed + i},{d}".encode()).digest()
            row.append(1.0 if h[0] % 2 else -1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Sign-random-projection bucket id per vector.

    Default: plane i's normal has components sign-derived from
    xxhash64(i, dim) — deterministic, computed JVM-side as an aggregate
    over the zipped (value, dim) array. With ``planes`` (e.g. from
    :func:`md5_sign_planes`), the normals are plan-time literal arrays
    instead — constant-folded into codegen like ``ivf_assign``'s
    centroids, and exactly reproducible by an external SQL oracle."""
    bucket = None
    for i in range(n_planes):
        if planes is not None:
            lits = ", ".join(f"{x:.17g}D" for x in planes[i])
            proj = F.expr(
                f"aggregate(zip_with({vec_col}, array({lits}),"
                f" (x, y) -> cast(x as double) * y), cast(0.0 as double),"
                f" (acc, v) -> acc + v)"
            )
        else:
            proj = F.expr(
                f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
                f" (x, d) -> cast(x as double) * (cast(pmod(xxhash64({seed + i}, d), 2) as double) * 2.0 - 1.0)),"
                f" cast(0.0 as double), (acc, v) -> acc + v)"
            )
        bit = F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(id_col, vec_col, bucket.cast("long").alias("bucket"))


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample_n: int = 4096,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Train IVF coarse centroids with Lloyd's k-means on a driver-side
    sample. The sample stays tiny regardless of corpus size (a few thousand
    vectors is enough to place coarse cells at 10^12 rows — IVF quality
    depends on cell *placement*, not on seeing every vector), so this is
    the one legitimately driver-side step of the index build; everything
    after (assignment, search) is distributed.

    Deterministic: sample = first ``sample_n`` ids in order, k-means++-style
    farthest-point init from a seeded RNG, fixed iteration count."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(sample_n))
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(int(n_centroids), len(x))
    rng = np.random.default_rng(seed)
    # k-means++ init on the normalized sample
    cents = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((x - c) ** 2, axis=1) for c in cents], axis=0
        )
        if d2.sum() <= 0:
            break  # degenerate sample (all duplicates): fewer cells suffice
        probs = d2 / d2.sum()
        cents.append(x[rng.choice(len(x), p=probs)])
    k = len(cents)
    c = np.asarray(cents)
    for _ in range(int(n_iter)):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(v) for v in row] for row in c]


#: above this cell count the literal-folded assignment plan explodes
#: (codegen/plan size grows as C×dim — Janino method limits, multi-MB
#: serialized plans); the broadcast variant takes over
MAX_LITERAL_CELLS = 64


def _normalized_centroids(centroids: list[list[float]]):
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_literal_cells: int = MAX_LITERAL_CELLS,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest coarse cells (by cosine).

    Map-only plan — no join keyed on the corpus, no shuffle: the centroid
    matrix is normalized at plan time (so the per-row score is just a dot
    product whose argmax equals cosine argmax), each row computes its C
    cell scores, sorts the tiny (score, cell) struct array, and explodes
    the top ``n_probe``. At 100 TB this is the difference between a free
    pass over the corpus and a corpus-wide shuffle. Ties break on cell id
    (struct ordering). Output: id, vec, cell.

    Two physical strategies with identical results:

    - ``C <= max_literal_cells``: the matrix is folded into the expression
      as literals — everything inside whole-stage codegen (measured 4.3×
      vs a join at small C).
    - ``C > max_literal_cells`` (production IVF wants 10⁴–10⁵ cells at
      10⁹+ vectors, where literal folding exceeds Janino/plan limits):
      the matrix ships ONCE per executor as a broadcast one-row
      ``array<array<double>>`` cross-joined onto the corpus
      (BroadcastNestedLoopJoin adds one column, no corpus-side Exchange),
      and the same score/sort/slice runs as a ``transform`` over the
      broadcast array — plan size O(1) in C."""
    c = _normalized_centroids(centroids)
    if len(c) > max_literal_cells:
        return _ivf_assign_broadcast(df, c, n_probe, id_col, vec_col)
    scores = []
    for j, row in enumerate(c):
        lits = ", ".join(f"{x:.17g}D" for x in row)
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, array({lits}),"
            f" (x, y) -> cast(x as double) * y), cast(0.0 as double),"
            f" (acc, v) -> acc + v)"
        )
        scores.append(F.struct((-dot).alias("ns"), F.lit(j).alias("cell")))
    ranked = F.slice(F.array_sort(F.array(*scores)), 1, int(n_probe))
    return df.select(
        id_col,
        vec_col,
        F.explode(F.transform(ranked, lambda s: s["cell"])).alias("cell"),
    )


def _ivf_assign_broadcast(
    df: DataFrame,
    normalized,  # (C, dim) float64 ndarray, rows unit-norm
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The large-C assignment path: centroids travel as broadcast DATA, not
    plan literals. Bitwise-identical to the literal path — same doubles
    (float64 round-trips exactly through createDataFrame), same left-fold
    summation order, same (ns, cell) struct tie-break."""
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [([[float(v) for v in row] for row in normalized],)],
        "__cents array<array<double>>",
    )
    ranked = F.expr(
        f"slice(array_sort(transform(__cents, (c, j) -> named_struct("
        f"'ns', -aggregate(zip_with({vec_col}, c,"
        f" (x, y) -> cast(x as double) * y), cast(0.0 as double),"
        f" (acc, v) -> acc + v), 'cell', j))), 1, {int(n_probe)})"
    )
    return (
        df.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            vec_col,
            F.explode(F.transform(ranked, lambda s: s["cell"])).alias("cell"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    coarse cell; each query probes its ``n_probe`` nearest cells and scores
    only those cells' members. The corpus-side index (assignment) is what a
    persisted IVF table would store — partitioned by ``cell``, so a probe
    reads ``n_probe / C`` of the data (partition pruning), vs the
    hyperplane-LSH variant's hash buckets. Recall rises with ``n_probe`` at
    linear cost — the standard IVF quality/latency dial."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
        )
    corpus = _nonzero(corpus, vec_col)
    queries = _nonzero(queries, vec_col)
    cb = ivf_assign(corpus, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "cell"
    )
    qb = ivf_assign(queries, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "cell"
    )
    joined = cb.join(F.broadcast(qb), on="cell").where(F.col("q_id") != F.col("n_id"))
    sim = _dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    return _rank_topk(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    (equi-join on bucket — the scale path: shuffle is bucket-local).
    Explicit ``planes`` literals (see :func:`md5_sign_planes`) make the
    bucketing exactly oracle-checkable."""
    cb = hyperplane_bucket(
        _nonzero(corpus, vec_col), n_planes, id_col, vec_col, seed, planes
    ).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "bucket"
    )
    qb = hyperplane_bucket(
        _nonzero(queries, vec_col), n_planes, id_col, vec_col, seed, planes
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    joined = cb.join(F.broadcast(qb), on="bucket").where(
        F.col("q_id") != F.col("n_id")
    )
    sim = _dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    return _rank_topk(scored, k)
