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
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    joined = c.crossJoin(F.broadcast(q)).where(F.col("q_id") != F.col("n_id"))
    sim = (_dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))).alias("_sim")
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine) with
    cosine >= threshold. ``n_planes=0`` is the exact all-pairs baseline
    (test scale); ``n_planes>0`` restricts candidates to shared hyperplane
    buckets — the 100 TB path where the join is bucket-local."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if n_planes > 0:
        ba = hyperplane_bucket(corpus, n_planes, id_col, vec_col, seed).select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
        )
        bb = hyperplane_bucket(corpus, n_planes, id_col, vec_col, seed).select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
        )
        joined = ba.join(bb, on="bucket").where(F.col("id_a") < F.col("id_b"))
    else:
        joined = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    sim = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (
        joined.select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def hyperplane_bucket(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-random-projection bucket id per vector: plane i's normal has
    components sign-derived from xxhash64(i, dim) — deterministic, computed
    JVM-side as an aggregate over the zipped (value, dim) array."""
    bucket = None
    for i in range(n_planes):
        proj = F.expr(
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
            f" (x, d) -> cast(x as double) * (cast(pmod(xxhash64({seed + i}, d), 2) as double) * 2.0 - 1.0)),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bit = F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(id_col, vec_col, bucket.cast("long").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    (equi-join on bucket — the scale path: shuffle is bucket-local)."""
    cb = hyperplane_bucket(corpus, n_planes, id_col, vec_col, seed).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "bucket"
    )
    qb = hyperplane_bucket(queries, n_planes, id_col, vec_col, seed).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    joined = cb.join(F.broadcast(qb), on="bucket").where(
        F.col("q_id") != F.col("n_id")
    )
    sim = (_dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))).alias("_s")
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )
