"""Int8 embedding quantization + quantized similarity search.

At 10^9+ vectors the ANN working set is dominated by the embedding bytes:
float32 x 64 dims = 256 B/vector; symmetric int8 cuts that 4x (64 B + one
float64 scale), which is the difference between a broadcast/bucket probe
that fits executor memory and one that spills. The standard serving trade
(FAISS SQ8): quantize once at ingest, score candidates on integers,
optionally re-rank survivors against the float vectors.

Quantization is per-vector symmetric: scale = max|x| / 127,
q_i = floor(x_i / max|x| * 127 + 0.5) — round-half-up via floor so the
arithmetic is engine-exact (both Spark's and DuckDB's ``round`` disagree
on binary-boundary doubles; ``floor`` never does). Every downstream dot
product and squared norm is then INTEGER math (|q| <= 127, so a 64-dim
dot <= ~10^6 fits BIGINT with ~12 orders of headroom) — the quantized
cosine is bit-exact in any engine, which makes the whole quantized ANN
path oracle-checkable WITHOUT the round-6 ulp armor the float path needs.

Scale shape is identical to ``similarity.cosine_topk``: quantization is a
map-only projection (no shuffle, whole-stage codegen), the query side
broadcasts, one corpus scan scores candidates. The int8 column is the one
you persist: scoring reads 4x fewer bytes per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _rank_topk


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "qvec",
) -> DataFrame:
    """(id, qvec array<int> in [-127, 127], scale double): per-vector
    symmetric int8 quantization. Zero vectors (max|x| = 0) are dropped —
    their direction is undefined (same contract as similarity._nonzero).
    Dequantization is ``q_i * scale``; |dequant - x| <= scale/2."""
    mx = F.expr(
        f"aggregate(transform({vec_col}, x -> abs(cast(x as double))),"
        f" cast(0.0 as double), (a, v) -> greatest(a, v))"
    )
    q = F.expr(
        f"transform({vec_col}, x ->"
        f" cast(floor(cast(x as double) / _mx * 127.0 + 0.5d) as int))"
    )
    return (
        df.select(id_col, vec_col, mx.alias("_mx"))
        .where(F.col("_mx") > 0)
        .select(
            id_col,
            q.alias(out_col),
            (F.col("_mx") / F.lit(127.0)).alias("scale"),
        )
    )


def _qdot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * y),"
        f" cast(0 as bigint), (acc, v) -> acc + v)"
    )


def _qnorm2(a: str) -> F.Column:
    return F.expr(
        f"aggregate(transform({a}, x -> cast(x as bigint) * x),"
        f" cast(0 as bigint), (acc, v) -> acc + v)"
    )


def cosine_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by QUANTIZED cosine: (q_id, n_id, cosine, rank). The per-vector
    scales cancel in the cosine, so the score is a pure integer-ratio
    double — deterministic under any summation order, no rounding needed
    before the rank (ties still break on neighbor id)."""
    qc = quantize_int8(corpus, vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("n_id"), F.col("qvec").alias("qn")
    )
    qq = quantize_int8(queries, vec_col=vec_col, id_col=id_col).select(
        F.col(id_col).alias("q_id"), F.col("qvec").alias("qq")
    )
    joined = qc.join(F.broadcast(qq), on=F.col("q_id") != F.col("n_id"))
    cos = _qdot("qq", "qn").cast("double") / (
        F.sqrt(_qnorm2("qq").cast("double"))
        * F.sqrt(_qnorm2("qn").cast("double"))
    )
    scored = joined.select("q_id", "n_id", cos.alias("cosine"))
    return _rank_topk(scored, k)


def _qvec_sql(vec_col: str) -> str:
    """Inline int8 quantization of a float array column — the map-only
    expression form of ``quantize_int8`` for pipelines that already carry
    the vector (e.g. IVF assignment output). The max|x| sub-aggregate is
    evaluated twice per row, which is cheaper than a join to carry it."""
    mx = (
        f"aggregate(transform({vec_col}, x -> abs(cast(x as double))),"
        f" cast(0.0 as double), (a, v) -> greatest(a, v))"
    )
    return (
        f"transform({vec_col}, x ->"
        f" cast(floor(cast(x as double) / {mx} * 127.0 + 0.5d) as int))"
    )


def ivf_sq8_topk(
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
    """IVF + SQ8: coarse-cell pruning AND int8 scoring composed — the
    FAISS IVF-SQ8 layout that production ANN actually serves. The corpus
    index stores one row per vector: (cell, int8 codes) — at 10^9 vectors
    x 64 dims that is ~64 GB of codes instead of 256 GB of floats,
    partitioned by ``cell`` so a probe reads n_probe/C of it. Cell
    assignment happens at BUILD time on the float vectors (identical to
    ``similarity.ivf_topk``); probe-time scoring is pure integer math, so
    the scored stage is bit-exact in any engine (no rounding armor),
    while the assignment stage reuses the oracle-checked float plan."""
    from .similarity import (
        _nonzero,
        ivf_assign,
        train_ivf_centroids,
    )

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col, seed=seed
        )
    corpus = _nonzero(corpus, vec_col)
    queries = _nonzero(queries, vec_col)
    q_expr = _qvec_sql(vec_col)
    cb = ivf_assign(corpus, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), F.expr(q_expr).alias("qn"), "cell"
    )
    qb = ivf_assign(queries, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), F.expr(q_expr).alias("qq"), "cell"
    )
    joined = cb.join(F.broadcast(qb), on="cell").where(
        F.col("q_id") != F.col("n_id")
    )
    cos = _qdot("qq", "qn").cast("double") / (
        F.sqrt(_qnorm2("qq").cast("double"))
        * F.sqrt(_qnorm2("qn").cast("double"))
    )
    scored = joined.select("q_id", "n_id", cos.alias("cosine"))
    return _rank_topk(scored, k)


def cosine_topk_int8_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage serving search (the production SQ8 pattern): a CHEAP pass
    over the int8 column picks each query's top-``m`` candidates, then only
    those ``m`` rows re-score against the float vectors for the final
    top-``k`` — the full-precision scan shrinks corpus-size -> Q x m.

    Stage 1 reads 4x fewer bytes per row; stage 2's float re-rank join is
    driven by the candidate side (Q x m rows, broadcast) against a
    semi-pruned corpus read. Both stages are deterministic (integer stage-1
    scores; stage-2 uses the float path's round-6 + id tie-break), so the
    composed approximation has an exact oracle. ``m`` controls the usual
    recall/cost trade: stage 1's quantization noise (~0.01 cosine at 64
    dims) only costs recall when the true k-th and (m+1)-th neighbors are
    closer than the noise."""
    from .similarity import _dot, _norm

    cands = cosine_topk_int8(
        corpus, queries, k=m, vec_col=vec_col, id_col=id_col
    ).select("q_id", "n_id")
    # candidate-driven re-rank: Q x m pairs broadcast onto ONE pruned
    # corpus pass for the neighbor vectors, then a broadcast fetch of the
    # Q query vectors — the float column is never scanned corpus-wide
    n_vecs = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    joined = (
        F.broadcast(cands)
        .join(n_vecs, on="n_id")
        .join(F.broadcast(q_vecs), on="q_id")
    )
    sim = _dot("q_vec", "n_vec") / (_norm("q_vec") * _norm("n_vec"))
    scored = joined.select("q_id", "n_id", F.round(sim, 6).alias("cosine"))
    return _rank_topk(scored, k)
