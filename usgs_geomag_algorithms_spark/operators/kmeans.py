"""Distributed Lloyd's k-means over int8-quantized vectors — the
INTEGER-EXACT trainer behind data-trained ANN indexes (IVF cells, PQ
codebooks).

``similarity.train_ivf_centroids`` fits on a driver-side sample — the
right call for coarse-cell PLACEMENT, but it never sees the full corpus.
This module is the other regime: every iteration assigns ALL vectors and
refines centroids from ALL members, as one Spark job per iteration
(exactly MLlib KMeans' shape: broadcast/literal centroids down, k×dim
partial sums up).

The trick that makes it deterministic — and therefore exactly
oracle-checkable, which float k-means never is — is keeping centroids as
INTEGER state: per-cell per-dim SUMS of the int8 vectors plus the member
COUNT, never the float mean. Assignment minimizes

    ||x - s/n||^2 - ||x||^2  =  (||s||^2 - 2 n <x, s>) / n^2

whose numerator is pure BIGINT (order-independent under any partitioning
— integer addition commutes exactly, unlike float) and whose single
terminal division is deterministic in every engine. Ties break on the
lower cell id. Integer headroom: |s_i| <= 127 n, so ||s||^2 <= 64*(127
n)^2 stays inside int64 for n up to ~3×10^6 members per cell; beyond
that the sums must be re-centered or the cell split (a 10^12-corpus fit
uses k large enough that cells stay far below this).

Per-iteration cost at 100 TB: one corpus scan (map-only literal/
broadcast assignment — same physical strategies as ``ivf_assign``), one
aggregate whose map-side partials are k×dim longs per partition, and a
k×dim collect (a few KB — the one legitimately driver-side step, as in
MLlib). Nothing corpus-sized ever shuffles or lands on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .quantize import quantize_int8

#: state: list over cells of (per-dim integer sums, member count)
State = list[tuple[list[int], int]]


def _cell_scores(state: State) -> F.Column:
    """Sorted array of (score, cell) structs — the integer-exact
    squared-distance ranking against every cell of ``state``. Map-only:
    the state folds into the expression tree as ONE nested-array literal
    indexed inside a ``transform(sequence)`` lambda (k×dim ints; the
    broadcast variant of ``ivf_assign`` is the shape to swap in past the
    literal ceiling). The numerator ``s2 - 2n·<x,s>`` stays pure BIGINT;
    the single terminal division is by the exact double n² (n ≤ ~3×10⁶
    per the headroom note above, so n² < 2⁵³ is exact)."""
    from .pq import _nested_array_lit, _pin

    k = len(state)
    sums_lit = _nested_array_lit(sums for sums, _ in state)
    s2_lit = "array(" + ", ".join(
        f"cast({sum(int(v) * int(v) for v in sums)} as bigint)"
        for sums, _ in state
    ) + ")"
    n_lit = "array(" + ", ".join(
        f"cast({int(n)} as bigint)" for _, n in state
    ) + ")"
    return F.expr(
        f"array_sort(transform(sequence(0, {_pin(k - 1, 'qvec')}), c ->"
        f" named_struct('sc',"
        f" cast(element_at({s2_lit}, c + 1)"
        f" - 2 * element_at({n_lit}, c + 1)"
        f" * aggregate(zip_with(qvec, element_at({sums_lit}, c + 1),"
        f" (x, y) -> cast(x as bigint) * y),"
        f" cast(0 as bigint), (acc, v) -> acc + v) as double)"
        f" / cast(element_at({n_lit}, c + 1)"
        f" * element_at({n_lit}, c + 1) as double),"
        f" 'cell', cast(c as int))))"
    )


def _assign_cells(q: DataFrame, state: State) -> DataFrame:
    """Add ``cell``: argmin of the integer-exact squared-distance score."""
    return q.withColumn("cell", _cell_scores(state)[0]["cell"])


def _aggregate_state(assigned: DataFrame) -> DataFrame:
    """(cell, i, csum, n): per-cell per-dim integer sums + member count.
    One hash aggregate; map-side partials are k×dim longs."""
    return (
        assigned.select("cell", F.posexplode("qvec").alias("i", "qx"))
        .groupBy("cell", "i")
        .agg(
            F.sum("qx").alias("csum"),
            F.count("*").alias("n"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Run ``n_iter`` Lloyd's iterations; return the FINAL state table
    (cell, i, csum, n) as a DataFrame — flat so it is exactly
    hash-comparable (and what a persisted centroid table would store;
    the float centroid is ``csum / n`` on read).

    Init is the k lowest-id vectors (deterministic; k-means++ placement
    belongs to the sample-based trainer). A cell that loses all members
    carries its previous state forward — same rule in the oracle."""
    if int(n_iter) < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    spark = df.sparkSession
    q = quantize_int8(df, vec_col=vec_col, id_col=id_col).select(
        id_col, "qvec"
    )
    seeds = q.orderBy(id_col).limit(int(k)).collect()
    if len(seeds) < int(k):
        raise ValueError(
            f"corpus has only {len(seeds)} non-zero vectors < k={k}"
        )
    state: State = [([int(v) for v in r["qvec"]], 1) for r in seeds]
    dim = len(state[0][0])
    for it in range(int(n_iter)):
        if vectorized:
            # Arrow kernel assign (bit-identical to _assign_cells; the
            # SQL path below stays as the audited pure-JVM spec)
            from .annkernels import ivf_assign_arrow

            assigned = ivf_assign_arrow(
                df, state, id_col, vec_col, out_id=id_col
            )
        else:
            assigned = _assign_cells(q, state)
        agg = _aggregate_state(assigned)
        if it < int(n_iter) - 1:
            rows = agg.collect()  # k×dim rows — bounded by k, not data
            nxt: dict[int, tuple[list[int], int]] = {}
            for r in rows:
                sums, _ = nxt.setdefault(
                    int(r["cell"]), ([0] * dim, int(r["n"]))
                )
                sums[int(r["i"])] = int(r["csum"])
            state = [nxt.get(c, state[c]) for c in range(len(state))]
        else:
            prior = spark.createDataFrame(
                [
                    (c, i, int(s), int(n))
                    for c, (sums, n) in enumerate(state)
                    for i, s in enumerate(sums)
                ],
                "cell int, i int, csum bigint, n bigint",
            )
            missing = prior.join(
                agg.select("cell").distinct(), "cell", "left_anti"
            )
            return agg.unionByName(missing).orderBy("cell", "i")
    raise AssertionError("unreachable: n_iter validated >= 1")


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> list[list[float]]:
    """Full-corpus-trained float centroids (csum/n, optionally unit-norm)
    in the list-of-lists shape ``ivf_assign``/``ivf_topk`` take — the
    distributed alternative to ``train_ivf_centroids``'s sample fit."""
    rows = kmeans_fit(df, k, n_iter, id_col, vec_col).collect()
    out = []
    for sums, n in state_from_rows(rows, int(k)):
        v = [s / n for s in sums]
        if normalize:
            nrm = sum(x * x for x in v) ** 0.5
            if nrm > 0:
                v = [x / nrm for x in v]
        out.append(v)
    return out


def state_from_rows(rows, k: int) -> State:
    """Rebuild the literal State from a collected kmeans_fit table."""
    cells: dict[int, dict[int, int]] = {}
    ns: dict[int, int] = {}
    for r in rows:
        cells.setdefault(int(r["cell"]), {})[int(r["i"])] = int(r["csum"])
        ns[int(r["cell"])] = int(r["n"])
    if sorted(cells) != list(range(k)):
        raise ValueError(f"state table missing cells: have {sorted(cells)}")
    dim = max(cells[0]) + 1
    return [
        ([cells[c].get(i, 0) for i in range(dim)], ns[c]) for c in range(k)
    ]


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    km_k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """DATA-TRAINED IVF ANN, exactly checkable end-to-end: train the
    integer-state k-means on the corpus, assign every corpus vector to
    its argmin cell, probe each query's ``n_probe`` nearest cells, and
    score candidates by int8 cosine — (q_id, n_id, cosine, rank).

    Every stage is deterministic: the trained state is integer sums (no
    float-centroid drift), cell ranking is the integer-numerator score,
    and the probe cosine is an integer-ratio double. That closes the gap
    the sample-trained ``knn_ivf`` documents (rows-only BY DESIGN because
    float k-means is not oracle-expressible): the trained index itself is
    now exactly reproducible in SQL.

    Scale shape: training as ``kmeans_fit`` (one scan/iteration);
    assignment map-only; the probe join is cell-local with the tiny query
    side broadcast — one corpus scan, shuffle bounded by candidates."""
    from .quantize import _qdot, _qnorm2
    from .similarity import _rank_topk

    state = state_from_rows(
        kmeans_fit(corpus, km_k, n_iter, id_col, vec_col).collect(), km_k
    )
    qq = quantize_int8(queries, vec_col=vec_col, id_col=id_col)
    if vectorized:
        from .annkernels import ivf_assign_arrow

        # Arrow kernel: quantize + assign in one pass, bit-identical to
        # the _assign_cells expression (equality asserted in tests); the
        # SQL path below stays as the oracle-checkable specification
        corpus_cells = ivf_assign_arrow(
            corpus, state, id_col, vec_col, out_id="n_id"
        ).select("n_id", F.col("qvec").alias("qn"), "cell")
    else:
        qc = quantize_int8(corpus, vec_col=vec_col, id_col=id_col)
        corpus_cells = _assign_cells(qc, state).select(
            F.col(id_col).alias("n_id"), F.col("qvec").alias("qn"), "cell"
        )
    probes = qq.select(
        F.col(id_col).alias("q_id"),
        F.col("qvec").alias("qq"),
        F.explode(
            F.slice(_cell_scores(state), 1, int(n_probe))["cell"]
        ).alias("cell"),
    )
    joined = corpus_cells.join(F.broadcast(probes), "cell").where(
        F.col("q_id") != F.col("n_id")
    )
    cos = _qdot("qq", "qn").cast("double") / (
        F.sqrt(_qnorm2("qq").cast("double"))
        * F.sqrt(_qnorm2("qn").cast("double"))
    )
    return _rank_topk(joined.select("q_id", "n_id", cos.alias("cosine")), k)
