"""Product quantization (PQ) ANN: m-subspace codebooks + ADC scoring.

The memory-compression step past SQ8 (operators/quantize.py): instead of
one int8 per dimension (64 B/vector at dim=64), PQ stores ONE CODE PER
SUBSPACE — m bytes/vector (m=8 here: 32x smaller than float32, 8x smaller
than SQ8). At 10^12 vectors that is the difference between an index that
fits the cluster's aggregate RAM (8 TB) and one that does not (256 TB
float32). This is FAISS's ``PQ{m}`` layout re-expressed as DataFrame ops;
reference analog: the same approximate-search role the repo's IVF/LSH
variants play (SURVEY §2 webtext extensions), one more point on the
recall/memory dial.

Engine-exactness discipline (see NOTES.md): vectors are int8-quantized
first (floor(x/max*127+0.5) — engine-exact), codewords are ±1 integers
derived from md5 parity (``similarity.md5_sign_planes``), so EVERY score
in the pipeline — encode argmax, ADC lookup, final ranking — is INTEGER
arithmetic: bit-exact under any partitioning/summation order, and the
whole plan is exactly oracle-checkable in DuckDB with the codebook
REGENERATED from md5() in SQL (no literal matrix in the oracle).

Physical plan shape (the part that must survive 100 TB):

- **encode** is map-only: the codebook folds into the expression tree as
  literals (m*ks integer dot products of d elements each — small), no
  join, no shuffle; whole-stage codegen end to end. The output ``codes``
  column (array<int> of length m) is what a persisted PQ index stores.
- **search** scans ONLY the codes column (m bytes/row), never the
  vectors: each query precomputes its ADC lookup table (m arrays of ks
  integer dots) once, the tiny query side broadcasts, and the per-row
  score is m array lookups + m integer adds. One corpus scan, zero
  corpus-side shuffle, final top-k on the k*|Q| survivor rows only.

Trained codebooks (``kmeans.py``) plug into the same encode/search via
the ``codebooks`` argument; the md5 variant exists so the plan itself is
exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .quantize import quantize_int8
from .similarity import md5_sign_planes

#: default geometry: dim 64 -> 8 subspaces x 8 dims, 16 codes each.
PQ_M = 8
PQ_KS = 16
PQ_SEED = 23


def md5_sign_codebooks(
    m: int = PQ_M, ks: int = PQ_KS, d: int = 8, seed: int = PQ_SEED
) -> list[list[list[int]]]:
    """Deterministic ±1 PQ codebooks: ``cb[s][c][j]`` is the md5-parity
    sign for plane index ``s*ks + c``, dim ``j`` — the exact layout
    ``md5_sign_planes(m*ks, d, seed)`` produces, so the DuckDB oracle can
    regenerate the whole codebook from ``md5()`` (same trick as
    ``knn_ivf_bcast``; no VALUES literals)."""
    planes = md5_sign_planes(m * ks, d, seed=seed)
    return [
        [[int(v) for v in planes[s * ks + c]] for c in range(ks)]
        for s in range(m)
    ]


def _nested_array_lit(rows) -> str:
    """Render rows of ints as ONE nested ``array(array(...), ...)`` SQL
    literal. Folding the whole codebook/plane matrix into a single parsed
    expression (indexed by ``element_at`` inside ``transform(sequence)``
    lambdas) keeps plan analysis O(1) in the number of codewords — the
    per-codeword ``F.expr`` folds this replaced made analysis+codegen the
    dominant cost of every PQ/IVF query (~10x the scan time at bench
    scale)."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(str(int(v)) for v in r) + ")" for r in rows
        )
        + ")"
    )


def _pin(n: int, col: str) -> str:
    """``n`` as a SQL int expression that also REFERENCES ``col`` (a
    no-op ``+ 0 * size(col)``). Purpose: every expression this module
    builds consumes the quantized ``qvec`` exactly once, and Catalyst's
    CollapseProject inlines a single-consumer projection into its user —
    here that would inline the whole ``quantize_int8`` computation (incl.
    its max-abs fold) INSIDE the per-codeword lambda, re-quantizing the
    vector m*ks times per row (measured: 4 s -> 90 s on the flat-PQ
    bench). A second reference marks the projection as shared, so the
    quantization stays materialized once per row."""
    return f"({n} + 0 * size({col}))"


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """(id, codes array<int> of length m): per-subspace nearest-codeword
    index. With equal-norm (±1) codewords, argmin L2 == argmax dot, so
    the code is the argmax INTEGER dot over the int8 subvector; ties
    break on the lower code index (struct sort on (-dot, code)).

    Map-only / shuffle-free either way. ``vectorized=True`` (default)
    runs the Arrow/NumPy integer kernel (``annkernels.pq_index_arrow``,
    ~100x/row vs interpreted lambdas — the strategy that bounds a 10^12
    index build); ``False`` is the pure-Catalyst expression twin (the
    exact same integers; equality asserted in tests)."""
    if codebooks is None:
        codebooks = md5_sign_codebooks()
    if vectorized:
        from .annkernels import pq_index_arrow

        return pq_index_arrow(
            df, codebooks, None, id_col, vec_col, out_id=id_col
        )
    q = quantize_int8(df, vec_col=vec_col, id_col=id_col)
    return q.select(id_col, _codes_col(codebooks).alias("codes"))


def _codes_col(codebooks: list[list[list[int]]]) -> F.Column:
    """The encode expression over a ``qvec`` column: per-subspace argmax
    integer dot, ties on the lower code index. ONE parsed expression —
    the (m*ks)×d codebook is a nested array literal indexed inside the
    lambdas, not m*ks separate folds (see :func:`_nested_array_lit`)."""
    m = len(codebooks)
    ks = len(codebooks[0])
    d = len(codebooks[0][0])
    cb = _nested_array_lit(cw for sub in codebooks for cw in sub)
    return F.expr(
        f"transform(sequence(0, {_pin(m - 1, 'qvec')}), s ->"
        f" array_sort(transform(sequence(0, {ks - 1}), c ->"
        f" named_struct('ns', -aggregate(zip_with("
        f"slice(qvec, s * {d} + 1, {d}),"
        f" element_at({cb}, s * {ks} + c + 1),"
        f" (x, y) -> cast(x as bigint) * y),"
        f" cast(0 as bigint), (acc, v) -> acc + v),"
        f" 'code', cast(c as int))))[0].code)"
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    codebooks: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: (q_id, n_id, adc_score, rank).

    The corpus side is its PQ codes ONLY (m bytes/row scanned at probe
    time); each query precomputes the lookup table lut[s][c] = <q_s, cb
    [s][c]> as integer dots over its int8 subvectors, the query side
    broadcasts, and score(q, x) = sum_s lut[s][codes_x[s]] — all BIGINT,
    bit-exact, rank ties on n_id. Self-pairs are excluded."""
    if codebooks is None:
        codebooks = md5_sign_codebooks()
    enc = pq_encode(corpus, codebooks, id_col, vec_col, vectorized).select(
        F.col(id_col).alias("n_id"), "codes"
    )
    qq = quantize_int8(queries, vec_col=vec_col, id_col=id_col)
    qside = qq.select(
        F.col(id_col).alias("q_id"), _query_luts(codebooks)
    )
    joined = enc.crossJoin(F.broadcast(qside)).where(
        F.col("q_id") != F.col("n_id")
    )
    return _adc_rank(joined, len(codebooks), k)


def _query_luts(codebooks: list[list[list[int]]]) -> F.Column:
    """ADC lookup tables over a query's ``qvec`` as ONE ``luts`` column
    (array<array<bigint>>): luts[s][c] = <q_s, cb[s][c]> as integer dots.
    Single parsed expression over the nested codebook literal."""
    m = len(codebooks)
    ks = len(codebooks[0])
    d = len(codebooks[0][0])
    cb = _nested_array_lit(cw for sub in codebooks for cw in sub)
    return F.expr(
        f"transform(sequence(0, {_pin(m - 1, 'qvec')}), s ->"
        f" transform(sequence(0, {ks - 1}), c ->"
        f" aggregate(zip_with(slice(qvec, s * {d} + 1, {d}),"
        f" element_at({cb}, s * {ks} + c + 1),"
        f" (x, y) -> cast(x as bigint) * y),"
        f" cast(0 as bigint), (acc, v) -> acc + v)))"
    ).alias("luts")


def _adc_rank(joined: DataFrame, m: int, k: int) -> DataFrame:
    """score(q, x) = sum_s luts[s][codes_x[s]] — all BIGINT — then top-k
    per query with (adc_score DESC, n_id ASC) ties. The ONE copy of the
    ADC scoring contract, shared by flat PQ and IVF-PQ."""
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0 as bigint),"
        f" (acc, s) -> acc + element_at(element_at(luts, s + 1),"
        f" element_at(codes, s + 1) + 1))"
    )
    scored = joined.select("q_id", "n_id", score.alias("adc_score"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_score").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "adc_score", "rank")
    )


#: IVF-PQ defaults: 16 coarse cells from md5 ±1 planes (disjoint seed
#: from the codebooks), 2-cell probe.
IVF_PQ_CELLS = 16
IVF_PQ_PROBE = 2
IVF_PQ_SEED = 71


def _cell_ranks(qvec_col: str, planes: list[list[int]]) -> F.Column:
    """Sorted (neg integer dot, cell) structs: with equal-norm ±1 cell
    directions, argmin L2 == argmax dot, so the integer dot IS the cell
    ranking — exact in any engine, ties on the lower cell id. ONE parsed
    expression over the nested plane-matrix literal."""
    pl = _nested_array_lit(planes)
    n = len(planes)
    return F.expr(
        f"array_sort(transform(sequence(0, {_pin(n - 1, qvec_col)}), c ->"
        f" named_struct('nd', -aggregate(zip_with({qvec_col},"
        f" element_at({pl}, c + 1), (x, y) -> cast(x as bigint) * y),"
        f" cast(0 as bigint), (acc, v) -> acc + v),"
        f" 'cell', cast(c as int))))"
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = IVF_PQ_PROBE,
    n_cells: int = IVF_PQ_CELLS,
    codebooks: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """IVF-PQ composed (FAISS's workhorse production layout): coarse-cell
    pruning over an index that stores ONE CELL ID + m PQ CODES per vector
    — at 10^12 vectors, ~9 bytes/vector of index instead of 256 B of
    float32. (q_id, n_id, adc_score, rank).

    The persisted index is the (cell, codes) table partitioned by cell; a
    probe scans n_probe/n_cells of it, scores by integer ADC lookups, and
    never touches the vectors. Cell directions are md5 ±1 planes, so the
    assignment is an integer-dot argmax — the ENTIRE composed pipeline
    (assign, probe, encode, ADC, rank) is integer arithmetic with an
    exact DuckDB oracle that regenerates both the planes and the
    codebooks from md5(). ``vectorized`` picks the Arrow/NumPy index
    kernel (default; bit-identical) over the Catalyst-expression twin."""
    if codebooks is None:
        codebooks = md5_sign_codebooks()
    m = len(codebooks)
    d = len(codebooks[0][0])
    planes = [
        [int(v) for v in row]
        for row in md5_sign_planes(n_cells, m * d, seed=IVF_PQ_SEED)
    ]
    if vectorized:
        from .annkernels import pq_index_arrow

        # cell + codes in ONE Arrow pass off the single corpus scan
        index = pq_index_arrow(
            corpus, codebooks, planes, id_col, vec_col, out_id="n_id"
        )
    else:
        qc = quantize_int8(corpus, vec_col=vec_col, id_col=id_col)
        # cell + codes in ONE projection off the single quantized scan —
        # a join of the two would shuffle the corpus twice for nothing
        index = qc.select(
            F.col(id_col).alias("n_id"),
            _cell_ranks("qvec", planes)[0]["cell"].alias("cell"),
            _codes_col(codebooks).alias("codes"),
        )
    qside = ivf_pq_query_side(
        queries, planes, codebooks, n_probe, id_col, vec_col
    )
    joined = index.join(F.broadcast(qside), "cell").where(
        F.col("q_id") != F.col("n_id")
    )
    return _adc_rank(joined, m, k)


def ivf_pq_query_side(
    queries: DataFrame,
    planes: list[list[int]],
    codebooks: list[list[list[int]]],
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, cell, luts): each query exploded to its ``n_probe`` nearest
    cells with its ADC lookup tables — the tiny broadcast side shared by
    the inline ``ivf_pq_topk`` probe and the persisted-index probe
    (``annindex.probe_ivf_pq_index``)."""
    qq = quantize_int8(queries, vec_col=vec_col, id_col=id_col)
    return qq.select(
        F.col(id_col).alias("q_id"),
        F.explode(
            F.slice(_cell_ranks("qvec", planes), 1, int(n_probe))["cell"]
        ).alias("cell"),
        _query_luts(codebooks),
    )
