"""Arrow-batched integer ANN kernels: the vectorized execution strategy
for PQ/IVF index builds.

The Catalyst-expression encode (``pq._codes_col`` / ``pq._cell_ranks``)
is the *specification*: a pure-SQL plan whose every score is BIGINT and
therefore exactly DuckDB-oracle-checkable. But higher-order-function
lambdas evaluate interpreted, row-at-a-time on the JVM — measured
~6.7 ms/row for the m*ks=128-codeword encode (a 2000-row index build was
a 13.5 s single-task stage). That per-row cost is what actually bounds a
10^12-vector index build; the production strategy (what FAISS does) is a
batched integer matmul.

These kernels are that strategy: ``mapInPandas`` over Arrow batches,
NumPy int64 ``einsum``/``matmul`` for the codeword and cell dots. Because
every operation is integer (or IEEE-exact float64 in the same order as
the SQL expression), the kernels are BIT-IDENTICAL to the expression
path — asserted by tests (``test_kmeans_pq``), and the DuckDB oracles
keep passing unchanged against the vectorized plans. Measured ~100x per
row vs the interpreted lambdas.

Exactness notes (mirrors ``quantize.quantize_int8`` and ``pq``):
- quantization: float32 -> float64 widening is exact; ``(x / mx) * 127.0
  + 0.5`` runs the same IEEE ops elementwise; ``floor`` then int cast.
- codeword argmax / cell argmax: ``np.argmax`` returns the FIRST maximum
  — identical to the ``array_sort((-dot, idx))[0]`` lower-index
  tie-break.
- all dots are int64 with |q| <= 127, dim 64: |dot| <= 127*127*64 ~ 10^6,
  ~12 orders of headroom.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _quantize_batch(pdf: pd.DataFrame, id_col: str, vec_col: str):
    """(ids int64 (N,), Q int64 (N, dim)) — the exact ``quantize_int8``
    semantics over one Arrow batch: symmetric int8 via round-half-up
    ``floor(x / max|x| * 127 + 0.5)``, zero/null vectors dropped."""
    vals = pdf[vec_col]
    mask = vals.notna().to_numpy()
    if not mask.all():
        pdf = pdf[mask]
        vals = pdf[vec_col]
    if len(pdf) == 0:
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.int64)
    E = np.array(vals.tolist(), dtype=np.float64)
    mx = np.abs(E).max(axis=1)
    keep = mx > 0.0
    E, mx = E[keep], mx[keep]
    ids = pdf[id_col].to_numpy()[keep].astype(np.int64)
    Q = np.floor(E / mx[:, None] * 127.0 + 0.5).astype(np.int64)
    return ids, Q


def pq_index_arrow(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    planes: list[list[int]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "n_id",
) -> DataFrame:
    """Quantize + PQ-encode (+ IVF cell-assign when ``planes`` is given)
    in ONE Arrow pass over the corpus — the vectorized twin of the
    ``pq._codes_col`` / ``pq._cell_ranks`` projection. Map-only: no
    shuffle, no exchange; the codebook/plane matrices ship inside the
    serialized kernel (a few KB).

    Returns (out_id, codes array<int>) or (out_id, cell int, codes)."""
    cb = np.asarray(codebooks, dtype=np.int64)  # (m, ks, d)
    m, ks, d = cb.shape
    pl = None if planes is None else np.asarray(planes, dtype=np.int64)
    with_cell = pl is not None
    schema = (
        f"{out_id} long, cell int, codes array<int>"
        if with_cell
        else f"{out_id} long, codes array<int>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, Q = _quantize_batch(pdf, id_col, vec_col)
            if len(ids) == 0:
                continue
            sub = Q.reshape(len(ids), m, d)
            # (N, m, ks) integer codeword dots; argmax = first max =
            # the expression path's lower-code tie-break
            scores = np.einsum("nmd,mkd->nmk", sub, cb)
            codes = scores.argmax(axis=2).astype(np.int32)
            out = {out_id: ids, "codes": list(codes)}
            if with_cell:
                cells = (Q @ pl.T).argmax(axis=1).astype(np.int32)
                out = {out_id: ids, "cell": cells, "codes": list(codes)}
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def ivf_assign_arrow(
    df: DataFrame,
    state: list[tuple[list[int], int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "n_id",
) -> DataFrame:
    """Quantize + assign to the argmin integer-state k-means cell in one
    Arrow pass — the vectorized twin of ``kmeans._assign_cells`` (which
    stays pure-SQL as the oracle-checkable specification and for the
    per-iteration trainer plan audit).

    Score, as in ``kmeans._cell_scores``: ``(||s||² - 2 n <x,s>) / n²``
    with the numerator in int64 and ONE terminal float64 division —
    ``np.argmin`` first-minimum matches the lower-cell tie-break.

    Returns (out_id, qvec array<int>, cell int) — qvec is carried so the
    probe's cosine never rescans the corpus."""
    S = np.asarray([s for s, _ in state], dtype=np.int64)  # (k, dim)
    n = np.asarray([c for _, c in state], dtype=np.int64)  # (k,)
    s2 = (S * S).sum(axis=1)  # (k,) int64

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, Q = _quantize_batch(pdf, id_col, vec_col)
            if len(ids) == 0:
                continue
            num = s2[None, :] - 2 * n[None, :] * (Q @ S.T)  # int64 (N, k)
            sc = num.astype(np.float64) / (n * n).astype(np.float64)
            cells = sc.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {out_id: ids, "qvec": list(Q.astype(np.int32)), "cell": cells}
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel, f"{out_id} long, qvec array<int>, cell int"
    )
