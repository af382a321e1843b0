"""Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
embedding space with k-means, then drop all-but-one of each group of
semantically-near documents WITHIN each cluster — the embedding-space
complement of lexical MinHash/SimHash dedup (it catches paraphrases and
re-renderings that share no shingles).

Spark-first composition of machinery that is each already exact:

* cells come from the INTEGER-STATE k-means trainer
  (``kmeans.kmeans_fit`` — order-independent BIGINT sums, so the fit is
  reproducible in SQL);
* the final assignment is one Arrow map pass
  (``annkernels.ivf_assign_arrow``, bit-identical to the audited SQL
  assignment spec) that also carries the int8 ``qvec``;
* within-cell similarity is the int8 cosine as a PURE-INTEGER predicate:
  ``cos >= num/den  <=>  dot > 0  AND  dot²·den² >= num²·‖a‖²·‖b‖²``
  — no float anywhere, no rounding armor needed, exactly
  DuckDB-oracle-checkable end to end (headroom: dot² ≤ (d·127²)² ≈ 2⁴⁰
  at d=64; ·den² and ·norm² products stay under 2⁶³ for den ≤ 100).

Drop rule (deterministic): a document is dropped iff a LOWER-id document
in the same cell is within ``tau``; ``kept_by`` is the smallest such id.
Survivors = corpus minus dropped (anti-join).

Scale: the trainer is one scan per iteration (k×dim longs up, centroids
down); assignment is map-only; the pairwise stage shuffles once on
``cell`` and is quadratic ONLY within a cell — SemDeDup's contract is to
size k so cells stay small (k ~ √N; the paper uses 50k cells for 5B
docs). A pathological mega-cell is the same skew landmine as an LSH hot
bucket: AQE skew-join splits the straggler, and k is the dial that
prevents it by construction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .annkernels import ivf_assign_arrow
from .kmeans import kmeans_fit, state_from_rows
from .quantize import _qdot, _qnorm2


def _dropped_sql(t: DataFrame, id_col: str, num2: int, den2: int):
    """The pure-JVM specification of the within-cell drop rule: a
    cell-keyed self-join whose predicate is the integer cosine test.
    Interpreted zip_with/aggregate lambdas make this the slow path
    (~µs per pair) — it stays as the parity target and the shape the
    DuckDB oracle replays."""
    a = t.select(
        F.col(id_col).alias("a_id"),
        "cell",
        F.col("qvec").alias("qa"),
        _qnorm2("qvec").alias("n2a"),
    )
    b = t.select(
        F.col(id_col).alias("b_id"),
        "cell",
        F.col("qvec").alias("qb"),
        _qnorm2("qvec").alias("n2b"),
    )
    dot = _qdot("qa", "qb")
    near = (dot > 0) & (
        dot * dot * F.lit(den2)
        >= F.lit(num2) * F.col("n2a") * F.col("n2b")
    )
    pairs = a.join(b, "cell").where(F.col("a_id") < F.col("b_id")).where(
        near
    )
    return pairs.groupBy(F.col("b_id").alias(id_col)).agg(
        F.first("cell").alias("cell"),
        F.min("a_id").cast("long").alias("kept_by"),
        F.count("*").cast("long").alias("n_dups"),
    )


def _dropped_arrow(t: DataFrame, id_col: str, num2: int, den2: int):
    """Arrow twin: one ``applyInPandas`` group per cell computes the
    whole within-cell Gram matrix as an int64 matmul — bit-identical to
    the SQL predicate (integer arithmetic commutes), ~µs-per-pair
    lambdas collapsed into one BLAS call. A cell must fit in one worker,
    which is SemDeDup's own contract (k sized so cells stay small);
    int64 headroom: G²·den² ≤ (d·127²)²·10⁴ < 2⁶³ for d ≤ 64, den ≤ 100."""
    import pandas as pd

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        Q = np.stack(
            [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
        )
        G = Q @ Q.T
        n2 = np.diag(G).copy()
        ok = (G > 0) & (G * G * den2 >= num2 * n2[:, None] * n2[None, :])
        # after the id sort, "lower id" == strictly-lower row index:
        # keep (row a, col b) only where a < b — the strict UPPER triangle
        ok &= np.triu(np.ones((len(ids), len(ids)), dtype=bool), 1)
        n_dups = ok.sum(axis=0)
        hit = n_dups > 0
        kept_by = ids[np.argmax(ok, axis=0)]  # first True row per col
        return pd.DataFrame(
            {
                id_col: ids[hit],
                "cell": pdf["cell"].to_numpy()[hit],
                "kept_by": kept_by[hit].astype(np.int64),
                "n_dups": n_dups[hit].astype(np.int64),
            }
        )

    return t.groupBy("cell").applyInPandas(
        kern, f"{id_col} long, cell int, kept_by long, n_dups long"
    )


def auto_k(n_vectors: int) -> int:
    """SemDeDup's own sizing contract, k ~ sqrt(N) (cells stay ~sqrt(N)
    so within-cell pairwise work grows linearly with the corpus; the
    paper's 50k cells for 5B docs is this rule within 2x). With a fixed
    test-scale k the pairwise stage measured 41x time at 32x data
    (``BENCH/BIGDOCS_PROBE.json``)."""
    import math

    return max(2, int(math.sqrt(max(n_vectors, 4))))


def semantic_dropped(
    emb: DataFrame,
    k: int | str = 4,
    n_iter: int = 2,
    tau_num: int = 2,
    tau_den: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """(id, cell, kept_by, n_dups) for every DROPPED document: ``kept_by``
    is the lowest same-cell id within cosine ``tau_num/tau_den``,
    ``n_dups`` how many lower-id near-matches existed. Zero vectors are
    outside the embedding space (quantize drops them) and never dropped.
    ``k="auto"`` sizes the cell count from the corpus (:func:`auto_k`;
    one count() planning scan)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"tau must be in (0, 1]: {tau_num}/{tau_den}")
    if isinstance(k, str):
        if k != "auto":
            raise ValueError(f"k must be an int or 'auto': {k!r}")
        k = auto_k(emb.count())
    state = state_from_rows(
        kmeans_fit(
            emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        ).collect(),
        int(k),
    )
    t = ivf_assign_arrow(emb, state, id_col, vec_col, out_id=id_col)
    num2 = int(tau_num) * int(tau_num)
    den2 = int(tau_den) * int(tau_den)
    impl = _dropped_arrow if vectorized else _dropped_sql
    return impl(t, id_col, num2, den2)


def semantic_dedup(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    tau_num: int = 2,
    tau_den: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Survivor view: the corpus minus :func:`semantic_dropped` (zero
    vectors survive by definition — they have no direction to match)."""
    dropped = semantic_dropped(
        emb, k, n_iter, tau_num, tau_den, id_col, vec_col
    )
    return emb.join(dropped.select(id_col), id_col, "left_anti")
