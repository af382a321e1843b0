"""Persisted IVF-PQ index: build once as a cell-partitioned table, probe
many times scanning only the probed cells.

``ivf_pq_topk`` re-encodes the corpus inside every query — right for a
one-shot benchmark, wrong for serving. The production shape (FAISS on
disk, Milvus/Vespa segment layouts) is an INDEX TABLE: one row per
vector, ``(id, codes)``, hive-partitioned by the coarse cell. At 10^12
vectors x dim 64 that is ~9 B/vector (m=8 codes + id overhead) — ~13 TB
of parquet versus 256 TB of float32 vectors — and a probe with
``n_probe=2`` of ``n_cells=10^4`` reads 0.02 % of it, enforced by
PARTITION PRUNING at the file-listing level, not by a filter after the
scan.

Pruning strategy, in order:

- ``prune="static"`` (default): the probed cells are collected from the
  query side first — bounded by ``|Q| x n_probe`` ints (queries are
  small by definition; this is the same bounded-collect contract as the
  trained-centroid literals) — and pushed as a ``cell IN (...)`` literal
  predicate, which prunes at plan time (``PartitionFilters`` on the
  scan, asserted in tests).
- ``prune="dpp"``: no collect; the broadcast probe join's build side
  feeds Spark's dynamic partition pruning. Plan-shape dependent (DPP has
  a benefit heuristic), so the static path is the default.
- ``prune="none"``: plain join over a full scan (baseline/debug).

The index carries a JSON sidecar (geometry + seeds) so probes validate
against the build instead of silently mismatching codebooks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pq import (
    IVF_PQ_CELLS,
    IVF_PQ_PROBE,
    IVF_PQ_SEED,
    PQ_SEED,
    _adc_rank,
    ivf_pq_query_side,
    md5_sign_codebooks,
    md5_sign_planes,
)
from .annkernels import pq_index_arrow

_META_NAME = "_ann_index_meta.json"


def write_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = IVF_PQ_CELLS,
    codebooks: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Encode the corpus (Arrow integer kernel, one pass, map-only) and
    write ``(n_id, codes)`` hive-partitioned by ``cell``. Returns the
    sidecar metadata. Overwrites ``path``."""
    if codebooks is None:
        codebooks = md5_sign_codebooks()
    m = len(codebooks)
    d = len(codebooks[0][0])
    planes = [
        [int(v) for v in row]
        for row in md5_sign_planes(n_cells, m * d, seed=IVF_PQ_SEED)
    ]
    index = pq_index_arrow(
        corpus, codebooks, planes, id_col, vec_col, out_id="n_id"
    )
    index.write.mode("overwrite").partitionBy("cell").parquet(path)
    meta = {
        "n_cells": int(n_cells),
        "m": m,
        "ks": len(codebooks[0]),
        "d": d,
        "plane_seed": IVF_PQ_SEED,
        "codebook_seed": PQ_SEED,
    }
    with open(os.path.join(path, _META_NAME), "w") as fh:
        json.dump(meta, fh)
    return meta


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, _META_NAME)) as fh:
        return json.load(fh)


def probe_ivf_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = IVF_PQ_PROBE,
    codebooks: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune: str = "static",
) -> DataFrame:
    """Top-k ADC probe against a persisted index: (q_id, n_id, adc_score,
    rank) — bit-identical to ``ivf_pq_topk`` over the same corpus and
    geometry (asserted in tests). Scans only the probed cells' partitions
    (see module docstring for the ``prune`` modes)."""
    meta = read_index_meta(path)
    if codebooks is None:
        codebooks = md5_sign_codebooks(
            m=meta["m"], ks=meta["ks"], d=meta["d"], seed=meta["codebook_seed"]
        )
    if (len(codebooks), len(codebooks[0]), len(codebooks[0][0])) != (
        meta["m"],
        meta["ks"],
        meta["d"],
    ):
        raise ValueError(
            f"codebook geometry {len(codebooks)}x{len(codebooks[0])}x"
            f"{len(codebooks[0][0])} != index meta "
            f"{meta['m']}x{meta['ks']}x{meta['d']}"
        )
    planes = [
        [int(v) for v in row]
        for row in md5_sign_planes(
            meta["n_cells"], meta["m"] * meta["d"], seed=meta["plane_seed"]
        )
    ]
    qside = ivf_pq_query_side(
        queries, planes, codebooks, n_probe, id_col, vec_col
    )
    index = spark.read.parquet(path)
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # merge-on-read mask: one broadcast anti-join, bounded by the
        # pending tombstone count; compact_ivf_pq_index retires them
        index = index.join(F.broadcast(tomb), "n_id", "left_anti")
    if prune == "static":
        # bounded collect: |Q| x n_probe ints -> a literal IN list the
        # scan prunes partitions with at PLAN time
        cells = sorted(
            r["cell"] for r in qside.select("cell").distinct().collect()
        )
        index = index.where(F.col("cell").isin(cells))
    elif prune != "dpp" and prune != "none":
        raise ValueError(f"unknown prune mode {prune!r}")
    joined = index.join(F.broadcast(qside), "cell").where(
        F.col("q_id") != F.col("n_id")
    )
    return _adc_rank(joined, meta["m"], k)


_TOMB_DIR = "_tombstones"


def _index_geometry(meta: dict):
    """Rebuild the exact encode geometry from the sidecar — appends and
    probes share one codebook/plane derivation, so an incremental write
    can never mix codebooks with the files already on disk."""
    codebooks = md5_sign_codebooks(
        m=meta["m"], ks=meta["ks"], d=meta["d"], seed=meta["codebook_seed"]
    )
    planes = [
        [int(v) for v in row]
        for row in md5_sign_planes(
            meta["n_cells"], meta["m"] * meta["d"], seed=meta["plane_seed"]
        )
    ]
    return codebooks, planes


def append_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance: encode NEW vectors under the
    existing index's geometry (rebuilt from the sidecar seeds — appends
    cannot mix codebooks) and append them into the same cell partitions.
    Map-only over the new batch; nothing existing is read or rewritten —
    at 10^12 indexed vectors a daily-crawl increment costs O(increment),
    not O(index). IDs are expected new (the curation pipeline upstream
    is the dedup); updating a vector = ``delete_from_ivf_pq_index`` its
    id + append the new row (the merge-on-read pattern, same shape as
    the TierStore's equality deletes)."""
    meta = read_index_meta(path)
    codebooks, planes = _index_geometry(meta)
    index = pq_index_arrow(
        corpus, codebooks, planes, id_col, vec_col, out_id="n_id"
    )
    index.write.mode("append").partitionBy("cell").parquet(path)
    return meta


def delete_from_ivf_pq_index(spark: SparkSession, path: str, ids) -> int:
    """Merge-on-read deletion: the ids land as a tombstone file under
    ``_tombstones/`` (invisible to the index scan — Spark ignores
    ``_``-prefixed paths); probes mask them with ONE broadcast anti-join
    (bounded by live tombstone count). No cell partition is rewritten —
    a delete scattered across a trillion-vector index is one tiny file,
    exactly the TierStore equality-delete trade. ``compact`` applies and
    retires tombstones. ``ids``: iterable of vector ids or a DataFrame
    whose first column is the id."""
    if isinstance(ids, DataFrame):
        tomb = ids.select(F.col(ids.columns[0]).cast("long").alias("n_id"))
    else:
        tomb = spark.createDataFrame(
            [(int(i),) for i in ids], "n_id long"
        )
        if not tomb.head(1):
            return 0
    n = tomb.count()
    tomb.coalesce(1).write.mode("append").parquet(
        os.path.join(path, _TOMB_DIR)
    )
    return n


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    tdir = os.path.join(path, _TOMB_DIR)
    if not os.path.isdir(tdir) or not any(
        f.endswith(".parquet") for f in os.listdir(tdir)
    ):
        return None
    return spark.read.parquet(tdir).select("n_id").distinct()


def compact_ivf_pq_index(
    spark: SparkSession, path: str, target_files_per_cell: int = 1
) -> dict:
    """Apply pending tombstones and merge each cell's accumulated append
    files (one rewrite pass, cell-partitioned writes). The swap is
    atomic at the directory level; unlike the TierStore there is no
    snapshot history — the index is DERIVED data (rebuildable from the
    embeddings table), so maintenance is an offline step between serving
    generations, the way segment-merge works in FAISS/Lucene-shaped
    systems. In-flight probes should finish on the old generation before
    compaction swaps it."""
    from ..sources.store import _atomic_swap_dirs

    meta = read_index_meta(path)
    idx = spark.read.parquet(path)
    tomb = _tombstones(spark, path)
    applied = 0
    if tomb is not None:
        applied = tomb.count()
        idx = idx.join(F.broadcast(tomb), "n_id", "left_anti")
    files_before = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and _TOMB_DIR not in root
    )
    staged = path + ".staged"
    (
        idx.repartition(max(1, int(target_files_per_cell)), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(staged)
    )
    with open(os.path.join(staged, _META_NAME), "w") as fh:
        json.dump(meta, fh)
    _atomic_swap_dirs(path, staged)
    files_after = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and _TOMB_DIR not in root
    )
    return {
        "tombstones_applied": applied,
        "files_before": files_before,
        "files_after": files_after,
    }
