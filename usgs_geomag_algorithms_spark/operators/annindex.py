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
