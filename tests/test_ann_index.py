"""Persisted IVF-PQ index (operators/annindex.py): build-once
cell-partitioned layout, probe bit-identical to the inline pipeline,
and partition pruning enforced at the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.annindex import (
    probe_ivf_pq_index,
    read_index_meta,
    write_ivf_pq_index,
)
from usgs_geomag_algorithms_spark.operators.pq import (
    IVF_PQ_CELLS,
    ivf_pq_topk,
    md5_sign_codebooks,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "ivfpq")
    meta = write_ivf_pq_index(corpus, path)
    assert meta["n_cells"] == IVF_PQ_CELLS
    return path


def _topk(df):
    return {
        (r["q_id"], r["rank"]): (r["n_id"], r["adc_score"])
        for r in df.collect()
    }


class TestPersistedIndex:
    def test_probe_equals_inline_pipeline(self, spark, corpus, index_path):
        queries = corpus.where(F.col("vec_id") < 5)
        probed = _topk(probe_ivf_pq_index(spark, index_path, queries))
        inline = _topk(ivf_pq_topk(corpus, queries))
        assert probed == inline and len(probed) > 0

    def test_prune_none_same_result(self, spark, corpus, index_path):
        queries = corpus.where(F.col("vec_id") < 5)
        static = _topk(probe_ivf_pq_index(spark, index_path, queries))
        full = _topk(
            probe_ivf_pq_index(spark, index_path, queries, prune="none")
        )
        assert static == full

    def test_static_probe_prunes_partitions(self, spark, corpus, index_path):
        queries = corpus.where(F.col("vec_id") < 3)
        out = probe_ivf_pq_index(spark, index_path, queries)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the probed-cell IN list reaches the scan's PARTITION filters —
        # pruning happens at file listing, not post-scan
        scan_lines = [
            ln for ln in final.split("\n") if "PartitionFilters" in ln
        ]
        assert scan_lines, final
        assert any(
            "cell" in ln.split("PartitionFilters", 1)[1][:200]
            and " IN " in ln.split("PartitionFilters", 1)[1][:200]
            for ln in scan_lines
        ), scan_lines

    def test_meta_roundtrip_and_geometry_guard(
        self, spark, corpus, index_path
    ):
        meta = read_index_meta(index_path)
        assert meta["m"] == 8 and meta["ks"] == 16 and meta["d"] == 8
        queries = corpus.where(F.col("vec_id") < 2)
        bad = md5_sign_codebooks(m=4, ks=16, d=16)
        with pytest.raises(ValueError, match="geometry"):
            probe_ivf_pq_index(
                spark, index_path, queries, codebooks=bad
            )

    def test_index_stores_codes_only(self, spark, index_path):
        idx = spark.read.parquet(index_path)
        assert set(idx.columns) == {"n_id", "codes", "cell"}
        n = idx.count()
        assert n > 0


class TestIndexMaintenance:
    """Incremental maintenance: append new vectors under the sidecar's
    geometry, merge-on-read tombstone deletes, compaction that applies
    tombstones and merges append files."""

    def test_append_equals_full_rebuild(self, spark, corpus, tmp_path):
        from usgs_geomag_algorithms_spark.operators.annindex import (
            append_ivf_pq_index,
        )

        inc = str(tmp_path / "inc")
        full = str(tmp_path / "full")
        write_ivf_pq_index(corpus.where(F.col("vec_id") < 400), inc)
        append_ivf_pq_index(corpus.where(F.col("vec_id") >= 400), inc)
        write_ivf_pq_index(corpus, full)
        queries = corpus.where(F.col("vec_id") < 5)
        # deterministic encode -> the incremental index probes
        # bit-identically to a from-scratch rebuild
        assert _topk(probe_ivf_pq_index(spark, inc, queries)) == _topk(
            probe_ivf_pq_index(spark, full, queries)
        )

    def test_tombstone_masks_probe(self, spark, corpus, tmp_path):
        from usgs_geomag_algorithms_spark.operators.annindex import (
            delete_from_ivf_pq_index,
        )

        path = str(tmp_path / "idx")
        write_ivf_pq_index(corpus, path)
        queries = corpus.where(F.col("vec_id") < 5)
        before = probe_ivf_pq_index(spark, path, queries, k=3)
        victims = sorted(
            {r.n_id for r in before.where("rank = 1").collect()}
        )
        n = delete_from_ivf_pq_index(spark, path, victims)
        assert n == len(victims)
        after = probe_ivf_pq_index(spark, path, queries, k=3)
        hit = {r.n_id for r in after.collect()}
        assert not (hit & set(victims))
        # mask == rebuild on the surviving corpus
        clean = str(tmp_path / "clean")
        write_ivf_pq_index(
            corpus.where(~F.col("vec_id").isin(victims)), clean
        )
        assert _topk(after) == _topk(
            probe_ivf_pq_index(spark, clean, queries, k=3)
        )

    def test_compact_applies_and_retires(self, spark, corpus, tmp_path):
        import os

        from usgs_geomag_algorithms_spark.operators.annindex import (
            append_ivf_pq_index,
            compact_ivf_pq_index,
            delete_from_ivf_pq_index,
        )

        path = str(tmp_path / "idx")
        write_ivf_pq_index(corpus.where(F.col("vec_id") < 300), path)
        append_ivf_pq_index(
            corpus.where(
                (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
            ),
            path,
        )
        append_ivf_pq_index(corpus.where(F.col("vec_id") >= 400), path)
        delete_from_ivf_pq_index(spark, path, [7, 123, 456])
        queries = corpus.where(F.col("vec_id") < 5)
        before = _topk(probe_ivf_pq_index(spark, path, queries))
        rep = compact_ivf_pq_index(spark, path)
        assert rep["tombstones_applied"] == 3
        assert rep["files_after"] < rep["files_before"]
        # results identical, tombstone dir retired, meta survives
        assert _topk(probe_ivf_pq_index(spark, path, queries)) == before
        assert not os.path.isdir(os.path.join(path, "_tombstones"))
        assert read_index_meta(path)["m"] > 0
        # compacted layout: at most one file per cell partition
        for d in os.listdir(path):
            if d.startswith("cell="):
                files = [
                    f
                    for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")
                ]
                assert len(files) <= 1


class TestAutoPlanes:
    def test_auto_n_planes_rule(self):
        from usgs_geomag_algorithms_spark.operators.similarity import (
            auto_n_planes,
        )

        assert auto_n_planes(10) == 1
        assert auto_n_planes(64) == 1
        assert auto_n_planes(2_048) == 5
        # occupancy pinned near the target as N grows 32x
        assert auto_n_planes(64_000) - auto_n_planes(2_000) == 5

    def test_near_dups_auto(self, spark):
        from usgs_geomag_algorithms_spark.operators.similarity import (
            embedding_near_dups,
        )

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0, 0.5 * i]) for i in range(1, 50)],
            "vec_id long, embedding array<double>",
        )
        out = embedding_near_dups(emb, threshold=0.99, n_planes="auto")
        rows = out.collect()
        assert all(r.id_a < r.id_b for r in rows)
