"""Streaming LSH-index maintenance: probe-then-append per micro-batch,
cross-batch matching through the persisted index, marker-guarded replay."""

import os

import pytest

from usgs_geomag_algorithms_spark.operators.dedup_index import (
    incremental_near_dups,
)
from usgs_geomag_algorithms_spark.streaming.index_stream import (
    index_maintenance_batch,
    streaming_index_maintenance,
)

SCHEMA = "doc_id long, text string"

B0 = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "pack my box with five dozen liquor jugs for the long trip north"),
]
B1 = [
    # near-dup of doc 0 (batch 0)
    (10, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (11, "entirely fresh text with no overlap whatsoever in any shingle"),
]
B2 = [
    # near-dup of doc 11 (batch 1) — proves appends serve later probes
    (20, "entirely fresh text with no overlap whatsoever in any paragraph"),
]

KW = dict(k=16, bands=4, shingle_n=4, threshold=0.25)


class TestStreamingIndex:
    def test_probe_then_append_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        for i, rows in enumerate([B0, B1, B2]):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
                str(tmp_path / f"stage{i}")
            )
            for f in os.listdir(str(tmp_path / f"stage{i}")):
                if f.endswith(".parquet"):
                    os.rename(
                        str(tmp_path / f"stage{i}" / f), f"{src}/b{i}.parquet"
                    )
        index = str(tmp_path / "index")
        got = {}

        def on_pairs(pairs, batch_id):
            got[batch_id] = {
                (r.new_id, r.old_id) for r in pairs.collect()
            }

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_index_maintenance(
            stream, index, str(tmp_path / "ckpt"),
            trigger_available_now=True, on_pairs=on_pairs, **KW,
        )
        q.awaitTermination(120)
        # file order = name order (b0, b1, b2), one batch each
        assert 0 not in got  # no index existed before batch 0
        assert (10, 0) in got[1]
        assert not any(o in (10, 11) for _n, o in got[1])
        assert (20, 11) in got[2]  # matched against batch 1's APPEND
        # index now serves batch readers with all three batches
        final = incremental_near_dups(
            spark.createDataFrame(
                [(30, B0[0][1])], SCHEMA  # exact text of doc 0
            ),
            spark, index, **KW,
        ).collect()
        assert {(r.new_id, r.old_id) for r in final} >= {(30, 0), (30, 10)}

    def test_replayed_batch_skips_duplicate_append(self, spark, tmp_path):
        index = str(tmp_path / "index")
        fn = index_maintenance_batch(index, **KW)
        df = spark.createDataFrame(B0, SCHEMA)
        fn(df, 0)
        n1 = spark.read.parquet(f"{index}/sigs").count()
        fn(df, 0)  # checkpoint-recovery re-delivery of the same batch_id
        n2 = spark.read.parquet(f"{index}/sigs").count()
        assert n1 == len(B0) and n2 == n1

    def test_pairs_threshold_respected(self, spark, tmp_path):
        index = str(tmp_path / "index")
        fn0 = index_maintenance_batch(index, **KW)
        fn0(spark.createDataFrame(B0, SCHEMA), 0)
        got = []
        fn = index_maintenance_batch(
            index, on_pairs=lambda p, b: got.extend(p.collect()), **KW
        )
        fn(spark.createDataFrame(B1, SCHEMA), 1)
        assert all(r.est_jaccard >= KW["threshold"] for r in got)
        assert any(r.new_id == 10 and r.old_id == 0 for r in got)
