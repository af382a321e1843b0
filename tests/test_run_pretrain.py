"""End-to-end pretraining-build CLI: curate -> leakage-safe split ->
train-side BPE -> tokenize -> pack. Asserts the cross-stage invariants a
loader depends on."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from jobs.run_pretrain_build import main


class TestPretrainBuild:
    def test_build_invariants(self, spark, tmp_path):
        out = str(tmp_path / "build")
        rc = main(
            [
                "--docs",
                "/root/testdata/sf0.001/documents.parquet",
                "--out",
                out,
                "--merges",
                "4",
                "--seq-len",
                "128",
            ]
        )
        assert rc == 0
        merges = json.load(open(f"{out}/merges.json"))
        assert len(merges) == 4
        assert [m["merge_round"] for m in merges] == [0, 1, 2, 3]

        m = spark.read.parquet(f"{out}/manifest.parquet")
        rows = m.collect()
        assert len(rows) > 0
        # no near-dup cluster straddles the split boundary
        straddle = (
            m.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("n"))
            .where("n > 1")
            .count()
        )
        assert straddle == 0
        # packing: within each (split, source) stratum, offsets are the
        # exact running sum of BPE token counts in (md5(id), id) order
        by_stratum: dict = {}
        for r in rows:
            by_stratum.setdefault((r["split"], r["source"]), []).append(r)
        import hashlib

        for (_s, _src), docs in by_stratum.items():
            docs.sort(
                key=lambda r: (
                    hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
                    r["doc_id"],
                )
            )
            off = 0
            for r in docs:
                assert r["start_offset"] == off
                assert r["first_bin"] == off // 128
                assert r["last_bin"] == (off + r["n_tokens"] - 1) // 128
                off += r["n_tokens"]
        # the tokenizer was fitted on the train side: every merge pair
        # must actually occur in train-side text symbols (weak but real:
        # pair_count > 0)
        assert all(mm["pair_count"] > 0 for mm in merges)


class TestManifestPruning:
    def test_split_read_prunes_partitions(self, spark, tmp_path):
        out = str(tmp_path / "b2")
        rc = main(
            [
                "--docs",
                "/root/testdata/sf0.001/documents.parquet",
                "--out",
                out,
                "--merges",
                "2",
                "--seq-len",
                "128",
            ]
        )
        assert rc == 0
        df = spark.read.parquet(f"{out}/manifest.parquet").where(
            "split = 'train'"
        )
        df.collect()
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the split predicate must prune at the PARTITION level (loader
        # reads only its side's files), not as a post-scan filter
        assert "PartitionFilters: [isnotnull(split" in final, final
        # and the merges artifact doubled via Spark
        m = spark.read.parquet(f"{out}/merges.parquet")
        assert m.count() == 2
