"""Incremental near-dup index: persisted LSH state, increment-only scans.

The batch pipeline (dedup.near_dup_pairs_verified) re-shingles the whole
corpus per run; at crawl scale the corpus is the 100 TB side and the daily
increment the small one. write_lsh_index persists signatures + band table
once; incremental_near_dups joins an increment against them without ever
touching corpus text again."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators import dedup as D
from usgs_geomag_algorithms_spark.operators.dedup_index import (
    incremental_near_dups,
    write_lsh_index,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


BASE = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "pack my box with five dozen liquor jugs for the long trip north"),
    (4, "sphinx of black quartz judge my vow before the council of elders"),
    (6, "a completely unrelated document about spark physical plan shapes"),
]
# 1 is a near-dup of 0; 3 of 2; 5 matches nothing
INCREMENT = [
    (1, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (3, "pack my box with five dozen liquor jugs for the long trip south"),
    (5, "entirely fresh text with no overlap whatsoever in any shingle"),
]


@pytest.fixture()
def index_path(spark, tmp_path):
    p = str(tmp_path / "lsh_index")
    write_lsh_index(docs_df(spark, BASE), p, k=16, bands=4, shingle_n=4)
    return p


class TestIndexRoundTrip:
    def test_increment_finds_near_dups(self, spark, index_path):
        got = incremental_near_dups(
            docs_df(spark, INCREMENT), spark, index_path,
            k=16, bands=4, shingle_n=4, threshold=0.25,
        )
        pairs = {(r.new_id, r.old_id) for r in got.collect()}
        assert (1, 0) in pairs and (3, 2) in pairs
        assert not any(n == 5 for n, _ in pairs)

    def test_estimate_matches_signature_agreement(self, spark, index_path):
        """est_jaccard must equal |equal slots|/k computed from the same
        signatures the batch path produces — the index adds storage, not
        different math."""
        all_docs = docs_df(spark, BASE + INCREMENT)
        sigs = {
            r.doc_id: r.minhash
            for r in D.minhash_signatures(all_docs, k=16, shingle_n=4).collect()
        }
        got = incremental_near_dups(
            docs_df(spark, INCREMENT), spark, index_path,
            k=16, bands=4, shingle_n=4, threshold=0.0,
        ).collect()
        assert got, "banding should produce at least the two planted pairs"
        for r in got:
            n_eq = sum(
                1 for a, b in zip(sigs[r.new_id], sigs[r.old_id]) if a == b
            )
            assert r.est_jaccard == pytest.approx(n_eq / 16.0)

    def test_append_mode_grows_index(self, spark, index_path):
        """Daily cron shape: append yesterday's increment, then today's
        increment matches against BOTH batches without a rebuild."""
        write_lsh_index(
            docs_df(spark, [(8, INCREMENT[0][1])]), index_path,
            k=16, bands=4, shingle_n=4, mode="append",
        )
        got = incremental_near_dups(
            docs_df(spark, INCREMENT), spark, index_path,
            k=16, bands=4, shingle_n=4, threshold=0.25,
        )
        pairs = {(r.new_id, r.old_id) for r in got.collect()}
        assert (1, 0) in pairs  # original batch still indexed
        assert (1, 8) in pairs  # appended batch matched, no rebuild

    def test_bad_mode_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            write_lsh_index(
                docs_df(spark, BASE), str(tmp_path / "x"), mode="ignore"
            )


class TestIndexPlanShape:
    def test_index_side_never_shuffled(self, spark, index_path):
        """The corpus-sized relations (bands/, sigs/ parquet) must stream
        through broadcast-hash joins — an Exchange above a parquet scan
        means the 100 TB side shuffles per increment."""
        from tests.test_plan_audit import phys

        got = incremental_near_dups(
            docs_df(spark, INCREMENT), spark, index_path,
            k=16, bands=4, shingle_n=4, threshold=0.25,
        )
        got.collect()
        p = phys(got).split("== Initial Plan ==")[0]
        # Location paths truncate at 100 chars regardless of
        # maxMetadataStringLength (set after node construction), so match
        # the scan lines themselves — the increment is an in-memory
        # relation, so every parquet scan here IS an index scan
        scans = [ln for ln in p.splitlines() if "FileScan parquet" in ln]
        assert len(scans) == 2, f"expected bands+sigs index scans, got {scans}"
        # every join keeps the index side as the streamed (non-broadcast)
        # input: no SortMergeJoin / ShuffledHashJoin anywhere
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
        # the only data shuffle is the increment-sized candidate distinct
        shuffles = [
            ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln
        ]
        assert len(shuffles) <= 1, f"unexpected shuffles: {shuffles}"
