"""Merge-on-read equality deletes (Iceberg v2 delete files): masking,
sequence-number semantics, materialization, CDC, rollback, and GC."""

import os

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.sources.store import TierStore

US = 1_000_000
DAY_US = 86_400 * US
T0 = 1577836800 * US  # 2020-01-01


def _rows(spark, day, vals, url=None):
    data = []
    for i, v in enumerate(vals):
        t = T0 + day * DAY_US + i * 60 * US
        data.append((url or f"u{i % 2}", "text_len", t, float(v)))
    return spark.createDataFrame(
        data, "url string, channel string, t_us long, value double"
    )


def _keys(spark, day, idxs, url=None):
    data = [
        (url or f"u{i % 2}", "text_len", T0 + day * DAY_US + i * 60 * US)
        for i in idxs
    ]
    return spark.createDataFrame(
        data, "url string, channel string, t_us long"
    )


def _vals(store, tier="minute", **kw):
    return sorted(int(r.value) for r in store.read(tier, **kw).collect())


class TestDeleteRows:
    def test_masks_rows_without_rewriting_files(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")
        files_before = set(s._load_manifest(s.path("minute"))["files"])
        r = s.delete_rows(_keys(spark, 0, [1, 2]), "minute")
        assert r["keys"] == 2 and r["version"] == 2
        assert _vals(s) == [1, 4]
        # merge-on-read: no data file rewritten, one delete file recorded
        m = s._load_manifest(s.path("minute"))
        assert set(m["files"]) == files_before
        assert len(m["deletes"]) == 1
        assert m["deletes"][0]["file"].startswith("_deletes/")

    def test_zero_keys_commits_nothing(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1]), "minute")
        r = s.delete_rows(_keys(spark, 0, []), "minute")
        assert r["keys"] == 0
        assert s.current_version("minute") == 1
        assert s.pending_deletes("minute") == []

    def test_nonmatching_keys_are_noops(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")
        s.delete_rows(_keys(spark, 5, [0, 1]), "minute")  # other day
        assert _vals(s) == [1, 2]

    def test_reinsert_after_delete_survives(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3]), "minute")
        s.delete_rows(_keys(spark, 0, [1]), "minute")
        assert _vals(s) == [1, 3]
        # re-insert the deleted key: newer file sequence -> mask ends
        s.upsert(_rows(spark, 0, [9, 20, 9]).where(F.col("value") == 20), "minute")
        assert _vals(s) == [1, 3, 20]

    def test_upsert_of_other_rows_does_not_resurrect(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3]), "minute")
        s.delete_rows(_keys(spark, 0, [1]), "minute")
        # rewrite the same partition via an unrelated-day + same-day row:
        # the read-modify-write reads THROUGH the mask, so the rewritten
        # partition materializes the delete instead of undoing it
        s.upsert(_rows(spark, 0, [40], url="u9"), "minute")
        assert _vals(s) == [1, 3, 40]

    def test_stacked_deletes_and_sequence_semantics(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [0]), "minute")  # v2 masks 1
        s.upsert(_rows(spark, 0, [8], url="u8"), "minute")  # v3 rewrite
        s.delete_rows(_keys(spark, 0, [3]), "minute")  # v4 masks 4
        assert _vals(s) == [2, 3, 8]
        # both entries pending; the v2 mask no longer reaches the v3
        # files (already materialized) but the state stays correct
        assert [e["version"] for e in s.pending_deletes("minute")] == [2, 4]

    def test_time_travel_and_series_pruned_reads(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")
        s.delete_rows(_keys(spark, 0, [0, 2]), "minute")  # u0 rows 1,3
        assert _vals(s, as_of_version=1) == [1, 2, 3, 4]
        assert _vals(s) == [2, 4]
        # series-restricted read goes through the same mask
        assert _vals(s, series="u0") == []
        assert _vals(s, series="u1") == [2, 4]

    def test_delete_series_rewrite_keeps_eq_deletes(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")
        s.delete_rows(_keys(spark, 0, [0]), "minute")  # masks u0 value 1
        s.delete_series("minute", ["u1"])  # rewrites u1's bucket(s)
        assert _vals(s) == [3]

    def test_packed_tier_refused(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        with pytest.raises(ValueError):
            s.delete_rows(_keys(spark, 0, [0]), "day_packed")


class TestMaterialize:
    def test_compact_materializes_and_retires(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")
        s.delete_rows(_keys(spark, 0, [1]), "minute")
        delfile = s.pending_deletes("minute")[0]["file"]
        s.compact("minute")
        assert s.pending_deletes("minute") == []
        assert _vals(s) == [1, 3, 4]
        m = s._load_manifest(s.path("minute"))
        assert delfile in m["trash"]  # grace, then GC
        s.write(_rows(spark, 1, [5]), "minute")
        s.write(_rows(spark, 2, [6]), "minute")
        s.write(_rows(spark, 3, [7]), "minute")
        assert not os.path.exists(os.path.join(s.path("minute"), delfile))
        assert _vals(s) == [1, 3, 4, 5, 6, 7]

    def test_materialize_is_surgical(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path), n_buckets=4)
        # u0 and u1 land in different buckets/days -> disjoint files
        s.write(_rows(spark, 0, [1, 2, 3, 4], url="u0"), "minute")
        s.write(_rows(spark, 3, [5, 6], url="u1"), "minute")
        m0 = s._load_manifest(s.path("minute"))
        u1_files = {
            f for f in m0["files"] if int(m0["seq"][f]) == 2
        }
        s.delete_rows(_keys(spark, 0, [1], url="u0"), "minute")
        r = s.materialize_deletes("minute")
        assert r["delete_files_dropped"] == 1
        m1 = s._load_manifest(s.path("minute"))
        # u1's files (different bucket or time range) were NOT rewritten
        assert u1_files <= set(m1["files"])
        assert r["files_rewritten"] < len(m0["files"])
        assert s.pending_deletes("minute") == []
        assert _vals(s) == [1, 3, 4, 5, 6]

    def test_materialize_noop_without_deletes(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1]), "minute")
        assert s.materialize_deletes("minute") == {
            "files_rewritten": 0,
            "delete_files_dropped": 0,
        }


class TestChangelogAndRollback:
    def test_changelog_emits_eq_deletes(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [1]), "minute")  # v2
        log = s.changelog("minute", 1, 2).collect()
        assert len(log) == 1
        assert log[0].op == "delete" and int(log[0].value) == 2

    def test_changelog_delete_then_reinsert_is_upsert(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2, 3]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [1]), "minute")  # v2
        s.upsert(_rows(spark, 0, [1, 7, 3]), "minute")  # v3: key back, =7
        log = s.changelog("minute", 1, 3).collect()
        assert {r.op for r in log} == {"upsert"}
        assert [int(r.value) for r in log] == [7]

    def test_changelog_not_spanning_delete_is_silent(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [0]), "minute")  # v2
        s.write(_rows(spark, 1, [5]), "minute")  # v3
        log = s.changelog("minute", 2, 3).collect()
        assert [(r.op, int(r.value)) for r in log] == [("upsert", 5)]

    def test_rollback_across_delete_restores_rows(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [0]), "minute")  # v2
        assert _vals(s) == [2]
        s.rollback("minute", 1)  # v3: pre-delete state
        assert _vals(s) == [1, 2]
        assert s.pending_deletes("minute") == []

    def test_rollback_to_deleted_state_restores_mask(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")  # v1
        s.delete_rows(_keys(spark, 0, [0]), "minute")  # v2
        s.rollback("minute", 1)  # v3: mask off
        s.rollback("minute", 2)  # v4: mask back on
        assert _vals(s) == [2]
        assert [e["version"] for e in s.pending_deletes("minute")] == [2]


class TestDeletePlanShape:
    def _phys(self, df):
        df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
        # AQE finalizes subplans lazily — execute before reading the plan
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    def test_mask_is_broadcast_anti_join(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [float(i) for i in range(40)]), "minute")
        s.delete_rows(_keys(spark, 0, [1, 2]), "minute")
        plan = self._phys(s.read("minute"))
        # the mask is ONE broadcast anti-join: the delete relation ships
        # broadcast (bounded by deleted keys), the corpus side is never
        # exchanged for it
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert "SortMergeJoin" not in plan

    def test_clean_files_bypass_and_materialize_removes_join(
        self, spark, tmp_path
    ):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1.0, 2.0]), "minute")
        s.delete_rows(_keys(spark, 0, [0]), "minute")
        # rewrite a DIFFERENT day: its files get a newer sequence than
        # the delete and must bypass the mask join entirely
        s.write(_rows(spark, 3, [5.0]), "minute")
        plan = self._phys(s.read("minute", series="u1"))
        assert "LeftAnti" in plan  # day-0 files still masked
        s.materialize_deletes("minute")
        plan2 = self._phys(s.read("minute"))
        # mask gone: plain scan again, no join node at all
        assert "LeftAnti" not in plan2 and "Join" not in plan2
