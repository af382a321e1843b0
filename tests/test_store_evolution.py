"""Store evolution features: add-column schema evolution, rollback to an
earlier snapshot, write-audit-publish refs."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.sources.store import (
    TierStore,
    TimeTravelError,
)

US = 1_000_000
DAY_US = 86_400 * US
T0 = 1577836800 * US  # 2020-01-01


def _rows(spark, day, vals, quality=None):
    data = []
    for i, v in enumerate(vals):
        t = T0 + day * DAY_US + i * 60 * US
        if quality is None:
            data.append((f"u{i%2}", "text_len", t, float(v)))
        else:
            data.append((f"u{i%2}", "text_len", t, float(v), quality))
    schema = "url string, channel string, t_us long, value double"
    if quality is not None:
        schema += ", quality long"
    return spark.createDataFrame(data, schema=schema)


class TestSchemaEvolution:
    def test_add_column_old_files_read_null(self, spark, tmp_path):
        s1 = TierStore(spark, str(tmp_path))
        s1.write(_rows(spark, 0, [1, 2, 3]), "minute")
        # same tier, evolved declared schema: new writer adds `quality`
        s2 = TierStore(
            spark, str(tmp_path), value_schema="value double, quality long"
        )
        s2.write(_rows(spark, 1, [4, 5], quality=7), "minute")
        got = s2.read("minute").orderBy("t_us").collect()
        assert len(got) == 5
        assert [r.quality for r in got] == [None, None, None, 7, 7]
        assert [int(r.value) for r in got] == [1, 2, 3, 4, 5]

    def test_time_travel_under_new_schema(self, spark, tmp_path):
        s1 = TierStore(spark, str(tmp_path))
        s1.write(_rows(spark, 0, [1, 2]), "minute")
        s2 = TierStore(
            spark, str(tmp_path), value_schema="value double, quality long"
        )
        s2.write(_rows(spark, 1, [3], quality=9), "minute")
        old = s2.read("minute", as_of_version=1).collect()
        assert len(old) == 2 and all(r.quality is None for r in old)

    def test_dropped_column_ignored(self, spark, tmp_path):
        s2 = TierStore(
            spark, str(tmp_path), value_schema="value double, quality long"
        )
        s2.write(_rows(spark, 0, [1, 2], quality=3), "minute")
        s1 = TierStore(spark, str(tmp_path))  # declares only `value`
        got = s1.read("minute").collect()
        assert len(got) == 2
        assert "quality" not in got[0].asDict()

    def test_changelog_across_schema_add(self, spark, tmp_path):
        s1 = TierStore(spark, str(tmp_path))
        s1.write(_rows(spark, 0, [1, 2]), "minute")
        s2 = TierStore(
            spark, str(tmp_path), value_schema="value double, quality long"
        )
        # rewrite the same day's partition with a quality column
        s2.upsert(_rows(spark, 0, [1, 2], quality=5), "minute")
        log = s2.changelog("minute", 1, 2).collect()
        # same (key, t, value) but quality NULL->5: surfaces as upserts
        assert {r.op for r in log} == {"upsert"}
        assert all(r.quality == 5 for r in log)


class TestRollback:
    def test_rollback_restores_and_moves_forward(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")
        s.upsert(_rows(spark, 0, [8, 9]), "minute")  # v2 clobbers values
        assert sorted(
            int(r.value) for r in s.read("minute").collect()
        ) == [8, 9]
        v = s.rollback("minute", 1)
        assert v == 3
        assert sorted(
            int(r.value) for r in s.read("minute").collect()
        ) == [1, 2]

    def test_rolled_back_files_survive_gc(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1, 2]), "minute")  # v1
        s.upsert(_rows(spark, 0, [8, 9]), "minute")  # v2
        s.rollback("minute", 1)  # v3: v1 files re-activated from trash
        # push GC past the old trash grace: the re-activated files must
        # NOT be collected (they were popped from trash on re-activation)
        s.write(_rows(spark, 1, [5]), "minute")  # v4
        s.write(_rows(spark, 2, [6]), "minute")  # v5
        s.write(_rows(spark, 3, [7]), "minute")  # v6
        got = sorted(int(r.value) for r in s.read("minute").collect())
        assert got == [1, 2, 5, 6, 7]

    def test_rollback_past_grace_raises(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path))
        s.write(_rows(spark, 0, [1]), "minute")
        for k in range(4):
            s.upsert(_rows(spark, 0, [10 + k]), "minute")
        with pytest.raises(TimeTravelError):
            s.rollback("minute", 1)


class TestWriteAuditPublish:
    def test_consumer_sees_only_published(self, spark, tmp_path):
        writer = TierStore(spark, str(tmp_path))
        consumer = TierStore(spark, str(tmp_path), read_ref="published")
        writer.write(_rows(spark, 0, [1, 2]), "minute")
        # staged but unpublished: the consumer sees nothing
        assert consumer.read("minute").count() == 0
        # audit the staged snapshot through the latest-reading store
        assert writer.read("minute").count() == 2
        writer.publish("minute")
        assert consumer.read("minute").count() == 2
        # a new bad commit stays invisible until published
        writer.upsert(_rows(spark, 0, [666, 666]), "minute")
        vals = sorted(int(r.value) for r in consumer.read("minute").collect())
        assert vals == [1, 2]
        writer.rollback("minute", 1)
        writer.publish("minute")
        vals = sorted(int(r.value) for r in consumer.read("minute").collect())
        assert vals == [1, 2]

    def test_published_snapshot_pinned_across_commits(self, spark, tmp_path):
        writer = TierStore(spark, str(tmp_path))
        consumer = TierStore(spark, str(tmp_path), read_ref="published")
        writer.write(_rows(spark, 0, [1, 2]), "minute")
        writer.publish("minute")
        # many later unpublished commits: the published snapshot (a tag)
        # is GC-pinned, so the consumer keeps resolving it
        for k in range(4):
            writer.upsert(_rows(spark, 0, [20 + k, 30 + k]), "minute")
        vals = sorted(int(r.value) for r in consumer.read("minute").collect())
        assert vals == [1, 2]

    def test_explicit_version_and_tag_bypass_read_ref(self, spark, tmp_path):
        writer = TierStore(spark, str(tmp_path))
        consumer = TierStore(spark, str(tmp_path), read_ref="published")
        writer.write(_rows(spark, 0, [1]), "minute")
        writer.publish("minute")
        writer.upsert(_rows(spark, 0, [2]), "minute")
        # audit path: explicit version pins the unpublished snapshot
        assert [
            int(r.value)
            for r in consumer.read("minute", as_of_version=2).collect()
        ] == [2]


def _urows(spark, day, url_vals):
    """(url, minute-slot, value) triples on one day."""
    data = [
        (u, "text_len", T0 + day * DAY_US + i * 60 * US, float(v))
        for u, i, v in url_vals
    ]
    return spark.createDataFrame(
        data, "url string, channel string, t_us long, value double"
    )


class TestBucketSpecEvolution:
    def test_evolve_is_metadata_only_and_reads_both_layouts(
        self, spark, tmp_path
    ):
        s = TierStore(spark, str(tmp_path), n_buckets=2)
        s.write(_urows(spark, 0, [("u0", 0, 1), ("u1", 1, 2), ("u2", 2, 3)]), "minute")
        m0 = s._load_manifest(s.path("minute"))
        v = s.evolve_buckets("minute", 8)
        m1 = s._load_manifest(s.path("minute"))
        assert v == 2 and m1["specs"] == [2, 8]
        # metadata-only: same live files, untouched
        assert m1["files"] == m0["files"]
        # new writes land under the new modulus; reads see both layouts
        s.write(_urows(spark, 1, [("u0", 0, 4), ("u3", 1, 5)]), "minute")
        got = sorted(int(r.value) for r in s.read("minute").collect())
        assert got == [1, 2, 3, 4, 5]

    def test_key_pruned_read_correct_across_specs(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path), n_buckets=2)
        urls = [f"u{i}" for i in range(8)]
        s.write(
            _urows(spark, 0, [(u, i, i) for i, u in enumerate(urls)]),
            "minute",
        )
        s.evolve_buckets("minute", 16)
        s.write(
            _urows(spark, 1, [(u, i, 100 + i) for i, u in enumerate(urls)]),
            "minute",
        )
        for i, u in enumerate(urls):
            got = sorted(
                int(r.value) for r in s.read("minute", series=u).collect()
            )
            assert got == [i, 100 + i], u

    def test_upsert_across_evolution_no_loss_no_duplicates(
        self, spark, tmp_path
    ):
        s = TierStore(spark, str(tmp_path), n_buckets=2)
        urls = [f"u{i}" for i in range(6)]
        s.write(
            _urows(spark, 0, [(u, i, i) for i, u in enumerate(urls)]),
            "minute",
        )
        s.evolve_buckets("minute", 8)
        # update u0's slot 0 and add a new slot — spans the boundary
        s.upsert(_urows(spark, 0, [("u0", 0, 50), ("u0", 10, 51)]), "minute")
        rows = s.read("minute").collect()
        # no duplicate (url, t) keys
        keys = [(r.url, r.t_us) for r in rows]
        assert len(keys) == len(set(keys))
        vals = sorted(int(r.value) for r in rows)
        assert vals == [1, 2, 3, 4, 5, 50, 51]
        # and every url still fully readable via the key-pruned path
        assert sorted(
            int(r.value) for r in s.read("minute", series="u0").collect()
        ) == [50, 51]

    def test_compact_migrates_to_current_spec(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path), n_buckets=2)
        urls = [f"u{i}" for i in range(6)]
        s.write(
            _urows(spark, 0, [(u, i, i) for i, u in enumerate(urls)]),
            "minute",
        )
        s.evolve_buckets("minute", 8)
        s.upsert(_urows(spark, 0, [("u1", 1, 9)]), "minute")
        s.compact("minute")
        m = s._load_manifest(s.path("minute"))
        # pure current layout: every live file tagged with the new spec
        cur = len(m["specs"]) - 1
        assert all(int(m["spec"][f]) == cur for f in m["files"])
        vals = sorted(int(r.value) for r in s.read("minute").collect())
        assert vals == [0, 2, 3, 4, 5, 9]
        assert sorted(
            int(r.value) for r in s.read("minute", series="u1").collect()
        ) == [9]

    def test_delete_series_and_eq_deletes_across_specs(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path), n_buckets=2)
        s.write(
            _urows(spark, 0, [("u0", 0, 1), ("u1", 1, 2), ("u2", 2, 3)]),
            "minute",
        )
        s.evolve_buckets("minute", 8)
        s.write(_urows(spark, 1, [("u1", 0, 4), ("u3", 1, 5)]), "minute")
        # series erasure must catch u1's rows under BOTH layouts
        s.delete_series("minute", ["u1"])
        vals = sorted(int(r.value) for r in s.read("minute").collect())
        assert vals == [1, 3, 5]
        # merge-on-read delete of an old-spec row, then materialize
        kd = spark.createDataFrame(
            [("u0", "text_len", T0)], "url string, channel string, t_us long"
        )
        s.delete_rows(kd, "minute")
        assert sorted(
            int(r.value) for r in s.read("minute").collect()
        ) == [3, 5]
        s.materialize_deletes("minute")
        assert s.pending_deletes("minute") == []
        assert sorted(
            int(r.value) for r in s.read("minute").collect()
        ) == [3, 5]

    def test_evolve_noop_and_validation(self, spark, tmp_path):
        s = TierStore(spark, str(tmp_path), n_buckets=4)
        s.write(_urows(spark, 0, [("u0", 0, 1)]), "minute")
        v1 = s.evolve_buckets("minute", 4)  # same modulus: no commit
        assert v1 == 1
        with pytest.raises(ValueError):
            s.evolve_buckets("minute", 0)
        with pytest.raises(TimeTravelError):
            s.evolve_buckets("nope", 8)


class TestSpecEvolutionWriteGuard:
    """Plain dynamic overwrite is refused on dates that still hold live
    old-spec files (the write could not retire the same keys' old-spec
    rows without dropping innocent keys); fresh dates pass, and compact
    (which migrates the layout) re-enables overwrites everywhere."""

    def test_overwrite_refused_until_compact(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.sources.store import (
            SpecEvolutionError,
        )

        s = TierStore(spark, str(tmp_path), n_buckets=2)
        s.write(_rows(spark, 0, [1, 2, 3, 4]), "minute")
        s.evolve_buckets("minute", 5)
        # day-0 still holds spec-0 files -> overwrite there is ambiguous
        with pytest.raises(SpecEvolutionError):
            s.write(_rows(spark, 0, [9, 9]), "minute")
        # the refused write's appended files are swept, content intact
        before = sorted(s.read("minute").collect(), key=lambda r: r.t_us)
        assert [r.value for r in before] == [1.0, 2.0, 3.0, 4.0]
        # a FRESH date has no old-spec files: plain append-style write ok
        s.write(_rows(spark, 1, [7, 8]), "minute")
        assert s.read("minute").count() == 6
        # upsert (provenance merge) still spans the boundary fine
        s.upsert(_rows(spark, 0, [10]), "minute")
        got = {r.t_us: r.value for r in s.read("minute").collect()}
        assert got[T0] == 10.0
        # compact migrates day-0 to the new spec; overwrite allowed again
        s.compact("minute")
        s.write(_rows(spark, 0, [5, 6]), "minute")
        got = sorted(
            r.value for r in s.read("minute").where(f"t_us < {T0+DAY_US}").collect()
        )
        assert got == [5.0, 6.0]
