"""Sessionization: batch session_window semantics + streaming twin parity."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from usgs_geomag_algorithms_spark.streaming.sessions_stream import (
    streaming_sessions,
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def ev_df(spark, rows):
    """rows: (user_id, offset_seconds)"""
    base = int(T0.timestamp()) * 1_000_000
    return spark.createDataFrame(
        [(u, float(s)) for u, s in rows], schema="user_id long, off double"
    ).select(
        "user_id",
        F.timestamp_micros(
            F.lit(base) + (F.col("off") * 1_000_000).cast("long")
        ).alias("ts"),
    )


class TestSessionize:
    def test_gap_boundary_rule(self, spark):
        # islands: 0,59,60 chain (diffs 59, 1) then 121 (diff 61 > 60)
        # starts a new session — the rule the DuckDB oracle encodes
        rows = [(1, 0), (1, 59), (1, 60), (1, 121)]
        out = sorted(
            (r.session_start_us, r.n_events)
            for r in sessionize(ev_df(spark, rows), gap="60 seconds").collect()
        )
        base = int(T0.timestamp()) * 1_000_000
        assert out == [(base, 3), (base + 121_000_000, 1)]

    def test_exact_boundary_merges(self, spark):
        # Spark session_window's boundary is INCLUSIVE: diff == gap merges,
        # diff == gap + 1us splits (the oracle's brk rule is `> gap`)
        out = sessionize(
            ev_df(spark, [(1, 0), (1, 60)]), gap="60 seconds"
        ).collect()
        assert len(out) == 1 and out[0].n_events == 2
        out2 = sessionize(
            ev_df(spark, [(1, 0), (1, 60.000001)]), gap="60 seconds"
        ).collect()
        assert len(out2) == 2

    def test_outputs(self, spark):
        rows = [(1, 0), (1, 10), (1, 30)]
        r = sessionize(ev_df(spark, rows), gap="60 seconds").collect()[0]
        assert r.n_events == 3
        assert r.duration_us == 30_000_000
        assert r.mean_gap_us == 15_000_000

    def test_single_event_session_null_gap(self, spark):
        r = sessionize(ev_df(spark, [(7, 5)]), gap="60 seconds").collect()[0]
        assert r.n_events == 1 and r.duration_us == 0
        assert r.mean_gap_us is None

    def test_keys_do_not_merge(self, spark):
        rows = [(1, 0), (2, 1), (1, 2), (2, 3)]
        out = sessionize(ev_df(spark, rows), gap="60 seconds").collect()
        assert {(r.user_id, r.n_events) for r in out} == {(1, 2), (2, 2)}

    def test_session_stats(self, spark):
        rows = [(1, 0), (1, 10), (1, 200), (2, 0)]
        stats = {
            r.user_id: (r.n_sessions, r.total_events, r.events_per_session)
            for r in session_stats(
                sessionize(ev_df(spark, rows), gap="60 seconds")
            ).collect()
        }
        assert stats[1] == (2, 3, 1.5)
        assert stats[2] == (1, 1, 1.0)


class TestStreamingSessions:
    def test_stream_matches_batch(self, spark, tmp_path):
        import random

        rng = random.Random(11)
        rows = [
            (u, rng.uniform(0, 7200)) for u in range(20) for _ in range(30)
        ]
        df = ev_df(spark, rows)
        path = str(tmp_path / "events")
        df.write.parquet(path)

        batch = {
            (r.user_id, r.session_start_us): (
                r.session_end_us,
                r.n_events,
                r.duration_us,
                r.mean_gap_us,
            )
            for r in sessionize(
                spark.read.parquet(path), gap="5 minutes"
            ).collect()
        }

        stream = spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
        out = streaming_sessions(stream, gap="5 minutes", watermark="0 seconds")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.session_start_us): (
                r.session_end_us,
                r.n_events,
                r.duration_us,
                r.mean_gap_us,
            )
            for r in spark.sql("SELECT * FROM sess_stream").collect()
        }
        # append mode only emits watermark-closed sessions; every emitted
        # session must match batch exactly, and most sessions must emit
        assert got
        for k, v in got.items():
            assert batch[k] == v, k
        assert len(got) >= len(batch) * 0.5


class TestSessionizeProperty:
    def test_random_streams_match_islands_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        GAP_US = 60_000_000

        @settings(max_examples=12, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.integers(min_value=1, max_value=3),
                    st.integers(min_value=0, max_value=600_000_000),
                ),
                min_size=1,
                max_size=60,
            )
        )
        def check(rows):
            base = int(T0.timestamp()) * 1_000_000
            df = spark.createDataFrame(
                [(u, base + off) for u, off in rows], "user_id long, us long"
            ).select("user_id", F.timestamp_micros("us").alias("ts"))
            got = sorted(
                (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
                for r in sessionize(df, gap="60 seconds").collect()
            )

            # islands reference: merge iff diff <= gap (inclusive boundary)
            expect = []
            byuser = {}
            for u, off in rows:
                byuser.setdefault(u, []).append(base + off)
            for u, ts in byuser.items():
                ts.sort()
                start = prev = ts[0]
                n = 1
                for t in ts[1:]:
                    if t - prev <= GAP_US:
                        prev = t
                        n += 1
                    else:
                        expect.append((u, start, prev, n))
                        start = prev = t
                        n = 1
                expect.append((u, start, prev, n))
            assert got == sorted(expect)

        check()


class TestCohortRetention:
    W = 7 * 86400 * 1_000_000  # weekly cohorts

    def _events(self):
        rows = []
        # cohort week 0: users 1-4; u1 active weeks 0,1,2; u2 weeks 0,2;
        # u3 week 0 only; u4 weeks 0,1
        plan = {1: [0, 1, 2], 2: [0, 2], 3: [0], 4: [0, 1]}
        # cohort week 1: users 5-6; u5 weeks 1,3; u6 week 1
        plan.update({5: [1, 3], 6: [1]})
        for u, weeks in plan.items():
            for w in weeks:
                # several events inside the week (distinct must collapse)
                rows += [(u, w * self.W + i * 3600 * 1_000_000) for i in range(3)]
        return rows

    def _ref(self):
        return {
            (0, 0): (4, 4), (0, 1): (2, 4), (0, 2): (2, 4),
            (self.W, 0): (2, 2), (self.W, 2): (1, 2),
        }

    def test_matches_reference(self, spark):
        from usgs_geomag_algorithms_spark.operators.sessions import (
            cohort_retention,
        )

        df = spark.createDataFrame(self._events(), "user_id long, t_us long")
        got = {
            (r.cohort_us, r.k): (r.n_active, r.cohort_size, r.retention)
            for r in cohort_retention(df, self.W).collect()
        }
        ref = self._ref()
        assert set(got) == set(ref)
        for key, (n, size) in ref.items():
            assert got[key] == (n, size, float(n) / float(size))

    def test_single_corpus_shuffle(self, spark):
        from tests.test_plan_audit import PY_NODES, phys
        from usgs_geomag_algorithms_spark.operators.sessions import (
            cohort_retention,
        )

        df = spark.createDataFrame(self._events(), "user_id long, t_us long")
        out = cohort_retention(df, self.W)
        out.collect()
        plan = phys(out).split("== Initial Plan ==")[0]
        assert not any(n in plan for n in PY_NODES)
