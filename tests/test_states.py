"""Time-in-state aggregation: hand-computed durations, midnight splits,
tie handling, share normalization."""

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.states import (
    DAY_US,
    state_durations,
    state_share_day,
)

H = 3_600_000_000  # one hour in us


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, schema="event_id long, user_id long, t_us long, event_type string"
    )


class TestStateDurations:
    def test_hand_computed(self, spark):
        # user 1: a[0h] -> b[2h] -> a[5h] -> (open tail, dropped)
        # user 2: b[1h] -> b[4h] -> (open tail, dropped)
        ev = _ev(
            spark,
            [
                (1, 1, 0 * H, "a"),
                (2, 1, 2 * H, "b"),
                (3, 1, 5 * H, "a"),
                (4, 2, 1 * H, "b"),
                (5, 2, 4 * H, "b"),
            ],
        )
        got = {r.state: r for r in state_durations(ev).collect()}
        assert got["a"].total_us == 2 * H  # user1 a: [0h,2h)
        assert got["a"].n_segments == 1
        assert got["a"].n_entities == 1
        assert got["b"].total_us == 3 * H + 3 * H  # u1 [2h,5h) + u2 [1h,4h)
        assert got["b"].n_segments == 2
        assert got["b"].n_entities == 2
        assert got["b"].max_us == 3 * H
        assert got["b"].mean_us == 3 * H  # exact: 6h/2

    def test_simultaneous_events_zero_segment(self, spark):
        # two events at the same t: tie broken on event_id -> first holds 0us
        ev = _ev(spark, [(1, 1, H, "a"), (2, 1, H, "b"), (3, 1, 2 * H, "a")])
        got = {r.state: r for r in state_durations(ev).collect()}
        assert got["a"].total_us == 0
        assert got["b"].total_us == H

    def test_single_event_entity_emits_nothing(self, spark):
        ev = _ev(spark, [(1, 1, H, "a")])
        assert state_durations(ev).count() == 0


class TestStateShareDay:
    def test_midnight_split_exact(self, spark):
        # one segment [day0 22h, day1 3h): 2h to day0, 3h to day1
        ev = _ev(spark, [(1, 1, 22 * H, "a"), (2, 1, DAY_US + 3 * H, "b")])
        got = {(r.day_us, r.state): r for r in state_share_day(ev).collect()}
        assert got[(0, "a")].covered_us == 2 * H
        assert got[(DAY_US, "a")].covered_us == 3 * H
        assert len(got) == 2

    def test_exact_day_boundary_no_phantom_day(self, spark):
        # segment ending exactly at midnight must NOT touch the next day
        ev = _ev(spark, [(1, 1, 20 * H, "a"), (2, 1, DAY_US, "b")])
        rows = state_share_day(ev).collect()
        assert len(rows) == 1
        assert rows[0].day_us == 0 and rows[0].covered_us == 4 * H

    def test_shares_sum_to_one_per_day(self, spark):
        ev = _ev(
            spark,
            [
                (1, 1, 0, "a"),
                (2, 1, 5 * H, "b"),
                (3, 1, 8 * H, "a"),
                (4, 2, 2 * H, "c"),
                (5, 2, 30 * H, "a"),
            ],
        )
        per_day = (
            state_share_day(ev)
            .groupBy("day_us")
            .agg(F.sum("share").alias("s"), F.sum("covered_us").alias("cov"))
            .collect()
        )
        assert len(per_day) == 2
        for r in per_day:
            assert abs(r.s - 1.0) < 1e-12
        # total covered == total closed-segment time
        assert sum(r.cov for r in per_day) == (8 * H) + (28 * H)
