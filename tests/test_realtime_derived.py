"""Realtime derived-product updates (processing/derived.py + efield.py
parity): gap-driven adjusted/average/efield over the tier store."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.plans import realtime as RT
from usgs_geomag_algorithms_spark.sources.store import TierStore

US = 1_000_000
MIN = 60 * US
T0 = 1577836800 * US  # 2020-01-01 00:00


@pytest.fixture()
def store(spark, tmp_path):
    return TierStore(spark, str(tmp_path / "tiers"), n_buckets=4)


def seed_hezf(spark, store, n_min, tier="minute", url="BOU"):
    rows = [
        (url, ch, T0 + i * MIN, float(100 * k + i))
        for i in range(n_min)
        for k, ch in enumerate(["H", "E", "Z", "F"], start=1)
    ]
    df = spark.createDataFrame(
        rows, schema="url string, channel string, t_us long, value double"
    )
    store.write(df, tier)
    return rows


IDENT4 = np.eye(4)
DOUBLE4 = np.diag([2.0, 2.0, 2.0, 1.0])


class TestRealtimeWindow:
    def test_floors_to_minute(self):
        now = T0 + 3 * MIN + 17 * US + 123
        s, e = RT.get_realtime_interval(600, now)
        assert e == T0 + 3 * MIN
        assert s == e - 600 * US

    def test_fresh_tier_fills_whole_window(self, spark, store):
        seed_hezf(spark, store, 10)
        m = RT.adjusted_update(
            store, "adj", "minute", DOUBLE4, interval_us=MIN,
            start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["gaps_filled"] == 1
        out = store.read("adj")
        assert out.count() == 10 * 4
        x0 = out.where(
            (F.col("channel") == "X") & (F.col("t_us") == T0)
        ).first()
        assert x0.value == 200.0  # 2 * H(100)

    def test_second_run_is_noop(self, spark, store):
        seed_hezf(spark, store, 10)
        RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 9 * MIN,
        )
        v1 = store.current_version("adj")
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["gaps_filled"] == 0 and m["rows_written"] == 0
        assert store.current_version("adj") == v1  # no write at all

    def test_only_gap_slots_recompute(self, spark, store):
        seed_hezf(spark, store, 10)
        RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 9 * MIN,
        )
        # punch a hole: drop one output channel at minutes 4-5
        store.delete_rows(
            spark.createDataFrame(
                [("BOU", "X", T0 + 4 * MIN), ("BOU", "X", T0 + 5 * MIN)],
                schema="url string, channel string, t_us long",
            ),
            "adj",
        )
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["gaps_filled"] == 1  # one merged 2-slot interval
        assert m["rows_written"] == 2 * 4  # whole vector recomputed per slot
        assert store.read("adj").count() == 40

    def test_incomplete_input_vector_not_expected(self, spark, store):
        # minute 3 is missing channel E -> can_produce_data is false there
        rows = [
            ("BOU", ch, T0 + i * MIN, 1.0)
            for i in range(5)
            for ch in ["H", "E", "Z", "F"]
            if not (i == 3 and ch == "E")
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        store.write(df, "minute")
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 4 * MIN,
        )
        ts = sorted(
            r.t_us
            for r in store.read("adj").select("t_us").distinct().collect()
        )
        assert ts == [T0, T0 + MIN, T0 + 2 * MIN, T0 + 4 * MIN]
        # a rerun does NOT keep retrying the impossible slot
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 4 * MIN,
        )
        assert m["gaps_filled"] == 0

    def test_update_limit_widens_backward(self, spark, store):
        seed_hezf(spark, store, 30)
        # realtime window covers only the last 10 minutes; older data is
        # also absent from the output -> the gap touches the window start
        # and the window slides back (Controller.py:427-448)
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0 + 20 * MIN, end_us=T0 + 29 * MIN,
            realtime_interval_s=600, update_limit=10,
        )
        assert m["windows_examined"] > 1
        assert store.read("adj").count() == 30 * 4

    def test_update_limit_bounds_backfill(self, spark, store):
        seed_hezf(spark, store, 30)
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0 + 20 * MIN, end_us=T0 + 29 * MIN,
            realtime_interval_s=600, update_limit=1,
        )
        assert m["windows_examined"] == 1
        assert store.read("adj").count() == 10 * 4


class TestEfield:
    def test_polarity_inversion(self, spark, store):
        rows = [
            ("BOU", ch, T0 + i * US, float(v * (i + 1)))
            for i in range(120)
            for ch, v in [("E-E", 1), ("E-N", -2)]
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        store.write(df, "second")
        m = RT.efield_update(
            store, "second_adj", "second", interval_us=US,
            start_us=T0, end_us=T0 + 119 * US,
        )
        assert m["rows_written"] == 240
        out = store.read("second_adj")
        ee = out.where((F.col("channel") == "E-E") & (F.col("t_us") == T0))
        en = out.where((F.col("channel") == "E-N") & (F.col("t_us") == T0))
        assert ee.first().value == -1.0
        assert en.first().value == 2.0


class TestAverage:
    def seed(self, spark, store, missing_minute=None):
        rows = []
        for i in range(10):
            for obs, v in [("BOU", 10.0), ("FRD", 20.0), ("TUC", 60.0)]:
                if missing_minute == i and obs == "FRD":
                    continue
                rows.append((obs, "H", T0 + i * MIN, v))
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        store.write(df, "minute")

    def test_average_onto_output_observatory(self, spark, store):
        self.seed(spark, store)
        m = RT.average_update(
            store, "dst", "minute", ["BOU", "FRD", "TUC"], "H",
            output_observatory="USGS", output_channel="UX3",
            interval_us=MIN, start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["rows_written"] == 10
        out = store.read("dst")
        r = out.where(F.col("t_us") == T0).first()
        assert (r.url, r.channel, r.value) == ("USGS", "UX3", 30.0)

    def test_missing_observatory_slot_not_expected(self, spark, store):
        self.seed(spark, store, missing_minute=4)
        m = RT.average_update(
            store, "dst", "minute", ["BOU", "FRD", "TUC"], "H",
            interval_us=MIN, start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["rows_written"] == 9
        assert store.read("dst").where(F.col("t_us") == T0 + 4 * MIN).count() == 0
        # idempotent: the impossible slot is not retried
        m = RT.average_update(
            store, "dst", "minute", ["BOU", "FRD", "TUC"], "H",
            interval_us=MIN, start_us=T0, end_us=T0 + 9 * MIN,
        )
        assert m["gaps_filled"] == 0


class TestRunDerivedCli:
    def run(self, argv):
        import contextlib
        import io
        import json

        from jobs.run_derived import main

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(argv)
        return rc, json.loads(buf.getvalue().strip().splitlines()[-1])

    def test_adjusted_command(self, spark, store, tmp_path):
        seed_hezf(spark, store, 10)
        state = tmp_path / "adj.json"
        state.write_text(
            '{"matrix": [[2,0,0,0],[0,2,0,0],[0,0,2,0],[0,0,0,1]], '
            '"pier_correction": 1.5}'
        )
        # cron tick just past the data end; 600 s window covers all 10 min
        rc, m = self.run([
            "adjusted", "--store", store.root,
            "--tier-in", "minute", "--tier-out", "adj",
            "--matrix", str(state), "--interval-us", str(MIN),
            "--now", "2020-01-01T00:10:00",
        ])
        assert rc == 0 and m["rows_written"] == 40
        f0 = (
            store.read("adj")
            .where((F.col("channel") == "F") & (F.col("t_us") == T0))
            .first()
        )
        assert f0.value == 400.0 + 1.5  # F passthrough + pier

    def test_efield_command_runs_minute_legs(self, spark, store):
        rows = [
            ("BOU", ch, T0 + i * US, 1.0)
            for i in range(240)
            for ch in ("E-E", "E-N")
        ]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "second",
        )
        rc, m = self.run([
            "efield", "--store", store.root,
            "--tier-in", "second", "--tier-out", "second_adj",
            "--now", "2020-01-01T00:04:00",
        ])
        assert rc == 0 and m["rows_written"] == 480
        assert m["minute_second_minute_rows"] > 0
        assert m["minute_second_adj_minute_rows"] > 0
        mv = store.read("second_adj_minute").where(F.col("channel") == "E-E")
        assert mv.count() > 0

    def test_inband_null_input_is_a_gap_not_data(self, spark, store):
        # a masked NULL row (the cascade's in-band gap convention) must
        # not mark a slot expected: the NaN-propagating average would
        # never fill it -> every cron tick would re-flag it (seen live)
        rows = [
            (obs, "H", T0 + i * MIN, None if (i == 2 and obs == "TUC") else 5.0)
            for i in range(5)
            for obs in ("BOU", "FRD", "TUC")
        ]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "minute",
        )
        m = RT.average_update(
            store, "dst", "minute", ["BOU", "FRD", "TUC"], "H",
            interval_us=MIN, start_us=T0, end_us=T0 + 4 * MIN,
        )
        assert m["rows_written"] == 4
        m = RT.average_update(
            store, "dst", "minute", ["BOU", "FRD", "TUC"], "H",
            interval_us=MIN, start_us=T0, end_us=T0 + 4 * MIN,
        )
        assert m["gaps_filled"] == 0


class TestReviewRegressions:
    def test_nan_neighbor_series_not_masked(self, spark, store):
        # review finding: a merged gap interval's recompute reads EVERY
        # series in [lo,hi]; a series with an incomplete/NaN input vector
        # there must not get NaN output rows written (they would mask the
        # slot forever) and must be picked up once its input is backfilled
        nan = float("nan")
        rows = [
            ("BOU", "E-E", T0, 1.0), ("BOU", "E-N", T0, 2.0),
            ("FRD", "E-E", T0, nan), ("FRD", "E-N", T0, 3.0),
        ]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "second",
        )
        m = RT.efield_update(
            store, "adj", "second", interval_us=US, start_us=T0, end_us=T0
        )
        # matrix application NaN-propagates the whole vector (0*NaN=NaN,
        # same as the reference's np.dot) -> FRD emits only NaN rows and
        # NONE may be written (they would mask the slot forever)
        assert m["rows_written"] == 2
        out = store.read("adj").collect()
        assert sorted((r.url, r.channel) for r in out) == [
            ("BOU", "E-E"), ("BOU", "E-N")
        ]
        assert not any(
            v != v for v in (r.value for r in out)
        )  # no NaN landed
        # second run: clean no-op (FRD slot is not expected yet)
        m = RT.efield_update(
            store, "adj", "second", interval_us=US, start_us=T0, end_us=T0
        )
        assert m["gaps_filled"] == 0
        # backfill FRD's E-E -> the slot becomes expected and fills
        store.upsert(
            spark.createDataFrame(
                [("FRD", "E-E", T0, 5.0)],
                "url string, channel string, t_us long, value double",
            ),
            "second",
        )
        m = RT.efield_update(
            store, "adj", "second", interval_us=US, start_us=T0, end_us=T0
        )
        assert m["rows_written"] == 4  # BOU + FRD full vectors recomputed
        frd = {
            r.channel: r.value
            for r in store.read("adj").where(F.col("url") == "FRD").collect()
        }
        assert frd == {"E-E": -5.0, "E-N": -3.0}

    def test_stale_nan_output_row_is_repaired(self, spark, store):
        # a NaN row in the OUTPUT tier (written by an older engine or
        # another writer) must not count as present
        seed_hezf(spark, store, 3)
        store.write(
            spark.createDataFrame(
                [("BOU", "X", T0 + MIN, float("nan"))],
                "url string, channel string, t_us long, value double",
            ),
            "adj",
        )
        m = RT.adjusted_update(
            store, "adj", "minute", IDENT4, interval_us=MIN,
            start_us=T0, end_us=T0 + 2 * MIN,
        )
        assert m["rows_written"] == 3 * 4
        x1 = (
            store.read("adj")
            .where((F.col("channel") == "X") & (F.col("t_us") == T0 + MIN))
            .first()
        )
        assert x1.value == 100.0 + 1  # H at minute 1

    def test_off_grid_window_start_still_widens(self, spark, store):
        # review finding: widening compared the oldest gap to the RAW
        # win_start; with an hourly product and a minute-aligned start the
        # comparison could never match and update_limit was ignored
        HOUR = 60 * MIN
        rows = [
            ("BOU", ch, T0 + h * HOUR, float(h))
            for h in range(6)
            for ch in ("H", "E", "Z", "F")
        ]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "hourly",
        )
        # realtime window [T0+4h+30min, T0+5h]: start is OFF the hourly
        # grid; older hours are absent from the output
        m = RT.adjusted_update(
            store, "adj", "hourly", IDENT4, interval_us=HOUR,
            start_us=T0 + 4 * HOUR + 30 * MIN, end_us=T0 + 5 * HOUR,
            realtime_interval_s=3600, update_limit=10,
        )
        assert m["windows_examined"] > 1
        assert store.read("adj").count() == 6 * 4  # all hours backfilled
