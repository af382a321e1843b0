"""plans/calibration.py — the residual→affine→adjusted loop end-to-end:
reference BOU sessions feed the distributed absolutes + affine fits, the
matrices land in the versioned state table, and the realtime application
uses each observatory's OWN matrix."""

import json
import os
from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.plans import calibration as C
from usgs_geomag_algorithms_spark.sources.store import TierStore

RESID = "/root/reference/etc/residual/BOU20191001.json"

needs_ref = pytest.mark.skipif(
    not os.path.exists(RESID), reason="reference fixtures not available"
)

US = 1_000_000
MIN = 60 * US
T0 = 1577836800 * US

MEAS_SCHEMA = (
    "session_id string, seq int, azimuth double, hemisphere int, "
    "pier_correction double, mtype string, angle double, residual double, "
    "h double, e double, z double, f double"
)


def load_raw():
    with open(RESID) as f:
        return json.load(f)


def session_time(r):
    for a in r["absolutes"]:
        if a["element"] == "H" and a["endtime"]:
            return datetime.fromisoformat(a["endtime"]).replace(
                tzinfo=timezone.utc
            ).timestamp()
    return None


def build_frames(spark, observatories=("BOU",)):
    raw = load_raw()
    mrows, srows = [], []
    for obs in observatories:
        for i, r in enumerate(raw):
            t = session_time(r)
            if t is None:
                continue
            sid = f"{obs}-{i}"
            for k, m in enumerate(r["measurements"]):
                mrows.append(
                    (sid, k, r["azimuth"], r["hemisphere"],
                     r["pier_correction"], m["measurement_type"], m["angle"],
                     m["residual"], m["h"], m["e"], m["z"], m["f"])
                )
            srows.append((sid, obs, t, r["pier_correction"]))
    meas = spark.createDataFrame(mrows, MEAS_SCHEMA)
    sess = spark.createDataFrame(
        srows,
        "session_id string, observatory string, time double, "
        "pier_correction double",
    )
    return meas, sess


def span():
    raw = load_raw()
    ts = [session_time(r) for r in raw if session_time(r)]
    return min(ts) - 86400, max(ts) + 86400


@pytest.fixture()
def store(spark, tmp_path):
    return TierStore(spark, str(tmp_path / "t"), n_buckets=4)


@needs_ref
class TestFitAndStore:
    def test_end_to_end_fit_store_load(self, spark, store):
        meas, sess = build_frames(spark, ("BOU", "XYZ"))
        start, end = span()
        aff = C.fit_calibration(meas, sess, start, end)
        rows = aff.collect()
        assert {r.observatory for r in rows} == {"BOU", "XYZ"}
        n = C.store_calibration(store, aff)
        assert n == 2
        cal = C.load_calibration(store)
        assert set(cal) == {"BOU", "XYZ"}
        m, pier = cal["BOU"]
        assert m.shape == (4, 4)
        assert m[3].tolist() == [0.0, 0.0, 0.0, 1.0]  # affine bottom row
        assert np.isfinite(m).all()
        # both observatories got identical input -> identical fits
        assert np.allclose(cal["BOU"][0], cal["XYZ"][0])

    def test_restore_latest_interval_wins(self, spark, store):
        # two intervals for one observatory: state keeps the newest
        aff = spark.createDataFrame(
            [
                ("BOU", 100.0, [float(i) for i in range(16)], 1.0),
                ("BOU", 300.0, [float(i + 100) for i in range(16)], 2.0),
            ],
            "observatory string, time double, "
            "matrix array<double>, pier_correction double",
        )
        C.store_calibration(store, aff)
        cal = C.load_calibration(store)
        assert cal["BOU"][0][0, 0] == 100.0
        assert cal["BOU"][1] == 2.0


class TestApply:
    def seed(self, spark, store):
        rows = [
            (obs, ch, T0 + i * MIN, float(v))
            for i in range(5)
            for obs, base in (("BOU", 10.0), ("FRD", 20.0))
            for ch, v in (("H", base), ("E", 0.0), ("Z", 1.0), ("F", 5.0))
        ]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "minute",
        )

    def mk_state(self, spark, store, scale_bou, scale_frd):
        def m(s):
            mm = np.diag([s, s, s, 1.0])
            return [float(x) for x in mm.reshape(-1)]

        aff = spark.createDataFrame(
            [
                ("BOU", 0.0, m(scale_bou), 0.5),
                ("FRD", 0.0, m(scale_frd), -0.5),
            ],
            "observatory string, time double, "
            "matrix array<double>, pier_correction double",
        )
        C.store_calibration(store, aff)

    def test_each_observatory_uses_own_matrix(self, spark, store):
        self.seed(spark, store)
        self.mk_state(spark, store, 2.0, 3.0)
        metrics = C.adjusted_from_calibration(
            store, "adj", "minute", T0, T0 + 4 * MIN, interval_us=MIN
        )
        assert metrics["observatories"] == 2
        assert metrics["rows_written"] == 2 * 5 * 4
        out = store.read("adj")
        x = {
            r.url: r.value
            for r in out.where(
                (F.col("channel") == "X") & (F.col("t_us") == T0)
            ).collect()
        }
        assert x == {"BOU": 20.0, "FRD": 60.0}  # own scale each
        f = {
            r.url: r.value
            for r in out.where(
                (F.col("channel") == "F") & (F.col("t_us") == T0)
            ).collect()
        }
        assert f == {"BOU": 5.5, "FRD": 4.5}  # own pier each

    def test_idempotent_rerun(self, spark, store):
        self.seed(spark, store)
        self.mk_state(spark, store, 2.0, 3.0)
        C.adjusted_from_calibration(
            store, "adj", "minute", T0, T0 + 4 * MIN, interval_us=MIN
        )
        m = C.adjusted_from_calibration(
            store, "adj", "minute", T0, T0 + 4 * MIN, interval_us=MIN
        )
        assert m["rows_written"] == 0 and m["gaps_filled"] == 0


class TestCli:
    def test_calibrated_command(self, spark, store):
        import contextlib
        import io
        import json as _json

        from jobs.run_derived import main

        TestApply().seed(spark, store)
        TestApply().mk_state(spark, store, 2.0, 3.0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main([
                "calibrated", "--store", store.root,
                "--tier-in", "minute", "--tier-out", "adj",
                "--interval-us", str(MIN),
                "--now", "2020-01-01T00:05:00",
            ])
        m = _json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rc == 0 and m["observatories"] == 2
        assert m["rows_written"] == 40
