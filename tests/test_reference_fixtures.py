"""End-to-end parity against the reference's OWN shipped fixtures
(`/root/reference/etc/filter`, `etc/dbdt`): real observatory data in, the
reference's own expected IAGA2002 files out, at the reference test
suite's tolerance (``assert_almost_equal(..., 2)`` — FilterAlgorithm_test
/ DbDtAlgorithm_test).

The miniSEED inputs go through this engine's own Steim decoder
(sources/mseed.py) and the expected outputs through this engine's own
IAGA2002 parser (fixed-width reference slices), so these tests exercise
codec + cascade + alignment together on data this repo did not
synthesize."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.dbdt import dbdt
from usgs_geomag_algorithms_spark.operators.rollup import rollup_step
from usgs_geomag_algorithms_spark.sources.iaga2002 import read_iaga2002
from usgs_geomag_algorithms_spark.sources.mseed import read_mseed
from usgs_geomag_algorithms_spark.tiers import (
    STEPS,
    Step,
    US,
    get_filter_steps,
)
from usgs_geomag_algorithms_spark.functions import windows

ETC = "/root/reference/etc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ETC), reason="reference fixtures not present"
)

TOL = 1.5e-2  # assert_almost_equal(decimal=2)


def mseed_long(spark, path):
    df = read_mseed(spark, path)
    return df.select(
        F.col("station").alias("url"), "channel", "t_us", "value"
    )


def iaga_long(spark, path, station, channels):
    wide = read_iaga2002(spark, path, station=station, channels=channels)
    stack = ", ".join(f"'{c}', `{c}`" for c in channels)
    return wide.select(
        "t_us",
        F.expr(f"stack({len(channels)}, {stack}) as (channel, value)"),
    )


def compare(got_df, exp_df, channels, min_rows):
    got = {
        (r.channel, r.t_us): r.value
        for r in got_df.collect()
        if r.channel in channels
    }
    exp = {
        (r.channel, r.t_us): r.value
        for r in exp_df.collect()
        if r.channel in channels and r.value is not None
    }
    assert len(exp) >= min_rows
    missing = [k for k in exp if k not in got]
    assert not missing, f"{len(missing)} expected stamps absent, e.g. {missing[:3]}"
    diffs = [
        abs(got[k] - exp[k]) for k in exp if got[k] is not None
    ]
    nulls = [k for k in exp if got[k] is None]
    assert not nulls, f"{len(nulls)} NULL where reference has values: {nulls[:3]}"
    assert max(diffs) < TOL, f"max diff {max(diffs)}"


class TestFilterFixtures:
    def test_second(self, spark):
        """FilterAlgorithm_test.test_second: 10 Hz -> 1 s Blackman."""
        src = mseed_long(spark, f"{ETC}/filter/10HZ_filter_sec.mseed")
        out = rollup_step(src, STEPS[0])
        exp = iaga_long(
            spark, f"{ETC}/filter/LLO20200106vsec.sec", "LLO",
            ("U", "V", "W"),
        )
        compare(out, exp, {"U", "V", "W"}, min_rows=3 * 14000)

    def test_minute(self, spark):
        """FilterAlgorithm_test.test_minute: 10 Hz -> 1 minute cascade."""
        steps = get_filter_steps(0.1, 60.0)
        assert [s.name for s in steps] == ["10Hz", "Intermagnet One Minute"]
        cur = mseed_long(spark, f"{ETC}/filter/10HZ_filter_min.mseed")
        for s in steps:
            cur = rollup_step(cur, s)
        exp = iaga_long(
            spark, f"{ETC}/filter/LLO20200106vmin.min", "LLO",
            ("U", "V", "W"),
        )
        compare(cur, exp, {"U", "V", "W"}, min_rows=3 * 240)

    def test_hour(self, spark):
        """FilterAlgorithm_test.test_hour: minute -> hour boxcar."""
        src = mseed_long(spark, f"{ETC}/filter/hor_filter_min.mseed")
        out = rollup_step(src, STEPS[2])
        exp = iaga_long(
            spark, f"{ETC}/filter/BOU20200831vhor.hor", "BOU",
            ("H", "E", "Z"),
        )
        compare(out, exp, {"H", "E", "Z"}, min_rows=3 * 4)

    def test_day(self, spark):
        """FilterAlgorithm_test.test_day: minute -> day boxcar."""
        src = mseed_long(spark, f"{ETC}/filter/day_filter_min.mseed")
        out = rollup_step(src, STEPS[3])
        exp = iaga_long(
            spark, f"{ETC}/filter/BOU20200831vday.day", "BOU",
            ("H", "E", "Z"),
        )
        compare(out, exp, {"H", "E", "Z"}, min_rows=3)

    def test_custom_coefficients(self, spark):
        """FilterAlgorithm_test.test_custom: 10 Hz -> 1 s with the shipped
        custom coeffs.json."""
        spec = windows.load_coefficients_json(f"{ETC}/filter/coeffs.json")
        step = Step(
            name="custom",
            data_interval="second",
            input_sample_period=0.1,
            output_sample_period=1.0,
            window=spec["window"],
            type=spec["type"],
        )
        src = mseed_long(spark, f"{ETC}/filter/10HZ_filter_sec.mseed")
        out = rollup_step(src, step)
        exp = iaga_long(
            spark, f"{ETC}/filter/LLO20200106_custom_vsec.sec", "LLO",
            ("U", "V", "W"),
        )
        compare(out, exp, {"U", "V", "W"}, min_rows=3 * 14000)


class TestDbDtFixture:
    def test_dbdt_minute(self, spark):
        """DbDtAlgorithm_test.test_process: BOU May 2020 minute H -> H_DT."""
        src = iaga_long(
            spark, f"{ETC}/dbdt/BOU202005vmin.min", "BOU", ("H",)
        ).select(F.lit("BOU").alias("url"), "channel", "t_us", "value")
        out = dbdt(src, delta_s=60.0)
        # the expected file stores H_DT under plain "H" (IAGA2002 has no
        # _DT column naming); strip the suffix for the join
        got = out.select(
            F.regexp_replace("channel", "_DT$", "").alias("channel"),
            "t_us",
            "value",
        )
        exp = iaga_long(
            spark, f"{ETC}/dbdt/BOU202005dbdt.min", "BOU", ("H",)
        )
        compare(got, exp, {"H"}, min_rows=50)


class TestControllerSqDistFixture:
    """Controller_test.test_controller_update_sqdist: the reference's
    six-invocation realtime SqDist scenario on REAL BOU data with the
    shipped statefile — gaps that are shorter than the realtime interval
    are not projected over, longer ones free-run, and a restart before
    ``next_starttime`` resumes where the state left off
    (Controller.py:292-304 realtime pad/trim; SqDistAlgorithm state)."""

    MIN_US = 60 * 1_000_000
    REALTIME_US = 600 * 1_000_000

    def load_h(self, spark):
        import math

        wide = read_iaga2002(
            spark,
            f"{ETC}/controller/bou20181024_XYZF_vmin.min",
            station="BOU",
            channels=("X", "Y", "Z", "F"),
        )
        h = {}
        for r in wide.collect():
            if r.X is None or r.Y is None:
                h[r.t_us] = float("nan")
            else:
                h[r.t_us] = math.hypot(r.X, r.Y)  # get_mag_from_geo
        return h

    def test_six_invocations_match_expected(self, spark):
        import json as _json
        from datetime import datetime, timezone

        from usgs_geomag_algorithms_spark.operators.sqdist import (
            HWParams,
            HWState,
            sqdist_decompose,
        )

        raw = _json.load(
            open(f"{ETC}/controller/sqdistBOU_h_state.json")
        )
        next_start = int(
            datetime.fromisoformat(
                raw["next_starttime"].replace("Z", "+00:00")
            ).timestamp()
            * 1_000_000
        )
        state = HWState(
            yhat0=raw["yhat0"],
            s0=raw["s0"],
            l0=raw["l0"],
            b0=raw["b0"],
            sigma0=raw["sigma0"],
        )
        params = HWParams(
            m=1440, alpha=2.3148e-5, beta=0.0, gamma=3.3333e-2, smooth=180
        )
        h = self.load_h(spark)

        def us(hhmm):
            base = 1540339200 * 1_000_000  # 2018-10-24T00:00:00Z
            return base + (hhmm // 100 * 60 + hhmm % 100) * self.MIN_US

        windows = [
            (us(0), us(19), "test1"),
            (us(20), us(39), "test2"),
            (us(40), us(59), "test3"),
            (us(100), us(119), "test4"),
            (us(120), us(139), "test5"),
            (us(120), us(159), "test6"),
        ]
        got = {}  # t_us -> dict(channel -> value)
        for w_start, w_end, tag in windows:
            start = next_start or w_start  # Controller.py:277-278
            grid = list(range(start, w_end + self.MIN_US, self.MIN_US))
            vals = np.array(
                [h.get(t, float("nan")) for t in grid], dtype=np.float64
            )
            # realtime rule (Controller.py:296-303): process to the later
            # of last real data and the start of the realtime gap
            present = [t for t, v in zip(grid, vals) if not np.isnan(v)]
            input_end = max(
                present[-1] if present else start,
                w_end - self.REALTIME_US,
            )
            k = (input_end - start) // self.MIN_US + 1
            dist, sq, sv, sig, state = sqdist_decompose(
                vals[:k], params, state
            )
            for i, t in enumerate(grid[:k]):
                got[t] = {
                    "MDT": dist[i], "MSQ": sq[i], "MSV": sv[i], "MSS": sig[i]
                }
            next_start = input_end + self.MIN_US

            exp = read_iaga2002(
                spark,
                f"{ETC}/controller/bou20181024_DQVS_{tag}_vmin.min",
                station="BOU",
                channels=("MDT", "MSQ", "MSV", "MSS"),
            )
            n_exp = 0
            for r in exp.collect():
                for ch in ("MDT", "MSQ", "MSV", "MSS"):
                    e = getattr(r, ch)
                    if e is None:
                        continue
                    n_exp += 1
                    g = got.get(r.t_us, {}).get(ch)
                    assert g is not None and not np.isnan(g), (
                        tag, ch, r.t_us
                    )
                    assert abs(g - e) < 0.011, (tag, ch, r.t_us, g, e)
            assert n_exp > 0, tag
        # the resume pointer ends one step past the last processed minute
        # (test6 data runs through 01:59 -> next cron tick starts at 02:00)
        assert next_start == us(159) + self.MIN_US


class TestIaga2002ParserExample:
    def test_reader_parses_reference_example(self, spark, tmp_path):
        """The IAGA2002_EXAMPLE block from the reference's own parser
        test (test/iaga2002_test/IAGA2002Parser_test.py) — extracted at
        runtime, full header + comment block + DECBAS line included —
        must parse to the same first/last values through this engine's
        fixed-width reader."""
        import re

        src = open(
            "/root/reference/test/iaga2002_test/IAGA2002Parser_test.py"
        ).read()
        m = re.search(r'IAGA2002_EXAMPLE = """(.*?)"""', src, re.S)
        assert m, "example block not found"
        p = tmp_path / "example.min"
        p.write_text(m.group(1))
        df = read_iaga2002(
            spark, str(p), station="BDT", channels=("H", "D", "Z", "F")
        ).orderBy("t_us")
        rows = df.collect()
        assert len(rows) >= 10
        first = rows[0]
        # 2013-09-01 00:00 244: 21516.28 -29.03 47809.92 52533.39
        assert first.t_us == 1377993600000000
        assert (first.H, first.D, first.Z, first.F) == (
            21516.28, -29.03, 47809.92, 52533.39
        )
        # header/comment/DECBAS lines were all skipped, one row a minute
        ts = [r.t_us for r in rows]
        assert all(b - a == 60_000_000 for a, b in zip(ts, ts[1:]))
