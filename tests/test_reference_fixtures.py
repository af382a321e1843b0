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
