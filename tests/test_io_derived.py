"""IAGA2002 shim round-trip, derived channels, existence gates."""

import math

import numpy as np
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.convert import pivot_channels
from usgs_geomag_algorithms_spark.operators.derived import (
    derive_missing_channels,
    get_missing,
)
from usgs_geomag_algorithms_spark.operators.gaps import (
    has_all_channels,
    has_any_channels,
)
from usgs_geomag_algorithms_spark.sources.iaga2002 import (
    read_iaga2002,
    write_iaga2002,
)
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US
MIN = 60 * US


class TestIaga2002:
    def test_roundtrip_with_gaps(self, spark, tmp_path):
        rows = []
        rng = np.random.default_rng(2)
        for i in range(10):
            rows.append(
                (
                    T0 + i * MIN,
                    None if i == 3 else round(float(rng.normal(20800, 5)), 2),
                    round(float(rng.normal(-70, 2)), 2),
                    round(float(rng.normal(47000, 3)), 2),
                    None if i == 7 else round(float(rng.normal(52000, 4)), 2),
                )
            )
        wide = spark.createDataFrame(
            rows, schema="t_us long, H double, E double, Z double, F double"
        )
        path = str(tmp_path / "iaga")
        write_iaga2002(wide, path)
        back = read_iaga2002(spark, path)
        got = {r.t_us: r for r in back.collect()}
        assert len(got) == 10
        for r in rows:
            g = got[r[0]]
            for col, exp in zip("HEZF", r[1:]):
                if exp is None:
                    assert g[col] is None
                else:
                    np.testing.assert_almost_equal(g[col], exp, decimal=2)


class TestDerived:
    def test_get_missing(self):
        assert get_missing(["H", "E"], ["H", "E", "Z"]) == ["Z"]

    def test_derive_xy_then_g(self, spark):
        d = math.radians(10.0)
        rows = [("u", "H", T0, 100.0), ("u", "D", T0, d), ("u", "Z", T0, 50.0),
                ("u", "F", T0, 110.0)]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        wide = pivot_channels(df, ["H", "D", "Z", "F"])
        out = derive_missing_channels(wide, ["X", "Y", "G"]).collect()[0]
        np.testing.assert_almost_equal(out.X, 100 * math.cos(d))
        np.testing.assert_almost_equal(out.Y, 100 * math.sin(d))
        fv = math.sqrt((100 * math.cos(d)) ** 2 + (100 * math.sin(d)) ** 2 + 50**2)
        np.testing.assert_almost_equal(out.G, fv - 110.0)

    def test_non_derivable_left_absent(self, spark):
        rows = [("u", "Z", T0, 50.0)]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        wide = pivot_channels(df, ["Z"])
        out = derive_missing_channels(wide, ["X", "Y"])
        assert "X" not in out.columns


class TestExistenceGates:
    def test_has_any_and_all(self, spark):
        rows = [
            ("u", "H", T0, 1.0),
            ("u", "H", T0 + MIN, None),
            ("u", "E", T0 + 5 * MIN, 2.0),
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        assert has_any_channels(df, ["H", "E"], T0, T0 + 10 * MIN)
        assert has_all_channels(df, ["H", "E"], T0, T0 + 10 * MIN)
        assert not has_all_channels(df, ["H", "E", "Z"], T0, T0 + 10 * MIN)
        assert not has_any_channels(df, ["H"], T0 + MIN, T0 + 4 * MIN)  # only a NaN row
