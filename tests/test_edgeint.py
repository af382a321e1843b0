"""Edge scaled-int value codec — bit parity with the reference's
EdgeFactory numeric encoding (x1000 truncating int, D minutes boundary,
EdgeFactory.py:238-274,399-401,472-475)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.functions.channels import M2R, R2M
from usgs_geomag_algorithms_spark.functions.edgeint import (
    decode_edge_values,
    edge_decode,
    edge_encode,
    encode_edge_values,
)


def ref_encode(v: float, channel: str) -> int | None:
    """The reference put path in numpy terms: D radians->minutes
    (get_minutes_from_radians = v * R2M), multiply by 1000.00, astype(int)
    (truncation toward zero)."""
    if v is None or math.isnan(v):
        return None
    if channel == "D":
        v = np.multiply(v, R2M)
    return int(np.multiply(v, 1000.00))


def ref_decode(i: int | None, channel: str) -> float | None:
    """The reference get path: divide by 1000.00, D minutes->radians."""
    if i is None:
        return None
    v = np.divide(i, 1000.00)
    if channel == "D":
        v = np.multiply(v, M2R)
    return float(v)


def run_codec(spark, rows):
    df = spark.createDataFrame(rows, "channel string, value double")
    out = df.select(
        "channel",
        "value",
        edge_encode(F.col("value"), F.col("channel")).alias("enc"),
    ).select(
        "channel",
        "value",
        "enc",
        edge_decode(F.col("enc"), F.col("channel")).alias("dec"),
    )
    return out.collect()


class TestCodecParity:
    def test_vectors(self, spark):
        rows = [
            ("H", 20123.456789),
            ("H", -0.0004),
            ("H", 0.0015),
            ("Z", -47123.9999),
            ("D", 0.0123),  # radians
            ("D", -0.0123),
            ("F", float("nan")),
            ("E", None),
        ]
        got = run_codec(spark, rows)
        for r in got:
            exp_enc = ref_encode(r.value, r.channel)
            assert r.enc == exp_enc, (r.channel, r.value, r.enc, exp_enc)
            exp_dec = ref_decode(exp_enc, r.channel)
            if exp_dec is None:
                assert r.dec is None
            else:
                assert r.dec == exp_dec  # bit-exact double parity

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["H", "E", "Z", "F", "D"]),
                st.floats(
                    min_value=-1e5, max_value=1e5, allow_nan=False
                ),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_property_bit_parity(self, spark, rows):
        got = run_codec(spark, rows)
        byidx = sorted(got, key=lambda r: (r.channel, r.value))
        exp = sorted(rows)
        for r, (ch, v) in zip(byidx, exp):
            assert r.enc == ref_encode(v, ch)
            assert r.dec == ref_decode(r.enc, ch)

    def test_quantization_bound(self, spark):
        # decode(encode(v)) is within one 0.001 step (truncation) for
        # non-D channels; D within one step mapped through minutes
        rows = [("H", 1.23456789), ("H", -9.87654321), ("D", 0.005)]
        for r in run_codec(spark, rows):
            step = 0.001 * (M2R if r.channel == "D" else 1.0)
            assert abs(r.dec - r.value) < step + 1e-12

    def test_nan_never_becomes_zero(self, spark):
        # a bare double->long cast folds NaN to 0 in Spark; the codec
        # must encode NaN/NULL as NULL instead
        got = {r.channel: r for r in run_codec(
            spark, [("F", float("nan")), ("E", None)]
        )}
        assert got["F"].enc is None and got["F"].dec is None
        assert got["E"].enc is None and got["E"].dec is None


class TestFrameTransforms:
    def test_store_column_round_trip(self, spark):
        rows = [
            ("u1", "H", 0, 20123.4567),
            ("u1", "D", 0, 0.0123),
            ("u1", "F", 60_000_000, float("nan")),
        ]
        df = spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        )
        enc = encode_edge_values(df)
        # encoded values are exact integers riding the double column
        vals = {(r.url, r.channel, r.t_us): r.value for r in enc.collect()}
        assert vals[("u1", "H", 0)] == float(ref_encode(20123.4567, "H"))
        assert vals[("u1", "F", 60_000_000)] is None
        dec = decode_edge_values(enc)
        out = {(r.channel): r.value for r in dec.collect()}
        assert out["H"] == ref_decode(ref_encode(20123.4567, "H"), "H")
        assert out["D"] == ref_decode(ref_encode(0.0123, "D"), "D")
        assert out["F"] is None

    def test_schema_unchanged(self, spark):
        df = spark.createDataFrame(
            [("u", "H", 0, 1.0)],
            "url string, channel string, t_us long, value double",
        )
        enc = encode_edge_values(df)
        assert enc.columns == df.columns
        assert dict(enc.dtypes)["value"] == "double"


class TestOverflowGuard:
    """r4 advice pin: encoded |value| >= 2^53 must not round silently on
    the cast back to the store's float64 column."""

    def _frame(self, spark):
        # raw 1e13 encodes to 1e16 > 2^53 (~9.007e15)
        return spark.createDataFrame(
            [("u", "H", 0, 1.0e13), ("u", "H", 1, 1.0)],
            "url string, channel string, t_us long, value double",
        )

    def test_default_raises(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        with pytest.raises((Py4JJavaError, PySparkException)) as exc:
            encode_edge_values(self._frame(spark)).collect()
        assert "edge codec overflow" in str(exc.value)

    def test_null_mode_masks(self, spark):
        out = encode_edge_values(self._frame(spark), on_overflow="null")
        vals = {r.t_us: r.value for r in out.collect()}
        assert vals[0] is None
        assert vals[1] == 1000.0

    def test_boundary_value_passes(self, spark):
        # largest exactly-representable encoded magnitude: 2^53 - 1
        raw = (2**53 - 1) / 1000.0
        df = spark.createDataFrame(
            [("u", "H", 0, raw)],
            "url string, channel string, t_us long, value double",
        )
        [r] = encode_edge_values(df).collect()
        assert abs(r.value) < 2**53

    def test_bad_mode_rejected(self, spark):
        with pytest.raises(ValueError, match="on_overflow"):
            encode_edge_values(self._frame(spark), on_overflow="wat")
