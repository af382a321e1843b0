"""SNCL naming parity with the reference's test vectors
(``test/edge_test/SNCL_test.py``), plus bulk-column equivalence: the
Catalyst when()-chain codecs must agree with the plain mapping on every
vector."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.functions.sncl import (
    SNCL,
    channel_code,
    channel_code_col,
    decode_sncl,
    element_from_codes_col,
    encode_sncl,
    location_code,
    location_code_col,
)

# (element, interval, data_type) -> channel — ref SNCL_test.py:139-201
CHANNEL_VECTORS = [
    ("U_Volt", "tenhertz", "variation", "BEU"),
    ("U_Bin", "tenhertz", "variation", "BYU"),
    ("D", "second", "variation", "LFD"),
    ("D", "second", "R0", "LFD"),
    ("F", "minute", "variation", "UFF"),
    ("U", "hour", "variation", "RFU"),
    ("V", "hour", "variation", "RFV"),
    ("W", "hour", "variation", "RFW"),
    ("H", "hour", "variation", "RFU"),
    ("H", "hour", "R0", "RFH"),
    ("E", "hour", "variation", "RFV"),
    ("E", "hour", "R0", "RFE"),
    ("Z", "hour", "variation", "RFW"),
    ("Z", "hour", "R0", "RFZ"),
    ("H", "hour", "adjusted", "RFH"),
    ("Z", "hour", "adjusted", "RFZ"),
    ("Dst4", "day", "variation", "PX4"),
    ("Dst3", "minute", "variation", "UX3"),
    ("E-E", "minute", "variation", "UQE"),
    ("E-N", "minute", "variation", "UQN"),
    ("UK1", "minute", "variation", "UK1"),
    ("U_Dist", "minute", "variation", "UFU"),
    ("U_SQ", "minute", "variation", "UFU"),
    ("U_SV", "minute", "variation", "UFU"),
    ("U_Dist", "minute", "adjusted", "UFU"),
    ("UK1.R0", "minute", "variation", "UK1"),
    ("T1", "minute", "variation", "UK1"),
    ("T4", "minute", "variation", "UK4"),
]

# (element, data_type) -> location — ref SNCL_test.py:204-220
LOCATION_VECTORS = [
    ("D", "variation", "R0"),
    ("D", "R0", "R0"),
    ("D", "adjusted", "A0"),
    ("D", "quasi-definitive", "Q0"),
    ("D", "definitive", "D0"),
    ("D_Sat", "variation", "R1"),
    ("D", "R1", "R1"),
    ("D_Dist", "variation", "RD"),
    ("D_SQ", "variation", "RQ"),
    ("D_SV", "variation", "RV"),
]


class TestPlain:
    def test_channel_vectors(self):
        for el, iv, dt, want in CHANNEL_VECTORS:
            assert channel_code(el, iv, dt) == want, (el, iv, dt)

    def test_location_vectors(self):
        for el, dt, want in LOCATION_VECTORS:
            assert location_code(el, dt) == want, (el, dt)

    def test_get_sncl(self):
        # ref SNCL_test.py:222-231: H and U both name the variation U
        for el in ("U", "H"):
            assert encode_sncl(el, "second", "variation", "BOU") == SNCL(
                station="BOU", network="NT", channel="LFU", location="R0"
            )

    def test_decode_data_type_interval(self):
        # ref test_data_type / test_interval
        for loc, dt in (
            ("R0", "variation"),
            ("A0", "adjusted"),
            ("Q0", "quasi-definitive"),
            ("D0", "definitive"),
        ):
            got = decode_sncl(SNCL(station="BOU", channel="LFU", location=loc))
            assert got["data_type"] == dt
        for ch, iv in (
            ("BFU", "tenhertz"),
            ("LFU", "second"),
            ("UFU", "minute"),
            ("RFU", "hour"),
            ("PFU", "day"),
        ):
            got = decode_sncl(SNCL(station="BOU", channel=ch, location="R0"))
            assert got["interval"] == iv

    def test_decode_element(self):
        # ref test_element: channel letter + suffix from kind/location
        cases = [
            ("UFD", "R0", "D"),
            ("UED", "R0", "D_Volt"),
            ("UYD", "R0", "D_Bin"),
            ("UKD", "R0", "D_Temp"),
            ("UFD", "R1", "D_Sat"),
            ("UFD", "RD", "D_Dist"),
            ("UFD", "RQ", "D_SQ"),
            ("UFD", "RV", "D_SV"),
            ("UQE", "R0", "E-E"),
            ("UX3", "R0", "Dst3"),
            ("UK1", "R0", "T1"),
        ]
        for ch, loc, want in cases:
            got = decode_sncl(SNCL(station="BOU", channel=ch, location=loc))
            assert got["element"] == want, (ch, loc)

    def test_decode_errors(self):
        with pytest.raises(ValueError, match="location"):
            decode_sncl(SNCL(station="BOU", channel="LFU", location="X0"))
        with pytest.raises(ValueError, match="interval"):
            decode_sncl(SNCL(station="BOU", channel="ZFU", location="R0"))


class TestBulkColumns:
    def test_channel_code_col_matches_plain(self, spark):
        by_cfg = {}
        for el, iv, dt, want in CHANNEL_VECTORS:
            by_cfg.setdefault((iv, dt), []).append((el, want))
        for (iv, dt), pairs in by_cfg.items():
            df = spark.createDataFrame(pairs, "element string, want string")
            out = df.select(
                "want", channel_code_col(F.col("element"), iv, dt).alias("got")
            )
            bad = out.where(F.col("got") != F.col("want")).collect()
            assert not bad, (iv, dt, bad)

    def test_location_code_col_matches_plain(self, spark):
        by_dt = {}
        for el, dt, want in LOCATION_VECTORS:
            if len(dt) == 2:
                continue  # raw-location passthrough is a plan-time branch
            by_dt.setdefault(dt, []).append((el, want))
        for dt, pairs in by_dt.items():
            df = spark.createDataFrame(pairs, "element string, want string")
            out = df.select(
                "want", location_code_col(F.col("element"), dt).alias("got")
            )
            bad = out.where(F.col("got") != F.col("want")).collect()
            assert not bad, (dt, bad)

    def test_element_decode_col_matches_plain(self, spark):
        cases = [
            ("UFD", "R0"), ("UED", "R0"), ("UYD", "R0"), ("UKD", "R0"),
            ("UFD", "R1"), ("UFD", "RD"), ("UFD", "RQ"), ("UFD", "RV"),
            ("UQE", "R0"), ("UX3", "R0"), ("UK1", "R0"), ("LFU", "A0"),
        ]
        rows = [
            (ch, loc, decode_sncl(SNCL(station="S", channel=ch, location=loc))["element"])
            for ch, loc in cases
        ]
        df = spark.createDataFrame(rows, "channel string, location string, want string")
        out = df.select(
            "want",
            element_from_codes_col(F.col("channel"), F.col("location")).alias("got"),
        )
        bad = out.where(F.col("got") != F.col("want")).collect()
        assert not bad, bad

    def test_multi_suffix_precedence_matches_plain(self, spark):
        # an element carrying TWO suffixes must encode identically in the
        # scalar and bulk paths: first-match precedence (_Volt > _Bin >
        # _Temp; _Sat > _Dist > _SQ > _SV), not last-match
        els = [
            "H_Temp_Volt", "H_Volt_Temp", "H_Bin_Temp", "H_Temp_Bin",
            "H_Volt_Bin", "H_Dist_Sat", "H_SV_Dist", "H_SQ_Sat", "H_SV_SQ",
        ]
        rows = [
            (el, channel_code(el, "minute", "variation"),
             location_code(el, "variation"))
            for el in els
        ]
        df = spark.createDataFrame(rows, "element string, want_ch string, want_loc string")
        out = df.select(
            "want_ch", "want_loc",
            channel_code_col(F.col("element"), "minute", "variation").alias("got_ch"),
            location_code_col(F.col("element"), "variation").alias("got_loc"),
        )
        bad = out.where(
            (F.col("got_ch") != F.col("want_ch"))
            | (F.col("got_loc") != F.col("want_loc"))
        ).collect()
        assert not bad, bad

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame([("H",), ("E-E",)], "element string")
        plan = (
            df.select(channel_code_col(F.col("element"), "minute", "variation"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "BatchEvalPython" not in plan
