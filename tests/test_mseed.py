"""miniSEED codec: Steim-1/2 + raw encodings, file scan, per-series sink.

Golden vectors come from this repo's own inverse encoder (the same
strategy as test_imfv283): records are assembled field-by-field from the
published SEED 2.4 layout, so a decode bug cannot cancel against an
encode bug without also mis-reading the spec twice in mirrored ways —
and one record below is additionally checked byte-by-byte against
hand-computed header fields.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from usgs_geomag_algorithms_spark.sources.mseed import (
    ENC_FLOAT32,
    ENC_FLOAT64,
    ENC_INT16,
    ENC_INT32,
    ENC_STEIM1,
    ENC_STEIM2,
    decode_payloads,
    decode_records,
    encode_mseed,
    read_mseed,
    write_mseed,
)

US = 1_000_000
T0 = 1_600_000_000 * US  # 2020-09-13T12:26:40Z


def _walk(vals):
    return np.asarray(vals, np.int64)


class TestHeaderGolden:
    def test_fixed_header_fields_hand_computed(self):
        buf = encode_mseed(
            [10, 12, 11], T0, 1, network="IU", station="ANMO",
            location="00", channel="BHZ", quality="Q",
        )
        assert len(buf) == 512
        assert buf[0:6] == b"000001"
        assert buf[6:7] == b"Q"
        assert buf[8:13] == b"ANMO "
        assert buf[13:15] == b"00"
        assert buf[15:18] == b"BHZ"
        assert buf[18:20] == b"IU"
        year, doy, hh, mm, ss, _, fract = struct.unpack(">HHBBBBH", buf[20:30])
        # 2020-09-13 is day-of-year 257 (leap year)
        assert (year, doy, hh, mm, ss, fract) == (2020, 257, 12, 26, 40, 0)
        nsamp, rf, rm = struct.unpack(">Hhh", buf[30:36])
        assert (nsamp, rf, rm) == (3, 1, 1)
        data_off, blk_off = struct.unpack(">HH", buf[44:48])
        assert (data_off, blk_off) == (64, 48)
        btype, bnext, enc, order, power, _ = struct.unpack(">HHBBBB", buf[48:56])
        assert (btype, bnext, enc, order, power) == (1000, 0, ENC_STEIM2, 1, 9)
        # Steim frame 0: X0/Xn in words 1-2
        w = np.frombuffer(buf[64:128], dtype=">u4")
        assert int(w[1]) == 10 and int(w[2]) == 11

    def test_fractional_start(self):
        buf = encode_mseed([1], T0 + 123_400, 1)
        fract = struct.unpack(">H", buf[28:30])[0]
        assert fract == 1234  # 0.0001 s units


class TestSteimRoundTrip:
    @pytest.mark.parametrize("enc", [ENC_STEIM1, ENC_STEIM2])
    def test_geomag_like_walk(self, enc):
        rng = np.random.default_rng(7)
        x = 20000 + np.cumsum(rng.integers(-50, 51, 3000))
        x[500] += 100_000  # spike forces a wide class mid-stream
        recs = decode_records(encode_mseed(x, T0, 1, encoding=enc))
        got = np.concatenate([r["value"] for r in recs])
        ts = np.concatenate([r["t_us"] for r in recs])
        assert np.array_equal(got, x.astype(float))
        assert np.array_equal(ts, T0 + np.arange(len(x)) * US)
        # Steim-2 packs this walk denser than one record per 100 samples
        assert len(recs) <= 10

    @pytest.mark.parametrize("enc", [ENC_STEIM1, ENC_STEIM2])
    def test_every_width_class(self, enc):
        rng = np.random.default_rng(1)
        widths = [3, 7, 15, 30, 60, 300, 500, 5000, 2**14, 2**20, 2**28]
        vals, cur = [0], 0
        for _ in range(399):
            w = widths[int(rng.integers(0, len(widths)))]
            cur += int(rng.integers(-w, w + 1))
            vals.append(cur)
        x = _walk(vals)
        recs = decode_records(encode_mseed(x, T0, 10, encoding=enc))
        got = np.concatenate([r["value"] for r in recs]).astype(np.int64)
        assert np.array_equal(got, x)

    def test_constant_series_packs_densest(self):
        x = np.full(5000, 1234, np.int64)
        buf = encode_mseed(x, T0, 1, encoding=ENC_STEIM2)
        recs = decode_records(buf)
        got = np.concatenate([r["value"] for r in recs])
        assert np.array_equal(got, x.astype(float))
        # 7 diffs per word, ~97 data words per 512-byte record
        assert len(buf) // 512 <= 9

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**28), max_value=2**28 - 1),
            min_size=1,
            max_size=300,
        ),
        st.sampled_from([ENC_STEIM1, ENC_STEIM2]),
    )
    def test_property_round_trip(self, diffs, enc):
        x = np.cumsum(np.asarray(diffs, np.int64))
        np.clip(x, -(2**30), 2**30 - 1, out=x)
        recs = decode_records(encode_mseed(x, T0, 1, encoding=enc))
        got = np.concatenate([r["value"] for r in recs]).astype(np.int64)
        assert np.array_equal(got, x)


class TestRawEncodings:
    @pytest.mark.parametrize(
        "enc,vals",
        [
            (ENC_INT16, [0, 1, -30000, 29999]),
            (ENC_INT32, [0, 2**30, -(2**30), 7]),
            (ENC_FLOAT32, [0.5, -1.25, 1024.0]),
            (ENC_FLOAT64, [0.1, -2.7182818284, 1e12]),
        ],
    )
    def test_round_trip(self, enc, vals):
        recs = decode_records(encode_mseed(vals, T0, 1, encoding=enc))
        got = np.concatenate([r["value"] for r in recs])
        if enc == ENC_FLOAT32:
            assert np.allclose(got, vals, rtol=1e-7)
        else:
            assert np.array_equal(got, np.asarray(vals, np.float64))


class TestRatesAndRobustness:
    def test_slow_channel_exact_stamps(self):
        from fractions import Fraction

        x = _walk(range(100))
        recs = decode_records(encode_mseed(x, T0, Fraction(1, 60)))
        ts = np.concatenate([r["t_us"] for r in recs])
        assert np.array_equal(ts, T0 + np.arange(100) * 60 * US)
        assert recs[0]["rate_hz"] == pytest.approx(1 / 60)

    def test_rational_rate(self):
        from fractions import Fraction

        x = _walk(range(100))
        recs = decode_records(encode_mseed(x, T0, Fraction(5, 2)))
        ts = np.concatenate([r["t_us"] for r in recs])
        assert np.array_equal(ts, T0 + (np.arange(100) * US * 2) // 5)

    def test_garbage_records_skipped(self):
        good = encode_mseed(_walk(range(10)), T0, 1)
        recs = decode_records(b"\x01" * 512 + good + b"\xff" * 100)
        assert sum(len(r["value"]) for r in recs) == 10

    def test_corrupt_steim_payload_dropped(self):
        buf = bytearray(encode_mseed(_walk(range(100)), T0, 1))
        buf[70] ^= 0xFF  # flip a data byte: reverse-integration check fails
        assert decode_records(bytes(buf)) == []

    def test_time_correction_applied_when_flagged_unapplied(self):
        buf = bytearray(encode_mseed(_walk([5]), T0, 1))
        struct.pack_into(">i", buf, 40, 250)  # +0.025 s in 0.0001 s units
        buf[36] = 0x00  # activity: correction NOT yet applied
        rec = decode_records(bytes(buf))[0]
        assert rec["t_us"][0] == T0 + 25_000


class TestSpark:
    def test_read_mseed_files(self, spark, tmp_path):
        rng = np.random.default_rng(3)
        series = {
            ("NT", "BOU", "R0", "MVH"): 20000 + np.cumsum(rng.integers(-9, 10, 500)),
            ("NT", "BDT", "R0", "MVE"): -100 + np.cumsum(rng.integers(-9, 10, 700)),
        }
        for i, ((net, sta, loc, cha), x) in enumerate(series.items()):
            (tmp_path / f"f{i}.mseed").write_bytes(
                encode_mseed(x, T0, 1, network=net, station=sta, location=loc, channel=cha)
            )
        df = read_mseed(spark, str(tmp_path)).orderBy("station", "t_us")
        rows = df.collect()
        assert len(rows) == 1200
        by = {}
        for r in rows:
            by.setdefault((r.network, r.station, r.location, r.channel), []).append(
                (r.t_us, r.value)
            )
        for key, x in series.items():
            got = by[key]
            assert [v for _, v in got] == [float(v) for v in x]
            assert [t for t, _ in got] == [T0 + i * US for i in range(len(x))]

    def test_write_then_decode_payloads(self, spark):
        rng = np.random.default_rng(5)
        rows = []
        for sta in ("BOU", "BDT"):
            x = np.cumsum(rng.integers(-20, 21, 300))
            rows += [
                ("NT", sta, "R0", "MVH", T0 + i * US, float(v))
                for i, v in enumerate(x)
            ]
        sig = spark.createDataFrame(
            rows,
            "network string, station string, location string, channel string, t_us long, value double",
        )
        enc = write_mseed(sig, 1)
        assert enc.count() == 2
        back = decode_payloads(enc).orderBy("station", "t_us").collect()
        want = sorted(rows, key=lambda r: (r[1], r[4]))
        assert [(r.station, r.t_us, r.value) for r in back] == [
            (w[1], w[4], w[5]) for w in want
        ]
