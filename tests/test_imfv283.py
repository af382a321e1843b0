"""IMFV283 GOES decoder: synthetic messages built by inverting the format.

The encoder here packs a GOES block the way the reference's parser
unpacks it (IMFV283Parser.py:341-389 ness groups, :220-263 header bits,
:183-196 sample bytes) — golden values are hand-computed from the cited
format arithmetic, not produced by running the reference.
"""

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.sources.imfv283 import (
    BIAS,
    DEAD_VALUE,
    SHIFT,
    decode_message,
    read_imfv283,
)

US = 1_000_000
PLATFORMS = {
    "75C2D538": ("BOU", {"swap_hdr": False, "swap_data": True}),
    "AAAA0001": ("OTT", {"swap_hdr": True, "swap_data": False}),
}


def make_goes_block(day, minute, offsets, orient, scale_bits, samples):
    """126-byte GOES block: bit-packed day/minute, per-channel offsets,
    orient+scale byte, 12x4 big-endian u16 samples at byte 30."""
    b = bytearray(126)
    b[0] = day & 0xFF
    b[1] = ((day >> 8) & 0xF) | ((minute & 0xF) << 4)
    b[2] = (minute >> 4) & 0xFF
    b[3:7] = bytes(offsets)
    b[7] = (orient << 6) | scale_bits
    i = 30
    for row in samples:  # 12 rows of 4 channel values
        for v in row:
            b[i] = (v >> 8) & 0xFF
            b[i + 1] = v & 0xFF
            i += 2
    return bytes(b)


def ness_encode(goes_block, swap_hdr, swap_data):
    """Inverse of _unpack_ness: 126 GOES bytes -> 63 three-byte groups."""
    out = bytearray()
    for cnt in range(63):
        g1, g2 = goes_block[2 * cnt], goes_block[2 * cnt + 1]
        if (swap_hdr and cnt <= 11) or (swap_data and cnt > 11):
            g1, g2 = g2, g1
        # 0x40 high bit makes the bytes printable (as in real DCS files,
        # keeping \n framing safe); the decoder masks it off
        byte3 = (g1 & 0x3F) | 0x40
        byte2 = ((g1 >> 6) & 0x3) | ((g2 & 0xF) << 2) | 0x40
        byte1 = ((g2 >> 4) & 0xF) | 0x40
        out += bytes([byte1, byte2, byte3])
    return bytes(out)


def make_message(
    platform="75C2D538",
    transmission="20001002000",  # 2020 day 001 00:20:00 (YYDDDHHMMSS)
    long_fmt=False,
    **block_kw,
):
    entry = PLATFORMS[platform][1]
    block = make_goes_block(**block_kw)
    ness = ness_encode(block, entry["swap_hdr"], entry["swap_data"])
    data_len = 191 if long_fmt else 190
    header = (
        platform.encode()
        + transmission.encode()
        + b" " * 13
        + b"%05d" % data_len
    )
    assert len(header) == 37
    flag = b"\x00" if long_fmt else b""
    return header + flag + ness


BASE_KW = dict(
    day=1,
    minute=0,
    offsets=[128, 129, 130, 131],
    orient=1,  # HEZF
    scale_bits=0,
    samples=[[1000 + i, 2000 + i, 3000 + i, 4000 + i] for i in range(12)],
)
T0 = 1577836800 * US  # 2020-01-01T00:00:00Z (day 1 minute 0 of 2020)


def nt(raw, offset, scale=1):
    return (raw * scale + offset * BIAS - SHIFT) / 10.0


class TestDecodeMessage:
    def test_values_times_channels(self):
        rows = decode_message(make_message(**BASE_KW), PLATFORMS)
        assert len(rows) == 48  # 12 samples x 4 channels
        got = {(r[1], r[2]): r[3] for r in rows}
        for i in range(12):
            np.testing.assert_allclose(
                got[("H", T0 + i * 60 * US)], nt(1000 + i, 128)
            )
            np.testing.assert_allclose(
                got[("Z", T0 + i * 60 * US)], nt(3000 + i, 130)
            )
        assert all(r[0] == "BOU" for r in rows)
        assert all(r[5] is False for r in rows)

    def test_scale_bits_and_orientation(self):
        kw = dict(BASE_KW, orient=0, scale_bits=0x20 | 0x4)  # X x2, F x2
        rows = decode_message(make_message(**kw), PLATFORMS)
        got = {(r[1], r[2]): r[3] for r in rows}
        np.testing.assert_allclose(got[("X", T0)], nt(1000, 128, scale=2))
        np.testing.assert_allclose(got[("Y", T0)], nt(2000, 129))
        np.testing.assert_allclose(got[("F", T0)], nt(4000, 131, scale=2))

    def test_dead_value_null(self):
        samples = [list(r) for r in BASE_KW["samples"]]
        samples[3][1] = DEAD_VALUE
        rows = decode_message(
            make_message(**dict(BASE_KW, samples=samples)), PLATFORMS
        )
        got = {(r[1], r[2]): r[3] for r in rows}
        assert got[("E", T0 + 3 * 60 * US)] is None
        assert got[("E", T0 + 4 * 60 * US)] is not None

    def test_header_swap_observatory(self):
        rows = decode_message(
            make_message(platform="AAAA0001", **BASE_KW), PLATFORMS
        )
        got = {(r[1], r[2]): r[3] for r in rows}
        assert rows[0][0] == "OTT"
        np.testing.assert_allclose(got[("H", T0)], nt(1000, 128))

    def test_long_format_flag_byte(self):
        rows = decode_message(
            make_message(long_fmt=True, **BASE_KW), PLATFORMS
        )
        assert len(rows) == 48
        got = {(r[1], r[2]): r[3] for r in rows}
        np.testing.assert_allclose(got[("F", T0)], nt(4000, 131))

    def test_prior_year_fold(self):
        # transmitted 2020-01-01 00:05, data day 365 minute 1435 of 2019
        kw = dict(BASE_KW, day=365, minute=1435)
        rows = decode_message(
            make_message(transmission="20001000500", **kw), PLATFORMS
        )
        t_data = (1577836800 - 5 * 60) * US  # 2019-12-31 23:55
        assert rows[0][2] == t_data

    def test_gps_week_rollover_correction(self):
        # data stamped 228 days behind its transmission (the 1999-08-22
        # GPS reset signature): correction applies and flags the rows
        kw = dict(BASE_KW, day=138, minute=0)  # 2020 day 138 + 228 = day 366
        rows = decode_message(
            make_message(transmission="20366001000", **kw), PLATFORMS
        )
        assert rows, "correction should recover the packet"
        assert all(r[5] is True for r in rows)
        # corrected to 2020-12-31 00:00 (day 366)
        assert rows[0][2] == (1577836800 + 365 * 86400) * US

    def test_stale_data_dropped(self):
        # delay in (1440, 1800) s: estimate accepts it uncorrected, the
        # post-process "over twice as old" gate then drops the packet
        # (IMFV283Parser.py:314-316; larger delays instead take the +228
        # correction branch, whose negative-delay acceptance is mirrored)
        kw = dict(BASE_KW, day=1, minute=0)
        rows = decode_message(
            make_message(transmission="20001002500", **kw), PLATFORMS
        )
        assert rows == []

    def test_malformed_lines_skipped(self):
        assert decode_message(b"short", PLATFORMS) == []
        assert decode_message(b"X" * 200, PLATFORMS) == []
        bad_len = make_message(**BASE_KW)[:32] + b"00100" + b"Y" * 189
        assert decode_message(bad_len, PLATFORMS) == []
        truncated = make_message(**BASE_KW)[:100]
        assert decode_message(truncated, PLATFORMS) == []


class TestReadImfv283:
    def test_spark_scan(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.sources import imfv283 as mod

        # two messages in one file, one in a second file
        m1 = make_message(**BASE_KW)
        kw2 = dict(BASE_KW, minute=12, samples=[[7] * 4] * 12)
        m2 = make_message(**kw2)
        (tmp_path / "a.dcp").write_bytes(m1 + b"\n" + m2 + b"\n")
        (tmp_path / "b.dcp").write_bytes(
            make_message(platform="AAAA0001", **BASE_KW)
        )
        obs = {
            "BOU": dict(mod.OBSERVATORIES["BOU"]),
            "OTT": {"platform": "AAAA0001", "swap_hdr": True,
                    "swap_data": False},
        }
        df = read_imfv283(spark, str(tmp_path), observatories=obs)
        rows = df.collect()
        assert len(rows) == 144
        stations = {r.station for r in rows}
        assert stations == {"BOU", "OTT"}
        h = {
            (r.station, r.t_us): r.value
            for r in rows
            if r.channel == "H"
        }
        np.testing.assert_allclose(h[("BOU", T0)], nt(1000, 128))
        np.testing.assert_allclose(
            h[("BOU", T0 + 12 * 60 * US)], nt(7, 128)
        )
        np.testing.assert_allclose(h[("OTT", T0)], nt(1000, 128))


# ---------------------------------------------------------------------------
# Reference fixture messages (test/imfv283_test/IMFV283Parser_test.py:10-27)
# — real DCP bytes from Canadian XYZF stations, exercising the
# header-region byte swap and the non-UTF8 payload path (\x7f bytes).
# ---------------------------------------------------------------------------
VIC_MSG = (
    b"75C2A3A814023012741G43-1NN027EUP00191`A^P@RVxZ}|"
    b"D@@B_BEM@@@@@@@@@@@@@@@@@@@@@@@@@@@E|BxtTADVD@\\E\\BxxT@tVCh\\E"
    b"lByDT@xVCp\\EdBy@T@tVCh\\EhByPT@xVCl\\EPBy@T@tVCd\\EdBxlTA@VCp\\Eh"
    b"BxTTA@VCp\\EdBGxTA@VCl\\EPBG`T@xVC\\\\DtBGHT@lVCD\\DPBG@T@XVBh\\"
)
STJ_MSG = (
    b"75C1E7AC20259002641G44-3NN027EXE00191`@OA@BWGbx{"
    b"x@@Bh\x7fD`@@@@@@@@@@@@@@@@@@@@@@@@@@@FDODdV}X_yxAGHODlV~L_z|AG"
    b"tODPV\x7f@_{pAxLOC`V\x7fp_|pAxPOBdV@D`}dAxdOAxVAX`~lAx`O@|VAp`"
    b"\x7fXAyDO@tVCd`@\\Bx`O\x7fXUC|`APByDO\x7fdUEd`AtBx`O~\\UEp`BXBGtO}PUFP`CHB "
)


class TestReferenceFixtures:
    """Golden expectations from the reference's own parser tests."""

    def _platforms(self):
        from usgs_geomag_algorithms_spark.sources import imfv283 as mod

        return {
            v["platform"]: (k, v) for k, v in mod.OBSERVATORIES.items()
        }

    def test_vic_message(self):
        """Expected GOES header: day 23, minute 73 (01:13), orient 0
        (XYZF), scales x1 — transmission 2014 doy 023 01:27:41."""
        rows = decode_message(VIC_MSG, self._platforms())
        assert len(rows) == 48
        assert {r[0] for r in rows} == {"VIC"}
        assert {r[1] for r in rows} == {"X", "Y", "Z", "F"}
        t0 = np.datetime64("2014-01-23T01:13:00").astype("int64") * US
        ts = sorted({r[2] for r in rows})
        assert ts[0] == t0 and ts[-1] == t0 + 11 * 60 * US
        assert all(r[5] is False for r in rows)

    def test_stj_messages(self):
        """First STJ packet: day 259 minute 12 of 2020 (00:12), XYZF."""
        rows = decode_message(STJ_MSG, self._platforms())
        assert len(rows) == 48
        assert {r[0] for r in rows} == {"STJ"}
        assert {r[1] for r in rows} == {"X", "Y", "Z", "F"}
        t0 = np.datetime64("2020-09-15T00:12:00").astype("int64") * US
        assert min(r[2] for r in rows) == t0

    def test_estimate_data_time_vectors(self):
        """The two reference time-estimation vectors (normal BOU packet
        and BLC 1999-rollover packet)."""
        from usgs_geomag_algorithms_spark.sources.imfv283 import (
            _estimate_data_time,
        )
        from datetime import datetime

        data, transmit, corrected = _estimate_data_time(
            "17274013121", 274, 72
        )
        assert data == datetime(2017, 10, 1, 1, 12)
        assert transmit == datetime(2017, 10, 1, 1, 31, 21)
        assert corrected is False

        data, transmit, corrected = _estimate_data_time(
            "17274013241", 46, 78
        )
        assert data == datetime(2017, 10, 1, 1, 18)
        assert transmit == datetime(2017, 10, 1, 1, 32, 41)
        assert corrected is True
