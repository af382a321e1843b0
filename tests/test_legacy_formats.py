"""Legacy format shims: PCDCP, IMFV122, VBF, TEMP, BinLog.

Golden lines are hand-computed from the reference's format strings
(PCDCPWriter.py:160-213, VBFWriter.py:119-158, TEMPWriter.py:116-141,
BinLogWriter.py:141-216) — not produced by running the reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.sources.legacy import (
    binlog_changes,
    read_imfv122,
    read_pcdcp,
    write_binlog,
    write_pcdcp,
    write_temp,
    write_vbf,
)
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US  # 2020-01-01 00:00:00Z
MIN = 60 * US


def _read_lines(path):
    import glob

    (f,) = glob.glob(str(path) + "/part-*")
    return open(f).read().splitlines()


class TestPcdcpWrite:
    def test_minute_header_and_lines(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [
                (T0, 20800.12, -70.5, 47000.0, None),
                (T0 + MIN, None, -70.0, 47001.25, 52000.07),
            ],
            schema="t_us long, H double, E double, Z double, F double",
        )
        path = str(tmp_path / "pcdcp_min")
        write_pcdcp(wide, path, station="BOU")
        lines = _read_lines(path)
        assert (
            lines[0]
            == "BOU  2020  001  01-Jan-20  HEZF  0.01nT  File Version 2.00"
        )
        # minute-of-day %04d, values int(round(v*100)) %8d, dead 9999999
        assert lines[1] == "0000  2080012    -7050  4700000  9999999"
        assert lines[2] == "0001  9999999    -7000  4700125  5200007"

    def test_second_cadence_widths(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [(T0 + 90 * US, 20800.1234, None, 1.0, 2.0)],
            schema="t_us long, H double, E double, Z double, F double",
        )
        path = str(tmp_path / "pcdcp_sec")
        write_pcdcp(wide, path, station="BOU", delta_s=1)
        lines = _read_lines(path)
        assert "0.001nT" in lines[0]
        # second-of-day %05d, x1000 at %9d, dead 99999990
        assert lines[1] == "00090  20800123  99999990      1000      2000"

    def test_d_channel_radians_to_minutes(self, spark, tmp_path):
        d_rad = 0.02
        wide = spark.createDataFrame(
            [(T0, d_rad)], schema="t_us long, D double"
        )
        path = str(tmp_path / "pcdcp_d")
        write_pcdcp(wide, path, station="BOU", channels=("D",))
        minutes = d_rad * 180 / math.pi * 60
        expected = int(np.rint(minutes * 100))
        assert _read_lines(path)[1] == "0000 %8d" % expected

    def test_temperatures_header(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [(T0, 21.57, 22.0)], schema="t_us long, T1 double, T2 double"
        )
        path = str(tmp_path / "pcdcp_t")
        write_pcdcp(
            wide, path, station="BOU", channels=("T1", "T2"),
            temperatures=True,
        )
        lines = _read_lines(path)
        assert (
            lines[0]
            == "BOU  2020  001  01-Jan-20  T1  T2  Deg-C*10  File Version 1.00"
        )
        # x10 multiplier, half-even rounding: 21.57*10 -> 216  (215.7 rounds
        # to 216), 22.0 -> 220
        assert lines[1] == "0000      216      220"


class TestPcdcpRead:
    def test_roundtrip_minute(self, spark, tmp_path):
        rows = [
            (T0 + i * MIN, 20800.0 + i * 0.01, None if i == 2 else -70.25)
            for i in range(4)
        ]
        wide = spark.createDataFrame(rows, schema="t_us long, H double, E double")
        path = str(tmp_path / "rt")
        write_pcdcp(wide, path, station="XYZ", channels=("H", "E"))
        back = read_pcdcp(spark, path, channels=("H", "E"))
        got = {r.t_us: r for r in back.collect()}
        assert len(got) == 4
        for t, h, e in rows:
            assert got[t].station == "XYZ"
            np.testing.assert_almost_equal(got[t].H, h, decimal=2)
            if e is None:
                assert got[t].E is None
            else:
                np.testing.assert_almost_equal(got[t].E, e, decimal=2)

    def test_roundtrip_second_resolution(self, spark, tmp_path):
        rows = [(T0 + i * US, 123.456 + i) for i in range(3)]
        wide = spark.createDataFrame(rows, schema="t_us long, H double")
        path = str(tmp_path / "rt_sec")
        write_pcdcp(wide, path, channels=("H",), delta_s=1)
        back = read_pcdcp(spark, path, channels=("H",))
        got = {r.t_us: r.H for r in back.collect()}
        for t, v in rows:
            np.testing.assert_almost_equal(got[t], v, decimal=3)

    def test_directory_per_file_headers(self, spark, tmp_path):
        """Two files at different resolutions in one scan: the per-file
        broadcast header join must keep each file's multiplier."""
        a = spark.createDataFrame(
            [(T0, 11.11)], schema="t_us long, H double"
        )
        b = spark.createDataFrame(
            [(T0 + 86400 * US, 22.222)], schema="t_us long, H double"
        )
        root = tmp_path / "many"
        write_pcdcp(a, str(root / "f1"), channels=("H",))
        write_pcdcp(b, str(root / "f2"), channels=("H",), delta_s=1)
        back = read_pcdcp(spark, str(root) + "/*", channels=("H",))
        got = sorted((r.t_us, r.H) for r in back.collect())
        np.testing.assert_almost_equal(got[0][1], 11.11, decimal=2)
        np.testing.assert_almost_equal(got[1][1], 22.222, decimal=3)
        assert got[1][0] == T0 + 86400 * US


IMF_SAMPLE = """BOU MAY0905 129 00 HDZF R GOL 0342511335 5527 RRRRRRRRRRRRRRRR
 208001  -7005 470001 520001  208002  -7010 470002 999999
 208003  -7015 470003 520003  888888  -7020 470004 520004
BOU MAY0905 129 02 HDZF R GOL 0342511335 5527 RRRRRRRRRRRRRRRR
 208011  -7105 470011 520011  208012  -7110 470012 520012
"""


class TestImfv122:
    def test_parse_blocks(self, spark, tmp_path):
        p = tmp_path / "imf"
        p.mkdir()
        (p / "bou.imf").write_text(IMF_SAMPLE)
        df = read_imfv122(spark, str(p))
        rows = df.collect()
        # 3 data lines x 2 samples x 4 channels
        assert len(rows) == 24
        got = {(r.t_us, r.channel): r.value for r in rows}
        base = 1115596800 * US  # 2005-05-09 00:00:00Z (year 2005, doy 129)
        # century fold: "05" -> 1905 < 1971 -> 2005
        np.testing.assert_almost_equal(got[(base, "H")], 20800.1)
        # D scales /100, others /10
        np.testing.assert_almost_equal(got[(base, "D")], -70.05)
        assert got[(base + MIN, "F")] is None
        # sentinel 888888 -> NULL
        assert got[(base + 3 * MIN, "H")] is None
        # second block: start "02" = hour 2
        b2 = base + 2 * 3600 * US
        np.testing.assert_almost_equal(got[(b2, "H")], 20801.1)
        np.testing.assert_almost_equal(got[(b2 + MIN, "Z")], 47001.2)
        # header metadata
        r0 = rows[0]
        assert r0.declination_base == 5527
        assert r0.gin == "GOL"
        np.testing.assert_almost_equal(r0.geodetic_latitude, 34.2, decimal=2)
        np.testing.assert_almost_equal(
            r0.geodetic_longitude, 51133.5, decimal=1
        )

    def test_minute_of_day_start(self, spark, tmp_path):
        sample = (
            "ABC MAY0905 129 0725 HDZF R GOL 0342511335 5527 R\n"
            " 1 2 3 4 5 6 7 8\n"
        )
        p = tmp_path / "imf2"
        p.mkdir()
        (p / "abc.imf").write_text(sample)
        df = read_imfv122(spark, str(p))
        ts = sorted({r.t_us for r in df.collect()})
        base = 1115596800 * US + (12 * 3600 + 5 * 60) * US
        assert ts == [base, base + MIN]


class TestVbfTemp:
    def test_vbf_lines(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [
                (T0 + 65 * US, 1234.5, 17.9, None, 3.0, -250.0, 999.0),
            ],
            schema=(
                "t_us long, Hvolt double, Hbin double, Evolt double,"
                " Ebin double, Zvolt double, Zbin double"
            ),
        )
        path = str(tmp_path / "vbf")
        write_vbf(wide, path, station="BOU")
        lines = _read_lines(path)
        assert (
            lines[0]
            == "BOU  2020  001  01-Jan-20  "
            "Hvolt Hbin Evolt Ebin Zvolt Zbin Version 1.0"
        )
        # volts /1000 %10.6f, bins truncate-to-int %4d, dead 99.999999/999
        assert lines[1] == (
            "00065   1.234500   17  99.999999    3  -0.250000  999"
        )

    def test_temp_lines(self, spark, tmp_path):
        wide = spark.createDataFrame(
            [(T0 + 5 * MIN, 21.57, None, -3.24, 0.0, 12.06)],
            schema=(
                "t_us long, T1 double, T2 double, T3 double,"
                " T4 double, V1 double"
            ),
        )
        path = str(tmp_path / "temp")
        write_temp(wide, path, station="BOU")
        lines = _read_lines(path)
        assert (
            lines[0]
            == "BOU  2020  001  01-Jan-20  "
            "T1 T2 T3 T4 V1 Deg-C*10/volts*10  File Version 1.00"
        )
        # x10 half-even ints %5d, dead 9999; -3.24*10 -> -32 (rint -32.4)
        assert lines[1] == "0005   216  9999   -32     0   121"


class TestBinlog:
    def _wide(self, spark, rows):
        return spark.createDataFrame(
            rows,
            schema=(
                "t_us long, Hvolt double, Hbin double, Evolt double,"
                " Ebin double, Zvolt double, Zbin double"
            ),
        )

    def test_changes_and_gap_reset(self, spark):
        rows = [
            (T0, 1000.0, 5.0, 1.0, 1.0, 1.0, 1.0),
            (T0 + MIN, 1100.0, 6.0, 1.0, 1.0, 1.0, 1.0),  # H bin 5->6
            (T0 + 2 * MIN, 1200.0, None, 1.0, 1.0, 1.0, 1.0),  # H gap
            (T0 + 3 * MIN, 1300.0, 7.0, 1.0, 1.0, 1.0, 1.0),  # after gap: no emit
            (T0 + 4 * MIN, 1400.0, 8.0, 1.0, 2.0, 1.0, 1.0),  # H 7->8, E 1->2
        ]
        wide = self._wide(spark, rows).withColumn("station", F.lit("BOU"))
        ch = binlog_changes(wide).collect()
        key = sorted((r.component, r.t_us, r.prev_bin, r.bin) for r in ch)
        assert key == [
            ("E", T0 + 4 * MIN, 1, 2),
            ("H", T0 + MIN, 5, 6),
            ("H", T0 + 4 * MIN, 7, 8),
        ]
        h = {r.t_us: r for r in ch if r.component == "H"}
        np.testing.assert_almost_equal(h[T0 + MIN].prev_volt, 1.0)
        np.testing.assert_almost_equal(h[T0 + MIN].volt, 1.1)

    def test_report_rendering(self, spark, tmp_path):
        rows = [
            (T0, 1000.0, 5.0, 1.0, 1.0, 1.0, 1.0),
            (T0 + MIN, 1100.0, 6.0, 2000.0, 2.0, 1.0, 1.0),
        ]
        # E: bin 1->2 at minute 1 too
        rows[0] = (T0, 1000.0, 5.0, 1500.0, 1.0, 1.0, 1.0)
        wide = self._wide(spark, rows)
        path = str(tmp_path / "binlog")
        write_binlog(wide, path, station="BOU")
        lines = _read_lines(path)
        assert lines[0] == (
            "Bin Change Report: BOU  Start Day: 01-Jan-20 End Day: 01-Jan-20"
        )
        assert lines[1] == ""
        assert lines[2] == (
            " C  Date       Time     DaySec     Bin change    Voltage change"
        )
        assert lines[3] == (
            "(H) 2020-01-01 00:01:00 (00060)     5 to    6"
            "    1.000000 to   1.100000"
        )
        assert lines[4] == ""
        assert lines[5] == (
            "(E) 2020-01-01 00:01:00 (00060)     1 to    2"
            "    1.500000 to   2.000000"
        )
        # Z section is empty but still separated
        assert lines[6] == ""

    def test_no_changes_marker(self, spark, tmp_path):
        rows = [(T0, 1000.0, 5.0, 1.0, 1.0, 1.0, 1.0)]
        wide = self._wide(spark, rows)
        path = str(tmp_path / "binlog0")
        write_binlog(wide, path, station="BOU")
        lines = _read_lines(path)
        assert lines[2] == "*** No Bin Changes Found ***"
