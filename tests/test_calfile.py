"""CAL calibration-file writer (CalFileFactory / make_cal parity): the
reference's documented example data, rendered through the reference
CODE's exact line format.

Note: the CalFileFactory docstring example shows one decimal place, but
the code itself writes ``c{baseline:9.2f}{absolute:9.2f}``
(CalFileFactory.py:45-47) — the docstring predates the format. Parity
here targets the code: the expected text is built with the reference's
own f-string, then compared byte-for-byte against the Spark rendering.
"""

from datetime import datetime, timezone

from usgs_geomag_algorithms_spark.sources.calfile import (
    cal_lines,
    format_cal,
    write_cal_file,
)

# (date, element) -> [(start HHMM, end HHMM, baseline, absolute)], the
# values of the CalFileFactory.py:62-100 example (D already in minutes)
EXAMPLE = [
    ((2015, 3, 30), "H", [(2140, 2143, 175.0, 12531.3),
                          (2152, 2156, 174.9, 12533.3),
                          (2205, 2210, 174.8, 12533.1),
                          (2220, 2223, 174.9, 12520.7)]),
    ((2015, 3, 30), "D", [(2133, 2137, 1128.3, 1118.5),
                          (2145, 2149, 1128.4, 1116.4),
                          (2159, 2203, 1128.3, 1113.1),
                          (2212, 2216, 1128.4, 1113.5)]),
    ((2015, 3, 30), "Z", [(2140, 2143, -52.9, 55403.4),
                          (2152, 2156, -52.8, 55403.8),
                          (2205, 2210, -52.8, 55404.0),
                          (2220, 2223, -52.8, 55410.5)]),
    ((2015, 7, 27), "H", [(2146, 2151, 173.5, 12542.5),
                          (2204, 2210, 173.8, 12542.5),
                          (2225, 2229, 173.8, 12547.2),
                          (2240, 2246, 173.6, 12538.7)]),
    ((2015, 7, 27), "D", [(2137, 2142, 1127.8, 1109.2),
                          (2154, 2158, 1128.3, 1106.3),
                          (2213, 2220, 1128.0, 1106.3),
                          (2232, 2237, 1128.3, 1104.7)]),
    ((2015, 7, 27), "Z", [(2146, 2151, -53.9, 55382.7),
                          (2204, 2210, -54.0, 55382.5),
                          (2225, 2229, -54.1, 55383.7),
                          (2240, 2246, -54.1, 55389.0)]),
]


def us(ymd, hhmm):
    y, mo, d = ymd
    t = datetime(y, mo, d, hhmm // 100, hhmm % 100, tzinfo=timezone.utc)
    return int(t.timestamp() * 1_000_000)


def expected_text():
    # the reference's own rendering (CalFileFactory._format_absolutes)
    out = []
    for ymd, el, lines in EXAMPLE:
        out.append(f"--{ymd[0]} {ymd[1]:02d} {ymd[2]:02d} ({el})\n")
        for s, e, base, absv in lines:
            out.append(f"{s:04d}-{e:04d} c{base:9.2f}{absv:9.2f}\n")
    out.append("\n")
    return "".join(out)


def example_rows():
    rows = []
    for ymd, el, lines in EXAMPLE:
        for s, e, base, absv in lines:
            if el == "D":  # file is in minutes; the model stores degrees
                base, absv = base / 60, absv / 60
            rows.append((el, absv, base, us(ymd, s), us(ymd, e)))
    return rows


SCHEMA = (
    "element string, absolute double, baseline double, "
    "start_us long, end_us long"
)


class TestCalFile:
    def test_reference_example_byte_identical(self, spark):
        rows = example_rows()
        rows.reverse()  # input order must not matter
        df = spark.createDataFrame(rows, schema=SCHEMA)
        assert format_cal(df) == expected_text()

    def test_invalid_and_foreign_elements_dropped(self, spark):
        rows = example_rows() + [
            ("H", None, 175.0, us((2015, 3, 30), 900), us((2015, 3, 30), 905)),
            ("F", 52000.0, 1.0, us((2015, 3, 30), 900), us((2015, 3, 30), 905)),
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        assert format_cal(df) == expected_text()

    def test_half_even_tie_rounding_matches_python(self, spark):
        # 0.125 -> 0.12 under Python %.2f (half-even); Java %.2f alone
        # would print 0.13 — bround() keeps the reference behavior
        rows = [
            ("H", 0.125, 2.135, us((2015, 1, 2), 1000), us((2015, 1, 2), 1005)),
            ("Z", -0.125, -2.135, us((2015, 1, 2), 1010), us((2015, 1, 2), 1015)),
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        lines = format_cal(df).splitlines()
        assert lines[1] == f"1000-1005 c{2.135:9.2f}{0.125:9.2f}"
        assert lines[3] == f"1010-1015 c{-2.135:9.2f}{-0.125:9.2f}"

    def test_negative_zero_keeps_sign(self, spark):
        # a value in (-0.005, 0) snaps to zero cents but Python %9.2f
        # still renders the sign: '    -0.00' (ADVICE r3)
        rows = [
            ("H", -0.001, 0.004, us((2015, 1, 2), 1000), us((2015, 1, 2), 1005)),
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        lines = format_cal(df).splitlines()
        assert lines[1] == f"1000-1005 c{0.004:9.2f}{-0.001:9.2f}"
        assert lines[1] == "1000-1005 c     0.00    -0.00"

    def test_write_file(self, spark, tmp_path):
        df = spark.createDataFrame(example_rows(), schema=SCHEMA)
        p = tmp_path / "sub" / "BOU2015WebAbsMaster.cal"
        write_cal_file(df, str(p))
        assert p.read_bytes() == expected_text().encode()

    def test_lines_are_a_dataframe(self, spark):
        df = spark.createDataFrame(example_rows(), schema=SCHEMA)
        out = cal_lines(df)
        assert out.columns == ["date", "elem_idx", "rank", "t_key", "line"]
        assert out.count() == 24 + 6


    def test_pre_1970_sessions_keep_headers_first(self, spark):
        rows = [
            ("H", 12000.0, 100.0, us((1955, 3, 30), 1000), us((1955, 3, 30), 1005)),
            ("H", 12001.0, 101.0, us((1955, 3, 30), 1010), us((1955, 3, 30), 1015)),
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA)
        text = format_cal(df).splitlines()
        assert text[0] == "--1955 03 30 (H)"
        assert text[1].startswith("1000-1005")
