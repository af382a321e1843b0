"""plans/prepfiles.py — magproc-prepfiles parity: month archive of CAL +
daily PCDCP second/minute/temperature files from the tier store."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.plans.prepfiles import (
    day_intervals,
    prepfiles,
)
from usgs_geomag_algorithms_spark.sources.legacy import read_pcdcp
from usgs_geomag_algorithms_spark.sources.store import TierStore

US = 1_000_000
MIN = 60 * US


def us(y, mo, d, h=0, m=0, s=0):
    return int(
        datetime(y, mo, d, h, m, s, tzinfo=timezone.utc).timestamp()
    ) * US


@pytest.fixture()
def store(spark, tmp_path):
    st = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
    rows = []
    # two days of minute data + a third empty day; a foreign obs to prune
    for d in (1, 2):
        for i in range(1440):
            for ch, v in (("H", 20000.0), ("E", -50.0), ("Z", 47000.0),
                          ("F", 52000.0)):
                rows.append(("BOU", ch, us(2020, 3, d) + i * MIN, v + i * 0.01))
    rows.append(("FRD", "H", us(2020, 3, 1), 1.0))
    st.write(
        spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        ),
        "minute",
    )
    # temperatures on day 1
    trows = [
        ("BOU", ch, us(2020, 3, 1) + i * MIN, 21.5)
        for i in range(1440)
        for ch in ("UK1", "UK2")
    ]
    st.write(
        spark.createDataFrame(
            trows, "url string, channel string, t_us long, value double"
        ),
        "temperature",
    )
    return st


class TestPrepfiles:
    def test_day_intervals(self):
        iv = day_intervals(2020, 2)  # leap February
        assert len(iv) == 29
        assert iv[0][0] == us(2020, 2, 1) and iv[-1][1] == us(2020, 3, 1)

    def test_month_archive(self, spark, store, tmp_path):
        absolutes = spark.createDataFrame(
            [
                # inside the CAL window [Feb, May)
                ("H", 12531.3, 175.0, us(2020, 2, 15, 21, 40),
                 us(2020, 2, 15, 21, 43)),
                # outside (too old)
                ("H", 12000.0, 170.0, us(2019, 12, 1), us(2019, 12, 1, 0, 5)),
            ],
            "element string, absolute double, baseline double, "
            "start_us long, end_us long",
        )
        out = tmp_path / "archive"
        written = prepfiles(
            store, "BOU", 2020, 3, str(out),
            absolutes=absolutes,
            temperature_tier="temperature",
            temperature_channels=("UK1", "UK2"),
        )
        assert written["BOU/BOU2020PCD.cal"] == 1  # window filtered
        assert written["BOU/BOU2020061.min"] == 1440  # Mar 1 = DOY 61
        assert written["BOU/BOU2020062.min"] == 1440
        # temperatures are hour-filtered (60->3600) and named '.hor'
        # like the reference magproc; 24 hourly rows for the full day
        assert written["BOU/BOU2020061.hor"] == 24
        assert not any(k.endswith(".deg") for k in written)
        # empty days and the absent second tier write nothing
        assert not any(k.endswith(".raw") for k in written)
        assert "BOU/BOU2020063.min" not in written
        cal = (out / "BOU" / "BOU2020PCD.cal").read_text()
        assert cal.startswith("--2020 02 15 (H)")
        assert "2140-2143 c   175.00 12531.30" in cal
        # hourly temperature lines: center stamp HH:29(:30) keys minute-of-
        # day h*60+29; mean of 60 x 21.5 -> 215 at the x10 Deg-C scale
        hor = "\n".join(
            p.read_text()
            for p in sorted((out / "BOU" / "BOU2020061.hor").glob("part-*"))
        )
        assert "0029      215      215" in hor
        assert "1409      215      215" in hor  # hour 23
        # the PCDCP file round-trips through the engine's own reader
        back = read_pcdcp(spark, str(out / "BOU" / "BOU2020061.min"))
        r = back.where(F.col("t_us") == us(2020, 3, 1)).first()
        assert r is not None and abs(r.H - 20000.0) < 0.005

    def test_no_absolutes_skips_cal(self, spark, store, tmp_path):
        written = prepfiles(store, "BOU", 2020, 3, str(tmp_path / "a"))
        assert not any(k.endswith(".cal") for k in written)
        assert written["BOU/BOU2020061.min"] == 1440
