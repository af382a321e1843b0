"""Sub-second (10 Hz) grid precision + skew balance of the rollup shuffle.

The reference guards a float-precision edge: a 10 Hz trace at 15:53:50.7
padded to [15:53:50.0, 15:53:56.9] must hold exactly 70 samples
(``test/TimeseriesUtility_test.py:465-492``). Integer-microsecond grids make
this exact by construction — asserted here end-to-end.
"""

import numpy as np
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.rollup import rollup_step
from usgs_geomag_algorithms_spark.operators.spine import grid_start_us, pad_to_spine
from usgs_geomag_algorithms_spark.tiers import STEPS, US

TENHZ = STEPS[0]


class TestTenHzPrecision:
    def test_pad_70_samples(self, spark):
        # trace starts 15:53:50.7; request [50.0, 56.9] at 0.1 s
        base = 1577836800 * US + (15 * 3600 + 53 * 60 + 50) * US
        t_start = base + 700_000
        rows = [
            ("u", "H", t_start + i * 100_000, float(i)) for i in range(40)
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        out = pad_to_spine(df, base, base + 6_900_000, 0.1)
        ts = sorted(r.t_us for r in out.collect())
        assert len(ts) == 70
        assert ts[0] == base and ts[-1] == base + 6_900_000
        assert all(b - a == 100_000 for a, b in zip(ts, ts[1:]))

    def test_grid_start_center_stamp(self):
        t0 = 1577836800 * US
        assert grid_start_us(t0 + 1, 60.0) == t0 + 60 * US  # ceil to grid
        assert grid_start_us(t0, 3600.0) == t0 + (29 * 60 + 30) * US
        assert grid_start_us(t0, 86400.0) == t0 + (11 * 3600 + 59 * 60 + 30) * US
        assert grid_start_us(t0 + 50_000, 0.1) == t0 + 100_000

    def test_tenhz_rollup_exact_grid(self, spark):
        base = 1577836800 * US
        rng = np.random.default_rng(8)
        rows = [
            ("u", "H", base + i * 100_000, float(rng.normal()))
            for i in range(3000)
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        out = rollup_step(
            df, TENHZ, range_start_us=base, range_end_us=base + 2999 * 100_000
        )
        ts = sorted(r.t_us for r in out.collect())
        # outputs on exact 1 s marks, first eligible at ceil(hw)=7 s
        assert all(t % US == 0 for t in ts)
        assert ts[0] == base + 7 * US


class TestSkewBalance:
    def test_hot_url_spreads_across_anchors(self, spark):
        """The rollup shuffle key is (series, anchor): a hot url's rows
        spread across its time anchors, so one hot domain cannot pin a
        reducer — the design-level answer to Zipf traffic (salting is only
        needed for per-series operators like sqdist, where the recurrence
        is inherently sequential anyway)."""
        base = 1577836800 * US
        rows = [("hot", "c", base + i * US, 1.0) for i in range(7200)]
        rows += [("cold", "c", base + i * 60 * US, 1.0) for i in range(120)]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        out = rollup_step(
            df, STEPS[1], range_start_us=base, range_end_us=base + 7199 * US
        )
        per_key = (
            out.groupBy(F.pmod(F.xxhash64("url", "channel", "t_us"), F.lit(8)))
            .count()
            .collect()
        )
        counts = [r["count"] for r in per_key]
        # anchor-level keys hash near-uniformly despite 60:1 row skew
        assert max(counts) < 3 * (sum(counts) / len(counts))


class TestGridStartUnaligned:
    def test_center_stamp_not_skipped(self):
        # start between the hour anchor and its center stamp must land on
        # THAT hour's stamp, not skip to the next hour (serving data loss)
        t0 = 1578268800 * US  # 2020-01-06 00:00
        start = t0 + 10 * 60 * US  # 00:10
        assert grid_start_us(start, 3600.0) == t0 + (29 * 60 + 30) * US
        # start just past the stamp rolls to the next hour's stamp
        start2 = t0 + (29 * 60 + 31) * US
        assert grid_start_us(start2, 3600.0) == t0 + 3600 * US + (29 * 60 + 30) * US
        # day tier: start at 03:00 keeps the same day's 11:59:30
        start3 = t0 + 3 * 3600 * US
        assert grid_start_us(start3, 86400.0) == t0 + (11 * 3600 + 59 * 60 + 30) * US
