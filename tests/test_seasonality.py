"""ACF / dominant-period detection vs a pure-Python paired estimator."""

import math

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.seasonality import (
    acf_lags,
    dominant_period,
)

STEP = 60_000_000  # one-minute grid


def ref_acf(points, lag):
    """Pearson over exact-timestamp pairs (t, t + lag*STEP)."""
    by_t = dict(points)
    pairs = [
        (v, by_t[t + lag * STEP]) for t, v in points if t + lag * STEP in by_t
    ]
    n = len(pairs)
    if n < 2:
        return n, None
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return n, None
    return n, float(n * sxy - sx * sy) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))


def _df(spark, series_points):
    rows = [
        (s, t, v) for s, pts in series_points.items() for t, v in pts
    ]
    return spark.createDataFrame(rows, "series string, t_us long, v long")


def _gappy_signal(period, n, drop_every=11):
    """Deterministic periodic-ish signal with holes (no random: LCG)."""
    pts, state = [], 12345
    for i in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        if i % drop_every == 0:
            continue  # grid hole
        v = 100 + 30 * ((i % period) - period // 2) + state % 7
        pts.append((i * STEP, v))
    return pts


class TestAcf:
    LAGS = [1, 2, 3, 5, 7, 10, 14]

    def test_matches_reference_with_gaps(self, spark):
        pts = _gappy_signal(period=7, n=200)
        got = {
            r.lag: (r.n_pairs, r.acf)
            for r in acf_lags(
                _df(spark, {"a": pts}), self.LAGS, STEP
            ).collect()
        }
        assert set(got) == set(self.LAGS)
        for lag in self.LAGS:
            n, r = ref_acf(pts, lag)
            gn, gr = got[lag]
            assert gn == n
            assert gr == r, (lag, gr, r)  # bit-exact, same IEEE tree

    def test_periodicity_detected(self, spark):
        pts = _gappy_signal(period=7, n=300)
        top = dominant_period(
            acf_lags(_df(spark, {"a": pts}), self.LAGS, STEP)
        ).collect()
        assert len(top) == 1 and top[0].period == 7

    def test_perfect_period_scores_near_one(self, spark):
        # exact period-3 signal: acf(3) == dx/(sqrt(dx)*sqrt(dx)) — 1.0
        # up to the one-ulp sqrt round-trip, and beats the off-period lags
        pts = [(i * STEP, [5, 9, 2][i % 3]) for i in range(60)]
        top = dominant_period(
            acf_lags(_df(spark, {"a": pts}), [2, 3, 4], STEP)
        ).collect()
        assert top[0].period == 3 and abs(top[0].acf - 1.0) < 1e-12

    def test_tie_breaks_to_shortest_lag(self, spark):
        acf_df = spark.createDataFrame(
            [("a", 6, 10, 0.5), ("a", 3, 10, 0.5), ("a", 2, 10, 0.25)],
            "series string, lag int, n_pairs long, acf double",
        )
        top = dominant_period(acf_df).collect()
        assert len(top) == 1 and top[0].period == 3

    def test_series_isolation(self, spark):
        data = {
            "p3": [(i * STEP, [5, 9, 2][i % 3]) for i in range(90)],
            "p5": [(i * STEP, [1, 8, 3, 9, 4][i % 5]) for i in range(90)],
        }
        top = {
            r.series: r.period
            for r in dominant_period(
                acf_lags(_df(spark, data), [2, 3, 4, 5], STEP)
            ).collect()
        }
        assert top == {"p3": 3, "p5": 5}

    def test_degenerate_guards(self, spark):
        # constant series -> dx == 0 -> NULL acf everywhere -> no period row
        pts = [(i * STEP, 42) for i in range(50)]
        df = _df(spark, {"c": pts})
        acf = acf_lags(df, [1, 2], STEP)
        assert all(r.acf is None for r in acf.collect())
        assert dominant_period(acf).count() == 0
        # too-short series: single pair at lag 1 -> below min_points
        two = _df(spark, {"s": [(0, 1), (STEP, 2)]})
        rows = acf_lags(two, [1], STEP).collect()
        assert rows[0].n_pairs == 1 and rows[0].acf is None

    def test_plan_no_python(self, spark):
        df = _df(spark, {"a": [(i * STEP, i % 9) for i in range(40)]})
        out = acf_lags(df, [1, 3], STEP)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_rejects_bad_lags(self, spark):
        df = _df(spark, {"a": [(0, 1)]})
        for bad in ([], [0], [-1, 5]):
            try:
                acf_lags(df, bad, STEP)
                raise AssertionError(f"accepted {bad}")
            except ValueError:
                pass


def ref_xcorr(x_points, y_points, lag):
    by_t = dict(y_points)
    pairs = [
        (v, by_t[t + lag * STEP]) for t, v in x_points if t + lag * STEP in by_t
    ]
    n = len(pairs)
    if n < 2:
        return n, None
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return n, None
    return n, float(n * sxy - sx * sy) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))


class TestXcorr:
    LAGS = [-5, -3, -2, -1, 0, 1, 2, 3, 5]

    def _two_signals(self, shift=3, n=200):
        """y is x delayed by `shift` steps plus deterministic noise."""
        x = _gappy_signal(period=9, n=n, drop_every=13)
        by_t = dict(x)
        y = [
            (t + shift * STEP, v + ((t // STEP) % 5))
            for t, v in x
        ]
        return x, y

    def test_matches_reference(self, spark):
        from usgs_geomag_algorithms_spark.operators.seasonality import xcorr_lags

        x, y = self._two_signals()
        xdf = spark.createDataFrame(x, "t_us long, v long")
        ydf = spark.createDataFrame(y, "t_us long, v long")
        got = {
            r.lag: (r.n_pairs, r.xcorr)
            for r in xcorr_lags(xdf, ydf, self.LAGS, STEP).collect()
        }
        for lag in self.LAGS:
            n, ref = ref_xcorr(x, y, lag)
            gn, gx = got[lag]
            assert gn == n
            if ref is None:
                assert gx is None
            else:
                assert gx == ref  # bit-exact: same IEEE tree

    def test_lead_lag_finds_shift(self, spark):
        from usgs_geomag_algorithms_spark.operators.seasonality import (
            lead_lag,
            xcorr_lags,
        )

        x, y = self._two_signals(shift=3)
        xdf = spark.createDataFrame(x, "t_us long, v long")
        ydf = spark.createDataFrame(y, "t_us long, v long")
        best = lead_lag(xcorr_lags(xdf, ydf, self.LAGS, STEP)).collect()
        assert len(best) == 1
        assert best[0].best_lag == 3  # x leads y by the constructed shift

    def test_series_cols_and_zero_lag_is_window_corr(self, spark):
        """lag 0 xcorr == plain Pearson of the aligned pairs."""
        from usgs_geomag_algorithms_spark.operators.seasonality import xcorr_lags

        x, y = self._two_signals(shift=0)
        xdf = spark.createDataFrame(
            [("a", t, v) for t, v in x], "series string, t_us long, v long"
        )
        ydf = spark.createDataFrame(
            [("a", t, v) for t, v in y], "series string, t_us long, v long"
        )
        row = (
            xcorr_lags(xdf, ydf, [0], STEP, series_cols=("series",))
            .collect()[0]
        )
        n, ref = ref_xcorr(x, y, 0)
        assert (row.series, row.n_pairs) == ("a", n)
        assert row.xcorr == ref


class TestHarmonicPower:
    def test_pure_tone_amplitude(self, spark):
        """A clean cosine at the bin frequency recovers its amplitude."""
        from usgs_geomag_algorithms_spark.operators.seasonality import (
            harmonic_power,
            harmonic_weights,
        )

        period, amp0, base = 24, 50, 1000
        wc, _ = harmonic_weights(period)
        # integer signal: base + amp0*cos(2*pi*p/24) rounded via the SAME
        # weight table (so the tone is exactly representable)
        pts = [
            (i * STEP, base + (amp0 * wc[i % period]) // 10**6)
            for i in range(period * 10)
        ]
        df = spark.createDataFrame(
            [("s", t, v) for t, v in pts], "series string, t_us long, v long"
        )
        row = harmonic_power(df, period, STEP).collect()[0]
        assert row.n_slots == period * 10
        # recovered amplitude within the floor-quantization bias of the
        # constructed integer tone (|bias| < 1 count rectified by cos)
        assert abs(row.amplitude - amp0) < 0.5
        # a flat signal has ~zero first-harmonic amplitude
        flat = spark.createDataFrame(
            [("s", t, base) for t, _ in pts], "series string, t_us long, v long"
        )
        frow = harmonic_power(flat, period, STEP).collect()[0]
        assert frow.amplitude < 1e-6

    def test_matches_numpy_dft(self, spark):
        import numpy as np

        from usgs_geomag_algorithms_spark.operators.seasonality import (
            harmonic_power,
        )

        period, n = 24, 240
        vals = [100 + ((i * 37) % 23) - ((i * 13) % 11) for i in range(n)]
        df = spark.createDataFrame(
            [("s", i * STEP, v) for i, v in enumerate(vals)],
            "series string, t_us long, v long",
        )
        row = harmonic_power(df, period, STEP).collect()[0]
        arr = np.array(vals, dtype=np.float64)
        ph = 2 * np.pi * (np.arange(n) % period) / period
        a = float(np.sum(arr * np.cos(ph)))
        b = float(np.sum(arr * np.sin(ph)))
        ref_amp = 2.0 * math.sqrt(a * a + b * b) / n
        # integer-scaled weights vs true cos: agree to ~1e-6 relative
        assert abs(row.amplitude - ref_amp) / max(ref_amp, 1.0) < 1e-4

    def test_gap_robust_phase(self, spark):
        """Dropping slots changes n but phases stay anchored to t."""
        from usgs_geomag_algorithms_spark.operators.seasonality import (
            harmonic_power,
        )

        period = 24
        pts = [
            ("s", i * STEP, 100 + (i % period))
            for i in range(240)
            if i % 7 != 0
        ]
        df = spark.createDataFrame(pts, "series string, t_us long, v long")
        row = harmonic_power(df, period, STEP).collect()[0]
        assert row.n_slots == len(pts)
        assert row.amplitude is not None and row.amplitude > 0
