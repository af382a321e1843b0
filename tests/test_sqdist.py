"""Holt-Winters SqDist: golden unit vectors (derived from the reference's
SQDistAlgorithm_test.py:11-200 configurations — FIXTURES F7), state
continuity, and the distributed applyInPandas operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from numpy.testing import assert_almost_equal

from usgs_geomag_algorithms_spark.operators.sqdist import (
    HWParams,
    HWState,
    holt_winters_additive,
    split_state_rows,
    sqdist_apply,
)
from usgs_geomag_algorithms_spark.tiers import US

M = 4
T = np.linspace(0, 2 * np.pi, M + 1)[:-1]
S0 = np.sin(T)[0:4].tolist()
SIGMA0 = [np.sqrt(0.5)]
T0 = 1577836800 * US


def run(yobs, alpha, beta, gamma, s0=S0, l0=0.0, b0=0.0, sigma0=SIGMA0):
    p = HWParams(m=M, alpha=alpha, beta=beta, gamma=gamma)
    st = HWState(s0=list(s0), l0=l0, b0=b0, sigma0=list(sigma0))
    return holt_winters_additive(np.asarray(yobs, float), p, st)


class TestGoldenVectors:
    def test_gap_forecast_trendline_sigma_growth(self):
        # all-NaN input, gamma=0: yhat repeats the seasonal cycle, sigma
        # grows per Hyndman PI with trendline adjustments
        yhat, shat, sig, _ = run(np.full(12, np.nan), alpha=1 / 12.0, beta=0.0, gamma=0.0)
        assert_almost_equal(yhat, [0, 1, 0, -1] * 3)
        assert_almost_equal(shat, [0, 1, 0, -1] * 3)
        assert_almost_equal(
            sig,
            [0.70710678, 0.70955777, 0.71200031, 0.71443451, 0.71686044,
             0.71927819, 0.72168784, 0.72408947, 0.72648316, 0.72886899,
             0.73124703, 0.73361737],
        )

    def test_gap_forecast_seasonal_sigma_growth(self):
        yhat, shat, sig, _ = run(
            np.full(12, np.nan), alpha=0.0, beta=0.0, gamma=1 / 12.0 * M
        )
        assert_almost_equal(yhat, [0, 1, 0, -1] * 3)
        assert_almost_equal(
            sig,
            [0.70710678] * 4 + [0.74535599] * 4 + [0.78173596] * 4,
        )

    def test_smooth_zero_observations_level_only(self):
        yhat, shat, sig, _ = run(np.zeros(12), alpha=1 / 12.0, beta=0.0, gamma=0.0)
        assert_almost_equal(
            yhat,
            [0, 1, -0.08333333, -1.07638889, 0.01331019, 1.01220100,
             -0.07214908, -1.06613666, 0.02270806, 1.02081573,
             -0.06425225, -1.0588979],
            8,
        )
        assert_almost_equal(shat, [0, 1, 0, -1] * 3, 8)
        assert_almost_equal(
            sig,
            [0.64818122, 0.67749945, 0.62798561, 0.66535255, 0.61101568,
             0.64444779, 0.59675623, 0.63587127, 0.58477433, 0.62111112,
             0.57470621, 0.61505552],
            8,
        )

    def test_smooth_zero_observations_seasonal_only(self):
        yhat, shat, sig, _ = run(np.zeros(12), alpha=0.0, beta=0.0, gamma=1 / 12.0 * M)
        assert_almost_equal(
            yhat,
            [0, 1, 0, -1, 0, 0.66666667, 0, -0.66666667, 0, 0.44444444,
             0, -0.44444444],
            8,
        )


class TestStateContinuity:
    def test_chunked_equals_whole(self):
        rng = np.random.default_rng(21)
        y = np.sin(np.arange(48) * 2 * np.pi / M) + rng.normal(0, 0.1, 48)
        p = HWParams(m=M, alpha=0.1, beta=0.01, gamma=0.2)
        st0 = HWState(s0=list(S0), l0=0.0, b0=0.0, sigma0=list(SIGMA0))
        whole, _, _, _ = holt_winters_additive(y, p, st0)
        a, _, _, st_mid = holt_winters_additive(y[:24], p, st0)
        b, _, _, _ = holt_winters_additive(y[24:], p, st_mid)
        assert_almost_equal(np.concatenate([a, b]), whole, 10)

    def test_state_roundtrip_json(self):
        st = HWState(s0=[1.0, 2.0], l0=3.0, b0=0.1, sigma0=[0.5], next_start_us=123, delta_us=60)
        assert HWState.from_json(st.to_json()) == st


class TestSparkApply:
    def mk(self, spark, series, offset=0):
        rows = []
        for url, vals in series.items():
            for i, v in enumerate(vals):
                t = T0 + (i + offset) * 60 * US
                if v is not None and not (isinstance(v, float) and np.isnan(v)):
                    rows.append((url, "H", t, float(v)))
                else:
                    rows.append((url, "H", t, None))
        return spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )

    def test_emits_four_channels_and_state(self, spark):
        rng = np.random.default_rng(3)
        y = (np.sin(np.arange(24) * 2 * np.pi / M) + rng.normal(0, 0.05, 24)).tolist()
        df = self.mk(spark, {"u1": y, "u2": y})
        p = HWParams(m=M, alpha=0.1, beta=0.0, gamma=0.2)
        out = sqdist_apply(df, p, delta_s=60.0)
        data, states = split_state_rows(out)
        chans = {r.channel for r in data.select("channel").distinct().collect()}
        assert chans == {"H_Dist", "H_SQ", "H_SV", "H_Sigma"}
        assert set(states) == {"u1|H", "u2|H"}
        st = HWState.from_json(states["u1|H"])
        assert st.next_start_us == T0 + 24 * 60 * US
        # dist + sv + sq == yobs where observed (dist = y - yhat; yhat = sq+sv)
        rows = {(r.channel, r.t_us): r.value for r in data.collect() if r.url == "u1"}
        for i, v in enumerate(y):
            t = T0 + i * 60 * US
            recon = rows[("H_Dist", t)] + rows[("H_SQ", t)] + rows[("H_SV", t)]
            assert abs(recon - v) < 1e-9

    def test_resume_matches_single_run(self, spark):
        rng = np.random.default_rng(4)
        y = (np.sin(np.arange(40) * 2 * np.pi / M) + rng.normal(0, 0.05, 40)).tolist()
        p = HWParams(m=M, alpha=0.1, beta=0.0, gamma=0.2)
        # identical explicit initial state for both runs (defaults like
        # sigma0 = nanvar(chunk) are chunk-dependent)
        init = {
            "u|H": HWState(
                s0=list(S0), l0=0.0, b0=0.0, sigma0=list(SIGMA0)
            ).to_json()
        }
        whole, _ = split_state_rows(
            sqdist_apply(self.mk(spark, {"u": y}), p, 60.0, states=init)
        )
        first, st1 = split_state_rows(
            sqdist_apply(self.mk(spark, {"u": y[:20]}), p, 60.0, states=init)
        )
        second, _ = split_state_rows(
            sqdist_apply(self.mk(spark, {"u": y[20:]}, offset=20), p, 60.0, states=st1)
        )
        got = {}
        for r in first.collect():
            got[(r.channel, r.t_us)] = r.value
        for r in second.collect():
            got[(r.channel, r.t_us)] = r.value
        exp = {(r.channel, r.t_us): r.value for r in whole.collect()}
        # SQ/SV carry the chunk-relative zero-mean remainder (same in the
        # reference: the enforcement folds the END-of-chunk remainder into
        # all emitted seasonals), so chunk-invariant channels are Dist+Sigma
        mismatches = [
            k
            for k in exp
            if k[0] in ("H_Dist", "H_Sigma")
            and not np.isclose(got[k], exp[k], atol=1e-9, equal_nan=True)
        ]
        assert not mismatches

    def test_continuity_violation_raises(self, spark):
        y = [1.0] * 12
        p = HWParams(m=M, alpha=0.1, beta=0.0, gamma=0.2)
        _, st = split_state_rows(sqdist_apply(self.mk(spark, {"u": y}), p, 60.0))
        # next chunk starting at the WRONG time must fail
        bad = self.mk(spark, {"u": y})  # starts at T0 again, not next_start
        with pytest.raises(Exception, match="Inconsistent SqDist state"):
            sqdist_apply(bad, p, 60.0, states=st).collect()


class TestEstimateParameters:
    def test_fit_improves_rmse(self):
        from usgs_geomag_algorithms_spark.operators.sqdist import (
            estimate_parameters,
            holt_winters_additive,
        )

        rng = np.random.default_rng(44)
        n = 240
        season = np.tile(np.sin(np.linspace(0, 2 * np.pi, M + 1)[:-1]), n // M)
        y = 10 + season * 3 + rng.normal(0, 0.1, n)
        a, b, g, rmse_fit = estimate_parameters(y, m=M)
        assert 0.0 <= a <= 1.0 and 0.0 <= b <= 1.0 and 0.0 <= g <= 1.0
        # fitted params beat a deliberately bad configuration
        p_bad = HWParams(m=M, alpha=0.999, beta=0.999, gamma=0.0)
        yhat, _, _, _ = holt_winters_additive(y, p_bad)
        e = (y - yhat)[~np.isnan(y - yhat)]
        rmse_bad = np.sqrt(np.mean(e * e))
        assert rmse_fit < rmse_bad


class TestRealtimeCli:
    def test_six_sequential_invocations_match_one_run(self, spark, tmp_path):
        """The reference Controller test pattern (Controller_test.py:36-213):
        repeated realtime CLI invocations with a persisted statefile must
        reproduce the single-run decomposition exactly."""
        import json
        import numpy as np

        from jobs.run_sqdist import main as sqdist_main
        from usgs_geomag_algorithms_spark.sources.store import TierStore
        from usgs_geomag_algorithms_spark.tiers import US

        T0 = 1577836800 * US  # 2020-01-01T00:00Z
        MINU = 60 * US
        n = 6 * 60  # six hourly windows of minute data
        rng = np.random.default_rng(3)
        y = (
            10.0
            + np.sin(np.arange(n) * 2 * np.pi / 60) * 5
            + rng.normal(0, 0.3, n)
        )
        rows = [("u", "H", T0 + i * MINU, float(y[i])) for i in range(n)]
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "minute",
        )

        def iso(us):
            import datetime

            return (
                datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%S")
            )

        state = str(tmp_path / "state.json")
        out_inc = str(tmp_path / "inc")
        # window 0 bootstraps the state (default init is data-dependent,
        # as in the reference); both paths then resume from THAT state
        rc = sqdist_main([
            "--store", str(tmp_path / "t"), "--tier", "minute",
            "--start", iso(T0), "--end", iso(T0 + 59 * MINU),
            "--statefile", state, "--out", str(tmp_path / "warm"), "--m", "60",
        ])
        assert rc == 0
        import shutil

        state_full = str(tmp_path / "state_full.json")
        shutil.copy(state, state_full)

        for h in range(1, 6):
            lo, hi = T0 + h * 60 * MINU, T0 + ((h + 1) * 60 - 1) * MINU
            rc = sqdist_main([
                "--store", str(tmp_path / "t"), "--tier", "minute",
                "--start", iso(lo), "--end", iso(hi),
                "--statefile", state, "--out", out_inc, "--m", "60",
            ])
            assert rc == 0

        # single run over windows 1..5 from the same bootstrap state
        out_full = str(tmp_path / "full")
        rc = sqdist_main([
            "--store", str(tmp_path / "t"), "--tier", "minute",
            "--start", iso(T0 + 60 * MINU), "--end", iso(T0 + (n - 1) * MINU),
            "--statefile", state_full, "--out", out_full, "--m", "60",
        ])
        assert rc == 0

        inc = sorted(map(tuple, spark.read.parquet(out_inc).collect()))
        full = sorted(map(tuple, spark.read.parquet(out_full).collect()))
        assert len(inc) == len(full) > 0
        for a, b in zip(inc, full):
            assert a[:3] == b[:3]
            if a[3] is None or b[3] is None:
                assert a[3] == b[3]
            else:
                np.testing.assert_almost_equal(a[3], b[3], decimal=8)

        # statefile advanced to one-past-the-end for each series
        st = json.loads(open(state).read())
        assert set(st) == {"u|H"}
        assert json.loads(st["u|H"])["next_start_us"] == T0 + n * MINU


class TestWindowedApply:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        )

    def test_boundary_gap_free_runs_instead_of_wedging(self, spark):
        import numpy as np

        from usgs_geomag_algorithms_spark.tiers import US

        T0 = 1577836800 * US
        MINU = 60 * US
        p = HWParams(m=60, alpha=0.1, beta=0.0, gamma=0.2)
        # window 1: full hour
        w1 = self._mk(spark, [("u", "H", T0 + i * MINU, 10.0) for i in range(60)])
        out1 = sqdist_apply(
            w1, p, 60.0, range_start_us=T0, range_end_us=T0 + 59 * MINU
        )
        _, st1 = split_state_rows(out1)
        # window 2: first 10 minutes MISSING (outage at the window start) —
        # the old inference would raise; the explicit window free-runs
        w2 = self._mk(
            spark,
            [("u", "H", T0 + i * MINU, 10.0) for i in range(70, 120)],
        )
        out2 = sqdist_apply(
            w2, p, 60.0, states=st1,
            range_start_us=T0 + 60 * MINU, range_end_us=T0 + 119 * MINU,
        )
        data, st2 = split_state_rows(out2)
        dist = {r.t_us: r.value for r in data.collect() if r.channel == "H_Dist"}
        assert len(dist) == 60  # all 60 slots emitted, gap slots included
        from usgs_geomag_algorithms_spark.operators.sqdist import HWState
        assert HWState.from_json(st2["u|H"]).next_start_us == T0 + 120 * MINU

    def test_series_with_state_but_no_rows_free_runs_whole_window(self, spark):
        from usgs_geomag_algorithms_spark.tiers import US

        T0 = 1577836800 * US
        MINU = 60 * US
        p = HWParams(m=60, alpha=0.1, beta=0.0, gamma=0.2)
        w1 = self._mk(spark, [("u", "H", T0 + i * MINU, 5.0) for i in range(60)])
        _, st1 = split_state_rows(
            sqdist_apply(w1, p, 60.0, range_start_us=T0, range_end_us=T0 + 59 * MINU)
        )
        # next window has NO rows for the series at all
        empty = self._mk(spark, []).where("1=0")
        out = sqdist_apply(
            empty, p, 60.0, states=st1,
            range_start_us=T0 + 60 * MINU, range_end_us=T0 + 119 * MINU,
        )
        data, st2 = split_state_rows(out)
        assert data.count() == 240  # 4 channels x 60 free-run slots
        from usgs_geomag_algorithms_spark.operators.sqdist import HWState
        assert HWState.from_json(st2["u|H"]).next_start_us == T0 + 120 * MINU

    def test_off_grid_rows_dropped_not_snapped(self, spark):
        from usgs_geomag_algorithms_spark.tiers import US

        T0 = 1577836800 * US
        MINU = 60 * US
        p = HWParams(m=60, alpha=0.1, beta=0.0, gamma=0.2)
        rows = [("u", "H", T0 + i * MINU, 7.0) for i in range(60)]
        rows.append(("u", "H", T0 + 90 * 1_000_000, 999.0))  # off-grid (t0+90s)
        out = sqdist_apply(
            self._mk(spark, rows), p, 60.0,
            range_start_us=T0, range_end_us=T0 + 59 * MINU,
        )
        data, _ = split_state_rows(out)
        # slot 1 (t0+60s) must hold the real 7.0-based decomposition, not
        # be poisoned by the snapped 999 (dist at slot1 would spike)
        dist = {r.t_us: r.value for r in data.collect() if r.channel == "H_Dist"}
        assert abs(dist[T0 + MINU]) < 100

    def test_state_shape_guards(self):
        import numpy as np
        import pytest

        p = HWParams(m=60, alpha=0.1, beta=0.0, gamma=0.2)
        bad = HWState(s0=[0.0] * 30)  # wrong seasonal length
        with pytest.raises(ValueError, match="s0 must have length"):
            holt_winters_additive(np.zeros(10), p, bad)


class TestEstimateBySeries:
    """Distributed parameter estimation (the last driver-side SqDist step
    scaled out): one grouped-Arrow fit per series, bit-identical to the
    driver-side estimate_parameters on the same data."""

    def _series_df(self, spark, n_series=100, n=36):
        rows, local = [], {}
        for s in range(n_series):
            rng = np.random.default_rng(1000 + s)
            amp = 0.5 + (s % 7) * 0.3
            y = amp * np.sin(np.arange(n) * 2 * np.pi / M) + rng.normal(
                0, 0.05 + 0.01 * (s % 5), n
            )
            url = f"u{s:03d}"
            local[(url, "H")] = y
            # shuffled insertion order: the fit must not depend on row order
            for i in rng.permutation(n):
                rows.append((url, "H", T0 + int(i) * 60 * US, float(y[i])))
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        return df, local

    def test_hundred_series_match_driver_fit_bitwise(self, spark):
        from usgs_geomag_algorithms_spark.operators.sqdist import (
            estimate_by_series,
            estimate_parameters,
        )

        df, local = self._series_df(spark, n_series=100)
        got = {
            (r.url, r.channel): (r.alpha, r.beta, r.gamma, r.rmse, r.n_obs)
            for r in estimate_by_series(df, m=M, max_iter=40).collect()
        }
        assert len(got) == 100
        for key, y in local.items():
            a, b, g, r = estimate_parameters(y, M, max_iter=40)
            assert got[key] == (a, b, g, r, len(y)), key

    def test_params_df_feeds_apply(self, spark):
        from usgs_geomag_algorithms_spark.operators.sqdist import (
            estimate_by_series,
            sqdist_apply,
            split_state_rows,
        )

        df, local = self._series_df(spark, n_series=6)
        fits = estimate_by_series(df, m=M, max_iter=30)
        # drop one series from the params table: it must fall back to the
        # global params
        params_df = fits.where("url != 'u000'")
        template = HWParams(m=M, alpha=0.3, beta=0.1, gamma=0.3)
        out, _ = split_state_rows(
            sqdist_apply(df, template, 60.0, params_df=params_df)
        )
        got = {
            (r.url, r.channel, r.t_us): r.value
            for r in out.collect()
        }
        fit_rows = {r.url: (r.alpha, r.beta, r.gamma) for r in fits.collect()}
        for url in ("u001", "u004"):
            a, b, g = fit_rows[url]
            per = HWParams(m=M, alpha=a, beta=b, gamma=g)
            sub = df.where(F.col("url") == url)
            exp, _ = split_state_rows(sqdist_apply(sub, per, 60.0))
            for r in exp.collect():
                assert np.isclose(
                    got[(r.url, r.channel, r.t_us)], r.value,
                    atol=0, rtol=0, equal_nan=True,
                ), (url, r.channel, r.t_us)
        # the uncovered series equals a run with the template params
        sub = df.where(F.col("url") == "u000")
        exp, _ = split_state_rows(sqdist_apply(sub, template, 60.0))
        for r in exp.collect():
            assert np.isclose(
                got[(r.url, r.channel, r.t_us)], r.value,
                atol=0, rtol=0, equal_nan=True,
            )
