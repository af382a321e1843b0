"""CUSUM changepoint detection vs the textbook recurrence."""

import numpy as np

from usgs_geomag_algorithms_spark.operators.changepoint import cusum_changepoints


def sig_df(spark, vals, series="a"):
    return spark.createDataFrame(
        [(series, i * 60_000_000, int(v)) for i, v in enumerate(vals)],
        "series string, t_us long, v long",
    )


def reference_cusum(vals, baseline, k):
    """C_i = max(0, C_{i-1} + d_i) — the sequential textbook form the
    prefix-sum closed form must reproduce (rational arithmetic via n0
    scaling, so exact integers throughout)."""
    mu_num = int(sum(vals[:baseline]))  # n0-scaled mean numerator
    n0 = baseline
    hi, lo, out = 0, 0, []
    for v in vals[baseline:]:
        hi = max(0, hi + n0 * (int(v) - k) - mu_num)
        lo = max(0, lo + mu_num - n0 * (int(v) + k))
        out.append((hi / n0, lo / n0))
    return out


class TestCusum:
    def test_matches_recurrence(self, spark):
        rng = np.random.default_rng(7)
        vals = list(rng.poisson(50, 80)) + list(rng.poisson(57, 60))
        B, K = 40, 2
        rows = sorted(
            cusum_changepoints(
                sig_df(spark, vals), baseline=B, k=K, h=10
            ).collect(),
            key=lambda r: r.t_us,
        )
        ref = reference_cusum(vals, B, K)
        assert len(rows) == len(ref)
        for r, (hi, lo) in zip(rows, ref):
            assert r.cusum_hi == hi, (r.t_us, r.cusum_hi, hi)
            assert r.cusum_lo == lo

    def test_level_shift_detected_spike_ignored(self, spark):
        # +10% sustained shift at t=120 trips h=8 with k=1; a single
        # +15 spike at t=60 fires briefly then RELEASES (the excess
        # drains at k per on-baseline sample: 14 -> under 8 by t=67).
        base = [100] * 120 + [110] * 60
        base[60] = 115
        rows = {
            r.t_us // 60_000_000: r
            for r in cusum_changepoints(
                sig_df(spark, base), baseline=50, k=1, h=8
            ).collect()
        }
        shift_flags = [i for i, r in rows.items() if r.is_change and i >= 120]
        assert shift_flags and min(shift_flags) <= 122  # trips within ~2 min
        assert rows[60].is_change  # spike fires...
        # ...but releases well before the true shift
        assert not any(r.is_change for i, r in rows.items() if 70 <= i < 120)

    def test_low_side(self, spark):
        vals = [100] * 60 + [90] * 30
        rows = [
            r
            for r in cusum_changepoints(
                sig_df(spark, vals), baseline=50, k=1, h=8
            ).collect()
            if r.is_change
        ]
        assert rows and all(r.cusum_lo > 8 for r in rows)

    def test_short_series_emits_nothing(self, spark):
        df = cusum_changepoints(sig_df(spark, [5] * 10), baseline=50)
        assert df.count() == 0

    def test_multi_series_independent(self, spark):
        a = sig_df(spark, [100] * 60 + [120] * 20, series="a")
        b = sig_df(spark, [100] * 80, series="b")
        out = cusum_changepoints(
            a.unionByName(b), baseline=50, k=1, h=8, series_cols=("series",)
        )
        flagged = {r.series for r in out.collect() if r.is_change}
        assert flagged == {"a"}
