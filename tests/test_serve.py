"""Serving layer + cadence channel end-to-end."""

import json

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.plans.serve import get_timeseries
from usgs_geomag_algorithms_spark.sources.pages import BASE_EPOCH, generate_pages
from usgs_geomag_algorithms_spark.sources.signals import page_signals
from usgs_geomag_algorithms_spark.sources.store import TierStore
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1577836800 * US
MIN = 60 * US


class TestServe:
    def seed(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        rows = [("u1", "text_len", T0 + i * MIN, float(i)) for i in range(5)]
        rows += [("u2", "text_len", T0, 9.0)]  # sparse series
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        store.write(df, "minute")
        return store

    def test_padded_read_returns_gap_rows(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        out = get_timeseries(store, "minute", T0, T0 + 4 * MIN)
        got = {(r.url, r.t_us): r.value for r in out.collect()}
        assert len(got) == 10  # 2 series x 5 slots, gaps explicit
        assert got[("u2", T0)] == 9.0
        assert got[("u2", T0 + MIN)] is None

    def test_channel_and_url_filters_and_json(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        out = get_timeseries(
            store, "minute", T0, T0 + 2 * MIN, urls=["u1"], as_json=True
        )
        rows = out.collect()
        assert len(rows) == 1
        doc = json.loads(rows[0].json)
        assert doc["values"] == [0.0, 1.0, 2.0]

    def test_request_cap(self, spark, tmp_path):
        store = self.seed(spark, tmp_path)
        with pytest.raises(ValueError, match="345600"):
            get_timeseries(store, "minute", T0, T0 + 400_000 * MIN)


class TestCadenceChannel:
    def test_cadence_from_pages(self, spark):
        pages = generate_pages(spark, n_urls=2, hours=0.25, gap_pct=0.0, n_hot=2)
        sig = page_signals(pages, channels=("cadence",))
        rows = [r for r in sig.collect() if r.url.endswith("site0.example/p0")]
        vals = {r.t_us: r.value for r in rows}
        ts = sorted(vals)
        assert vals[ts[0]] is None  # first crawl has no predecessor
        assert all(vals[t] == 1.0 for t in ts[1:])  # 1 s crawl cadence
