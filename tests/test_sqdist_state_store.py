"""Distributed SqDist state: state lives in a TierStore parquet state
table, travels executor<->disk via cogroup + write_state, and NEVER
crosses the driver — the scale shape for millions of independent series
(the reference statefile, ``SqDistAlgorithm.py:122-167``, scaled out)."""

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.operators.sqdist import (
    HWParams,
    HWState,
    split_state_df,
    split_state_rows,
    sqdist_apply,
)
from usgs_geomag_algorithms_spark.sources.store import TierStore
from usgs_geomag_algorithms_spark.tiers import US

M = 4
T0 = 1577836800 * US
MINU = 60 * US
P = HWParams(m=M, alpha=0.1, beta=0.0, gamma=0.2)


def series_df(spark, n_series, n_slots, offset=0):
    """Deterministic per-series values, computed executor-side from a
    range — the driver never builds the 10^4-series dataset either."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_series * n_slots)
        .select(
            F.concat(F.lit("u"), (F.col("id") % n_series).cast("string")).alias(
                "url"
            ),
            F.lit("H").alias("channel"),
            (
                F.lit(T0)
                + (F.floor(F.col("id") / n_series) + F.lit(offset)) * F.lit(MINU)
            ).cast("long").alias("t_us"),
            (
                F.sin(F.floor(F.col("id") / n_series) * 2 * np.pi / M)
                + (F.col("id") % n_series) * 0.001
            ).alias("value"),
        )
    )


@pytest.fixture()
def no_driver_materialization(monkeypatch):
    """Ban every DataFrame->driver materialization primitive for the
    duration: state (and data) must stay distributed."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):
        raise AssertionError("driver materialization during state path")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "toLocalIterator", boom)
    yield


class TestDistributedState:
    N = 10_000

    def test_10k_series_state_roundtrip_no_driver(
        self, spark, tmp_path, no_driver_materialization
    ):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=4)
        # window 1: bootstrap (empty state table)
        out1 = sqdist_apply(
            series_df(spark, self.N, 8),
            P,
            60.0,
            states=store.read_state("sqdist"),
            range_start_us=T0,
            range_end_us=T0 + 7 * MINU,
        )
        data1, st1 = split_state_df(out1)
        store.write_state(st1, "sqdist")
        assert store.read_state("sqdist").count() == self.N
        # window 2: resume every series from the parquet state table
        out2 = sqdist_apply(
            series_df(spark, self.N, 8, offset=8),
            P,
            60.0,
            states=store.read_state("sqdist"),
            range_start_us=T0 + 8 * MINU,
            range_end_us=T0 + 15 * MINU,
        )
        data2, st2 = split_state_df(out2)
        store.write_state(st2, "sqdist")
        st = store.read_state("sqdist")
        assert st.count() == self.N
        # all series advanced to the end of window 2
        from pyspark.sql import functions as F

        advanced = st.where(
            F.get_json_object("state_json", "$.next_start_us")
            == str(T0 + 16 * MINU)
        ).count()
        assert advanced == self.N

    def test_distributed_matches_driver_dict_path(self, spark, tmp_path):
        """Chunked run through the parquet state table == chunked run
        through the legacy driver-dict statefile path, value for value."""
        store = TierStore(spark, str(tmp_path / "t2"), n_buckets=2)
        n = 7
        init_states = {
            f"u{i}|H": HWState(
                s0=[0.0, 1.0, 0.0, -1.0], l0=0.0, b0=0.0, sigma0=[0.7]
            ).to_json()
            for i in range(n)
        }
        init_rows = [
            (k.split("|")[0], "H", js) for k, js in init_states.items()
        ]
        init_df = spark.createDataFrame(
            init_rows, "url string, channel string, state_json string"
        )

        def run_dict():
            st = dict(init_states)
            frames = []
            for w in range(3):
                out = sqdist_apply(
                    series_df(spark, n, 10, offset=10 * w),
                    P,
                    60.0,
                    states=st,
                    range_start_us=T0 + 10 * w * MINU,
                    range_end_us=T0 + (10 * w + 9) * MINU,
                )
                data, new = split_state_rows(out)
                st.update(new)
                frames.append(data.toPandas())
            return frames

        def run_store():
            store.write_state(init_df, "s")
            frames = []
            for w in range(3):
                out = sqdist_apply(
                    series_df(spark, n, 10, offset=10 * w),
                    P,
                    60.0,
                    states=store.read_state("s"),
                    range_start_us=T0 + 10 * w * MINU,
                    range_end_us=T0 + (10 * w + 9) * MINU,
                )
                data, new = split_state_df(out)
                store.write_state(new, "s")
                frames.append(data.toPandas())
            return frames

        import pandas as pd

        a = pd.concat(run_dict()).sort_values(["url", "channel", "t_us"])
        b = pd.concat(run_store()).sort_values(["url", "channel", "t_us"])
        np.testing.assert_array_equal(
            a[["url", "channel", "t_us"]].values, b[["url", "channel", "t_us"]].values
        )
        np.testing.assert_allclose(
            a["value"].values.astype(float),
            b["value"].values.astype(float),
            rtol=0,
            atol=1e-12,
        )

    def test_write_state_preserves_absent_series(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t3"), n_buckets=2)
        df1 = spark.createDataFrame(
            [("a", "H", "{\"l0\": 1.0}"), ("b", "H", "{\"l0\": 2.0}")],
            "url string, channel string, state_json string",
        )
        store.write_state(df1, "s")
        df2 = spark.createDataFrame(
            [("b", "H", "{\"l0\": 9.0}"), ("c", "H", "{\"l0\": 3.0}")],
            "url string, channel string, state_json string",
        )
        store.write_state(df2, "s")
        got = {
            (r.url): r.state_json for r in store.read_state("s").collect()
        }
        assert got == {
            "a": "{\"l0\": 1.0}",
            "b": "{\"l0\": 9.0}",
            "c": "{\"l0\": 3.0}",
        }


class TestCliStateStore:
    def test_cli_state_store_matches_statefile(self, spark, tmp_path):
        """Two sequential CLI invocations via --state-store produce the
        same rows as via --statefile."""
        import datetime

        from jobs.run_sqdist import main as sqdist_main

        def iso(us):
            return datetime.datetime.fromtimestamp(
                us / 1e6, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%S")

        n = 120
        rng = np.random.default_rng(7)
        y = 10.0 + np.sin(np.arange(n) * 2 * np.pi / 60) * 5 + rng.normal(
            0, 0.3, n
        )
        rows = [("u", "H", T0 + i * MINU, float(y[i])) for i in range(n)]
        for mode in ("file", "store"):
            root = tmp_path / f"t_{mode}"
            store = TierStore(spark, str(root), n_buckets=2)
            store.write(
                spark.createDataFrame(
                    rows, "url string, channel string, t_us long, value double"
                ),
                "minute",
            )
            for w in range(2):
                args = [
                    "--store", str(root), "--tier", "minute",
                    "--start", iso(T0 + w * 60 * MINU),
                    "--end", iso(T0 + ((w + 1) * 60 - 1) * MINU),
                    "--out", str(tmp_path / f"out_{mode}"), "--m", "60",
                ]
                if mode == "file":
                    args += ["--statefile", str(tmp_path / "state.json")]
                else:
                    args += ["--state-store", "sqdist"]
                assert sqdist_main(args) == 0
        a = sorted(
            map(tuple, spark.read.parquet(str(tmp_path / "out_file")).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(str(tmp_path / "out_store")).collect())
        )
        assert len(a) == len(b) > 0
        for ra, rb in zip(a, b):
            assert ra[:3] == rb[:3]
            if ra[3] is None or rb[3] is None:
                assert ra[3] == rb[3]
            else:
                np.testing.assert_almost_equal(ra[3], rb[3], decimal=10)
