"""Streaming OHLC / histogram tiers vs their batch operators
(availableNow drain over a file source — replay-safe append mode)."""

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.rollup import histogram_rollup
from usgs_geomag_algorithms_spark.operators.stats import ohlc_rollup
from usgs_geomag_algorithms_spark.streaming.stats_stream import (
    streaming_histogram,
    streaming_ohlc,
)

M = 60_000_000
H = 3_600_000_000
T0 = 1578268800 * 1_000_000  # 2020-01-06, safely past epoch


def drain(stream_out, spark, name):
    q = (
        stream_out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _write_samples(spark, tmp_path, n=500):
    rows = [
        ("a" if i % 3 else "b", T0 + i * 37 * M // 10, (i * 7) % 93)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "series string, t_us long, v long")
    path = str(tmp_path / "samples")
    df.coalesce(1).write.parquet(path)
    return df, path


def _stream(spark, path):
    src = spark.readStream.schema(
        "series string, t_us long, v long"
    ).parquet(path)
    return src.withColumn("event_ts", F.timestamp_micros(F.col("t_us")))


class TestStreamingOhlc:
    def test_matches_batch(self, spark, tmp_path):
        df, path = _write_samples(spark, tmp_path)
        out = drain(
            streaming_ohlc(_stream(spark, path), H, watermark="0 seconds"),
            spark,
            "ohlc_stream",
        )
        got = {(r.series, r.t_us): tuple(r) for r in out.collect()}
        want = {
            (r.series, r.t_us): tuple(r) for r in ohlc_rollup(df, H).collect()
        }
        # every emitted window matches batch exactly; only the final open
        # window per series may be held back by the watermark
        assert got and all(got[k] == want[k] for k in got)
        assert len(got) >= len(want) - 2


class TestStreamingHistogram:
    def test_matches_batch(self, spark, tmp_path):
        df, path = _write_samples(spark, tmp_path)
        sig = df.select("series", "t_us", F.col("v").cast("double").alias("value"))
        out = drain(
            streaming_histogram(
                _stream(spark, path).withColumn(
                    "value", F.col("v").cast("double")
                ),
                H,
                bin_width=8.0,
                n_bins=10,
                watermark="0 seconds",
            ),
            spark,
            "hist_stream",
        )
        got = {(r.series, r.t_us, r.bin): r.n for r in out.collect()}
        want = {
            (r.series, r.t_us, r.bin): r.n
            for r in histogram_rollup(sig, H, 8.0, 10).collect()
        }
        assert len(got) > 10 and all(got[k] == want[k] for k in got)
        # only bins of the final open window per series may be held back
        held = {k for k in want if k not in got}
        assert len({(s, t) for s, t, _ in held}) <= 2
