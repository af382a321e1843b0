"""Streaming CUSUM vs the batch prefix-sum operator — bit parity,
micro-batch continuity, and at-least-once replay safety."""

import time

from usgs_geomag_algorithms_spark.operators.changepoint import (
    cusum_changepoints,
)
from usgs_geomag_algorithms_spark.streaming.anomaly_stream import (
    cusum_streaming,
)

M = 60_000_000
T0 = 1578268800 * 1_000_000
BASE, K, H = 40, 0, 30
SCHEMA = "series string, t_us long, v long"
VALUES = [100 + (i * 7) % 5 + (12 if i >= 120 else 0) for i in range(200)]


def rows(i0, i1):
    return [("a", T0 + i * M, VALUES[i]) for i in range(i0, i1)]


def start_query(spark, path, ckpt, name):
    src = spark.readStream.schema(SCHEMA).parquet(path)
    return (
        cusum_streaming(src, baseline=BASE, k=K, h=H)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )


def wait_rows(spark, q, name, want_n, secs=120):
    deadline = time.time() + secs
    while time.time() < deadline:
        q.processAllAvailable()
        n = spark.sql(f"SELECT count(*) c FROM {name}").first().c
        if n >= want_n:
            return n
        time.sleep(1)
    return spark.sql(f"SELECT count(*) c FROM {name}").first().c


def batch_want(spark):
    out = cusum_changepoints(
        spark.createDataFrame(rows(0, 200), SCHEMA),
        baseline=BASE, k=K, h=H,
    )
    return {
        r.t_us: (r.v, r.cusum_hi, r.cusum_lo, r.is_change)
        for r in out.collect()
    }


class TestStreamingCusum:
    def test_bit_parity_across_micro_batches(self, spark, tmp_path):
        path, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        spark.createDataFrame(rows(0, 70), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q = start_query(spark, path, ckpt, "cusum_par")
        try:
            assert wait_rows(spark, q, "cusum_par", 70 - BASE) == 70 - BASE
            # second chunk crosses the shift point; state must carry
            spark.createDataFrame(rows(70, 200), SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            assert wait_rows(spark, q, "cusum_par", 200 - BASE) == 200 - BASE
        finally:
            q.stop()
        got = {
            r.t_us: (r.v, r.cusum_hi, r.cusum_lo, r.is_change)
            for r in spark.sql("SELECT * FROM cusum_par").collect()
        }
        assert got == batch_want(spark)  # bit-identical, flags included
        first_flag = min(t for t, (_, _, _, f) in got.items() if f)
        assert first_flag >= T0 + 120 * M

    def test_replay_rows_are_dropped(self, spark, tmp_path):
        path, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        spark.createDataFrame(rows(0, 100), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q = start_query(spark, path, ckpt, "cusum_rep")
        try:
            assert wait_rows(spark, q, "cusum_rep", 100 - BASE) == 100 - BASE
            # overlapping re-append (at-least-once source): only the
            # genuinely new rows may emit
            spark.createDataFrame(rows(60, 130), SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            assert wait_rows(spark, q, "cusum_rep", 130 - BASE) == 130 - BASE
        finally:
            q.stop()
        got = {
            r.t_us: (r.v, r.cusum_hi, r.cusum_lo, r.is_change)
            for r in spark.sql("SELECT * FROM cusum_rep").collect()
        }
        assert set(got) == {T0 + i * M for i in range(BASE, 130)}
        want = batch_want(spark)
        assert all(got[t] == want[t] for t in got)

    def test_short_series_emits_nothing(self, spark, tmp_path):
        path, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        spark.createDataFrame(rows(0, BASE), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q = start_query(spark, path, ckpt, "cusum_short")
        try:
            q.processAllAvailable()
            assert (
                spark.sql("SELECT count(*) c FROM cusum_short").first().c == 0
            )
        finally:
            q.stop()
