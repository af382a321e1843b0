"""Streaming revision dedup vs the batch operator — row parity across
micro-batches and at-least-once replay safety."""

import time

from usgs_geomag_algorithms_spark.operators.churn import revision_dedup
from usgs_geomag_algorithms_spark.streaming.churn_stream import (
    revision_dedup_streaming,
)

M = 60_000_000
T0 = 1578268800 * 1_000_000
SCHEMA = "url string, t_us long, digest string"
DIGESTS = ["a", "a", None, None, "b", "b", "b", "a", None, "a"]


def rows(i0, i1):
    out = []
    for u, shift in (("u1", 0), ("u2", 3)):
        out += [
            (u, T0 + i * M, DIGESTS[(i + shift) % len(DIGESTS)])
            for i in range(i0, i1)
        ]
    return out


def start_query(spark, path, ckpt, name):
    src = spark.readStream.schema(SCHEMA).parquet(path)
    return (
        revision_dedup_streaming(src)
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


def batch_want(spark, n):
    out = revision_dedup(
        spark.createDataFrame(rows(0, n), SCHEMA), ("url",), "t_us", "digest"
    )
    return {
        (r.url, r.t_us): (r.digest, r.revision_no) for r in out.collect()
    }


class TestStreamingRevisionDedup:
    def test_parity_across_micro_batches(self, spark, tmp_path):
        path, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        want = batch_want(spark, 40)
        spark.createDataFrame(rows(0, 25), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q = start_query(spark, path, ckpt, "rev_par")
        try:
            n1 = wait_rows(spark, q, "rev_par", 1)
            assert n1 >= 1
            # second chunk: revision numbering must continue from state
            spark.createDataFrame(rows(25, 40), SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            got_n = wait_rows(spark, q, "rev_par", len(want))
            assert got_n == len(want)
            got = {
                (r.url, r.t_us): (r.digest, r.revision_no)
                for r in spark.sql("SELECT * FROM rev_par").collect()
            }
            assert got == want
        finally:
            q.stop()

    def test_replay_drops_already_processed(self, spark, tmp_path):
        path, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        spark.createDataFrame(rows(0, 10), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q = start_query(spark, path, ckpt, "rev_rep")
        try:
            want = batch_want(spark, 10)
            assert wait_rows(spark, q, "rev_rep", len(want)) == len(want)
            # re-append the SAME rows: all at or before last_t -> dropped
            spark.createDataFrame(rows(0, 10), SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            q.processAllAvailable()
            got = {
                (r.url, r.t_us): (r.digest, r.revision_no)
                for r in spark.sql("SELECT * FROM rev_rep").collect()
            }
            assert got == want
        finally:
            q.stop()
