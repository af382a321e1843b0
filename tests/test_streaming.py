"""Structured Streaming rollup vs the batch operator (availableNow drain)."""

import numpy as np
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.rollup import rollup_step
from usgs_geomag_algorithms_spark.sources.pages import BASE_EPOCH, generate_pages
from usgs_geomag_algorithms_spark.sources.signals import page_signals
from usgs_geomag_algorithms_spark.streaming.rollup_stream import streaming_rollup_step
from usgs_geomag_algorithms_spark.tiers import STEPS, US

SEC_MIN, MIN_HOUR = STEPS[1], STEPS[2]
T0 = BASE_EPOCH * US


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


class TestStreamingRollup:
    def test_fir_minute_matches_batch(self, spark, tmp_path):
        pages = generate_pages(spark, n_urls=3, hours=0.5, gap_pct=3.0, n_hot=3)
        path = str(tmp_path / "pages")
        pages.write.parquet(path)

        sig_batch = page_signals(spark.read.parquet(path), channels=("text_len",))
        batch = {
            (r.url, r.t_us): r.value
            for r in rollup_step(
                sig_batch, SEC_MIN,
                range_start_us=T0, range_end_us=T0 + (1800 - 1) * US,
            ).collect()
        }

        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .parquet(path)
            .select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("event_ts"),
                F.length("text").cast("double").alias("value"),
                F.lit("text_len").alias("channel"),
            )
        )
        out = streaming_rollup_step(stream, SEC_MIN, watermark="10 seconds")
        got = {
            (r.url, r.t_us): r.value
            for r in drain(out, spark, "minute_stream").collect()
        }
        # every batch-eligible interior minute must match the stream output
        matched = 0
        for k, v in batch.items():
            if k in got and v is not None and got[k] is not None:
                np.testing.assert_almost_equal(got[k], v, decimal=9)
                matched += 1
        assert matched >= len([v for v in batch.values() if v is not None]) * 0.8

    def test_tumbling_hour_matches_batch(self, spark, tmp_path):
        # minute-tier rows as the stream source
        rng = np.random.default_rng(17)
        rows = [
            ("u", "text_len", T0 + i * 60 * US, float(rng.normal(50, 4)))
            for i in range(3 * 60)
        ]
        df = spark.createDataFrame(
            rows, schema="url string, channel string, t_us long, value double"
        )
        path = str(tmp_path / "minute")
        df.withColumn("event_ts", F.timestamp_micros("t_us")).write.parquet(path)

        batch = {
            (r.url, r.t_us): r.value
            for r in rollup_step(
                df, MIN_HOUR, range_start_us=T0,
                range_end_us=T0 + (180 - 1) * 60 * US,
            ).collect()
        }
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)
        )
        out = streaming_rollup_step(stream, MIN_HOUR, watermark="1 minute")
        got = {
            (r.url, r.t_us): r.value
            for r in drain(out, spark, "hour_stream").collect()
        }
        assert len(got) >= 2  # last hour may be held back by the watermark
        for k, v in got.items():
            np.testing.assert_almost_equal(v, batch[k], decimal=9)


class TestContinuousAggregate:
    def test_stream_materializes_into_store(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.sources.store import TierStore
        from usgs_geomag_algorithms_spark.streaming.continuous import (
            continuous_aggregate,
        )

        pages = generate_pages(spark, n_urls=3, hours=0.5, gap_pct=3.0, n_hot=3)
        path = str(tmp_path / "pages")
        pages.write.parquet(path)
        store = TierStore(spark, str(tmp_path / "tiers"), n_buckets=4)

        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .parquet(path)
            .select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("event_ts"),
                F.length("text").cast("double").alias("value"),
                F.lit("text_len").alias("channel"),
            )
        )
        q = continuous_aggregate(
            stream, SEC_MIN, store, "minute",
            checkpoint_dir=str(tmp_path / "ckpt"),
            watermark="10 seconds", trigger_available_now=True,
        )
        q.awaitTermination(180)

        stored = {
            (r.url, r.t_us): r.value for r in store.read("minute").collect()
        }
        assert len(stored) > 0
        # stored values equal the batch operator's on common slots
        sig = page_signals(spark.read.parquet(path), channels=("text_len",))
        batch = {
            (r.url, r.t_us): r.value
            for r in rollup_step(
                sig, SEC_MIN,
                range_start_us=T0, range_end_us=T0 + (1800 - 1) * US,
            ).collect()
        }
        common = set(stored) & set(batch)
        assert len(common) > 0
        for k in common:
            bv, sv = batch[k], stored[k]
            assert (bv is None and sv is None) or abs(bv - sv) < 1e-9
        # lineage recorded per epoch
        assert any(
            r["run_id"].startswith("stream-epoch-")
            for r in store.read_lineage("minute")
        )

    def test_replay_is_idempotent(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.sources.store import TierStore
        from usgs_geomag_algorithms_spark.streaming.continuous import (
            continuous_aggregate,
        )

        pages = generate_pages(spark, n_urls=2, hours=0.25, n_hot=2)
        path = str(tmp_path / "pages")
        pages.write.parquet(path)
        store = TierStore(spark, str(tmp_path / "tiers"), n_buckets=4)

        def run(ckpt):
            stream = (
                spark.readStream.schema(spark.read.parquet(path).schema)
                .parquet(path)
                .select(
                    "url",
                    F.col("warc_ts").cast("timestamp").alias("event_ts"),
                    F.length("text").cast("double").alias("value"),
                    F.lit("text_len").alias("channel"),
                )
            )
            q = continuous_aggregate(
                stream, SEC_MIN, store, "minute",
                checkpoint_dir=str(tmp_path / ckpt),
                watermark="10 seconds", trigger_available_now=True,
            )
            q.awaitTermination(180)

        run("ckpt1")
        first = sorted(map(tuple, store.read("minute").collect()))
        run("ckpt2")  # full replay from scratch -> same upserts
        second = sorted(map(tuple, store.read("minute").collect()))
        assert first == second

    def test_restart_resumes_from_checkpoint(self, spark, tmp_path):
        """The north-star resumability contract on the streaming path: a
        NEW query on the SAME checkpoint continues from committed offsets
        — the first run's files are not reprocessed, late-arriving files
        are, and the store ends equal to the batch compute over
        everything."""
        from usgs_geomag_algorithms_spark.sources.store import TierStore
        from usgs_geomag_algorithms_spark.streaming.continuous import (
            continuous_aggregate,
        )

        all_pages = generate_pages(spark, n_urls=2, hours=0.5, n_hot=2)
        # first 15 min at ingest, rest arrives "later"
        cut = F.timestamp_seconds(F.lit(BASE_EPOCH + 900))
        path = str(tmp_path / "pages")
        all_pages.where(F.col("warc_ts") < cut).write.mode("append").parquet(
            path
        )

        def run(run_id):
            stream = (
                spark.readStream.schema(spark.read.parquet(path).schema)
                .parquet(path)
                .select(
                    "url",
                    F.col("warc_ts").cast("timestamp").alias("event_ts"),
                    F.length("text").cast("double").alias("value"),
                    F.lit("text_len").alias("channel"),
                )
            )
            q = continuous_aggregate(
                stream, SEC_MIN, store, "minute",
                checkpoint_dir=str(tmp_path / "ckpt_resume"),
                watermark="10 seconds", trigger_available_now=True,
            )
            q.awaitTermination(180)
            return q

        store = TierStore(spark, str(tmp_path / "tiers"), n_buckets=4)
        run("r1")
        epochs_r1 = sum(
            1
            for r in store.read_lineage("minute")
            if r["run_id"].startswith("stream-epoch-")
        )
        # later files land after the first query is gone
        all_pages.where(F.col("warc_ts") >= cut).write.mode(
            "append"
        ).parquet(path)
        run("r2")
        epochs_r2 = sum(
            1
            for r in store.read_lineage("minute")
            if r["run_id"].startswith("stream-epoch-")
        )
        assert epochs_r2 > epochs_r1  # the restart processed NEW epochs

        stored = {
            (r.url, r.t_us): r.value for r in store.read("minute").collect()
        }
        sig = page_signals(spark.read.parquet(path), channels=("text_len",))
        batch = {
            (r.url, r.t_us): r.value
            for r in rollup_step(
                sig, SEC_MIN,
                range_start_us=T0, range_end_us=T0 + (1800 - 1) * US,
            ).collect()
        }
        common = set(stored) & set(batch)
        assert len(common) > 0
        for k in common:
            bv, sv = batch[k], stored[k]
            assert (bv is None and sv is None) or abs(bv - sv) < 1e-9
        # and slots from BOTH ingest eras are present (resume didn't
        # skip the new files or double-apply the old ones)
        assert any(t < T0 + 900_000_000 for _, t in stored)
        assert any(t >= T0 + 900_000_000 for _, t in stored)


class TestLambdaReconcile:
    def test_late_data_gap_filled_by_batch_refresh(self, spark, tmp_path):
        """The documented handoff: data later than the watermark never
        reaches the streaming path; the batch incremental refresh fills the
        hole from the materialized finer tier — same store, same merge."""
        from usgs_geomag_algorithms_spark.plans.refresh import run_as_update
        from usgs_geomag_algorithms_spark.sources.store import TierStore
        from usgs_geomag_algorithms_spark.streaming.continuous import (
            continuous_aggregate,
        )

        pages = generate_pages(spark, n_urls=2, hours=1.0, n_hot=2)
        # "late" slice: minutes 20-39 arrive after the stream has closed
        lo_us = T0 + 20 * 60 * US
        hi_us = T0 + 40 * 60 * US - US
        on_time = pages.where(
            ~F.col("warc_ts").cast("timestamp").cast("long")
            .between(lo_us // US, hi_us // US)
        )
        path = str(tmp_path / "pages_ontime")
        on_time.write.parquet(path)

        store = TierStore(spark, str(tmp_path / "tiers"), n_buckets=4)

        def sig(df):
            return df.select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("event_ts"),
                F.length("text").cast("double").alias("value"),
                F.lit("text_len").alias("channel"),
            )

        # streaming path builds the minute tier from on-time pages only
        stream = spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
        q = continuous_aggregate(
            sig(stream), SEC_MIN, store, "minute",
            checkpoint_dir=str(tmp_path / "ckpt"),
            watermark="10 seconds", trigger_available_now=True,
        )
        q.awaitTermination(180)
        streamed = {r.t_us for r in store.read("minute").collect()}
        missing = {
            T0 + m * 60 * US for m in range(21, 39)
        }  # interior late minutes
        assert streamed.isdisjoint(missing)

        # batch side: the second tier is materialized from the FULL pages
        # table (the bulk backfill path), then run_as_update fills minute
        sig_all = page_signals(pages, channels=("text_len",))
        store.write(sig_all, "second")
        m = run_as_update(
            store, "second", "minute", SEC_MIN,
            start_us=T0 + 60 * US, end_us=T0 + 59 * 60 * US,
            update_limit=0,
        )
        assert m["gaps_filled"] >= 1

        got = {r.t_us: r.value for r in store.read("minute").collect()}
        full = {
            (r.t_us): r.value
            for r in rollup_step(
                sig_all.select(
                    "url", "channel",
                    F.unix_micros("event_ts").alias("t_us")
                    if "event_ts" in sig_all.columns else F.col("t_us"),
                    "value",
                ),
                SEC_MIN,
                range_start_us=T0, range_end_us=T0 + 3600 * US - US,
            ).collect()
        }
        for t in missing:
            assert t in got  # hole closed
            if full.get(t) is None or got[t] is None:
                assert full.get(t) == got[t]
            else:
                np.testing.assert_almost_equal(got[t], full[t], decimal=9)


class TestStreamingDedup:
    def test_exact_dup_dropped_at_ingest(self, spark, tmp_path):
        from usgs_geomag_algorithms_spark.streaming.dedup_stream import (
            streaming_exact_dedup,
        )

        rows = [
            (0, "the same document body", T0),
            (1, "the same document body", T0 + 30 * US),   # dup, later ts
            (2, "a different document", T0 + 60 * US),
            (3, "the same document body", T0 + 90 * US),   # dup again
            (4, "a different document", T0 + 120 * US),    # dup of 2
        ]
        df = spark.createDataFrame(
            [(i, t, us // US) for i, t, us in rows],
            "doc_id long, text string, epoch_s long",
        ).select(
            "doc_id", "text", F.col("epoch_s").cast("timestamp").alias("event_ts")
        )
        path = str(tmp_path / "docs")
        df.coalesce(1).write.parquet(path)

        stream = spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
        out = streaming_exact_dedup(stream, watermark="10 minutes")
        got = drain(out, spark, "dedup_stream").collect()
        # one survivor per distinct content hash
        assert len(got) == 2
        assert {r.text for r in got} == {
            "the same document body", "a different document",
        }
        # the survivor carries the dedup identity column
        assert all(len(r.content_hash) == 64 for r in got)

    def test_state_bounded_by_watermark_eviction(self, spark, tmp_path):
        """The reason this scales to an unbounded firehose: state rows
        are EVICTED as the watermark passes their horizon (asserted via
        the state-operator metrics), so state is O(rate x horizon) —
        plain dropDuplicates would grow forever. Dedup WITHIN the
        horizon is guaranteed; a re-arrival beyond it is unspecified
        (Spark may still drop it best-effort), which is why exact
        cross-horizon dedup stays a batch job."""
        from usgs_geomag_algorithms_spark.streaming.dedup_stream import (
            streaming_exact_dedup,
        )

        import glob
        import os as _os
        import shutil

        schema = "doc_id long, text string, epoch_s long"
        src = str(tmp_path / "src")
        _os.makedirs(src)
        batches = [
            [(0, "recurring body", T0 // US),
             (1, "recurring body", T0 // US + 60)],  # in-horizon dup
            # 2 h later: advances the watermark far past batch 0's
            # 10 min horizon -> doc 0's state row must be evicted
            [(2, "advance the watermark", T0 // US + 7200)],
            [(3, "advance more", T0 // US + 14400)],
        ]
        for i, rows in enumerate(batches):
            staged = str(tmp_path / f"b{i}")
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                staged
            )
            dst = f"{src}/b{i}.parquet"
            shutil.copy(glob.glob(staged + "/*.parquet")[0], dst)
            # FileStreamSource orders by mtime: one file per micro-batch
            _os.utime(dst, (1_000_000 + i, 1_000_000 + i))

        stream = (
            spark.readStream.schema(
                "doc_id long, text string, epoch_s long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select(
                "doc_id", "text",
                F.col("epoch_s").cast("timestamp").alias("event_ts"),
            )
        )
        out = streaming_exact_dedup(stream, watermark="10 minutes")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_evict")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(
            r.doc_id
            for r in spark.sql("SELECT doc_id FROM dedup_evict").collect()
        )
        # in-horizon duplicate (doc 1) guaranteed dropped; survivors kept
        assert ids == [0, 2, 3]
        removed = sum(
            p["stateOperators"][0]["numRowsRemoved"]
            for p in q.recentProgress
            if p["stateOperators"]
        )
        final_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p["stateOperators"]
        ][-1]
        assert removed >= 1            # horizon-passed state was evicted
        assert final_rows < len(ids)   # state does NOT accumulate history
