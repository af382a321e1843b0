"""Tier table store: partitioned-parquet tables with Iceberg-style layout.

The Iceberg jars are not in this container, so the store implements the same
operational surface on plain parquet:

- partition spec ``(p_date, p_bucket)`` — days(bucket_ts) × bucket(url-hash)
  — the layout the 100 TB deployment would declare as an Iceberg partition
  spec; ``p_bucket`` spreads hot domains (salting knob ``n_buckets``)
- dynamic partition overwrite (Spark's ``partitionOverwriteMode=dynamic``)
  stands in for ``MERGE INTO``: refresh rewrites exactly the touched
  (day × bucket) partitions, idempotently
- retention = partition directory drops (Iceberg ``expire``/partition drop)
- upsert = read-modify-write of the touched partitions with last-wins merge
  (the reference's ``put_timeseries`` merge behavior,
  ``geomagio/TimeseriesFactory.py:249-288``)

Reads prune on the partition column: a time-range query touches only its
``p_date`` directories (verified in tests via the file-source plan).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tiers import US
from ..operators.merge import merge_last_wins

DATA_COLS = ("url", "channel", "t_us", "value")


def _atomic_swap_dirs(live: str, staged: str) -> None:
    """Replace directory ``live`` with ``staged`` without any window in
    which ``live`` is missing.

    Uses Linux ``renameat2(RENAME_EXCHANGE)`` (atomic swap; the staged dir
    ends up holding the old contents and is removed afterwards). Falls back
    to rename-aside (live -> live.__old__, staged -> live) on kernels/
    filesystems without RENAME_EXCHANGE — crash-safe in every interleaving
    (the data always exists under one of the two names; a crash never
    deletes anything that was not already replaced)."""
    import ctypes
    import shutil

    swapped = False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        AT_FDCWD = -100
        RENAME_EXCHANGE = 2
        rc = libc.renameat2(
            AT_FDCWD,
            os.fsencode(staged),
            AT_FDCWD,
            os.fsencode(live),
            RENAME_EXCHANGE,
        )
        swapped = rc == 0
    except Exception:
        swapped = False
    if swapped:
        shutil.rmtree(staged)  # now holds the pre-swap contents
        return
    old = live + ".__old__"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(staged, live)
    shutil.rmtree(old)


class TierStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        series_cols: Sequence[str] = ("url", "channel"),
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self.series_cols = list(series_cols)
        os.makedirs(self.root, exist_ok=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ------------------------------------------------------------ layout
    def path(self, tier: str) -> str:
        return f"{self.root}/{tier}"

    def _partitioned(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "p_date", F.date_format(F.timestamp_micros(F.col("t_us")), "yyyy-MM-dd")
        ).withColumn(
            "p_bucket",
            F.pmod(F.xxhash64(F.col(self.series_cols[0])), F.lit(self.n_buckets)).cast(
                "int"
            ),
        )

    # ------------------------------------------------------------- write
    def write(self, df: DataFrame, tier: str) -> None:
        """Dynamic-partition overwrite: only the (p_date, p_bucket)
        partitions present in ``df`` are replaced."""
        (
            self._partitioned(df)
            .write.mode("overwrite")
            .partitionBy("p_date", "p_bucket")
            .parquet(self.path(tier))
        )

    def upsert(self, df: DataFrame, tier: str) -> None:
        """Read-modify-write merge into existing partitions (last-wins, new
        data preferred, gaps never clobber values) — the MERGE INTO analog."""
        if not self.exists(tier):
            self.write(df, tier)
            return
        new_part = self._partitioned(df)
        # touched-partition keys as a broadcast semi-join, not an O(n)
        # chained OR predicate: a wide refresh (a year x 16 buckets) would
        # otherwise build a ~6k-term Catalyst OR tree (analyzer blowup),
        # and the p_date terms would not prune the scan. The key list is
        # still bounded (dates x buckets), so broadcast is always safe.
        touched_keys = new_part.select("p_date", "p_bucket").distinct()
        n_touched = touched_keys.count()
        if n_touched == 0:
            return
        old_touched = (
            self._partitioned(self.read(tier))
            .join(F.broadcast(touched_keys), ["p_date", "p_bucket"], "leftsemi")
            .drop("p_date", "p_bucket")
        )
        merged = merge_last_wins(
            old_touched, df.select(*self.series_cols, "t_us", "value"),
            series_cols=self.series_cols,
        )
        self.write(merged, tier)

    # -------------------------------------------------------------- read
    def exists(self, tier: str) -> bool:
        return os.path.exists(self.path(tier))

    def _schema(self) -> str:
        cols = ", ".join(f"{c} string" for c in self.series_cols)
        return f"{cols}, t_us long, value double"

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], schema=self._schema())

    def read(
        self,
        tier: str,
        start_us: int | None = None,
        end_us: int | None = None,
    ) -> DataFrame:
        base = self.path(tier)
        # a tier written from an empty frame has no data files; reads must
        # still succeed with the fixed schema
        has_data = any(
            True
            for root, _dirs, files in os.walk(base)
            for f in files
            if f.endswith(".parquet")
        ) if os.path.exists(base) else False
        if not has_data:
            return self._empty()
        df = self.spark.read.parquet(base)
        if start_us is not None:
            # partition-pruning predicate on p_date plus the exact t_us range
            d0 = time.strftime("%Y-%m-%d", time.gmtime(start_us // US))
            df = df.where(F.col("p_date") >= d0).where(F.col("t_us") >= int(start_us))
        if end_us is not None:
            d1 = time.strftime("%Y-%m-%d", time.gmtime(end_us // US))
            df = df.where(F.col("p_date") <= d1).where(F.col("t_us") <= int(end_us))
        return df.select(*self.series_cols, "t_us", "value")

    # ------------------------------------------------------------- stats
    def stats(self, tier: str) -> dict:
        """One-aggregate tier profile for monitoring dashboards: row count,
        valid fraction, time span, and approx distinct series (HLL sketch —
        exact distinct over 10^8 urls would itself be a shuffle)."""
        df = self.read(tier)
        v = F.col("value")
        r = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count(F.when(v.isNotNull() & ~F.isnan(v), True)).alias("valid"),
            F.min("t_us").alias("t_min"),
            F.max("t_us").alias("t_max"),
            F.approx_count_distinct(self.series_cols[0]).alias("approx_series"),
        ).first()
        return {
            "tier": tier,
            "rows": r.rows,
            "valid_rows": r.valid,
            "t_min_us": r.t_min,
            "t_max_us": r.t_max,
            "approx_series": r.approx_series,
        }

    # --------------------------------------------------------- compaction
    def compact(self, tier: str, target_files_per_partition: int = 1) -> dict:
        """Rewrite each (p_date, p_bucket) partition's accumulated small
        files into ``target_files_per_partition`` — the Iceberg
        ``rewrite_data_files`` analog. Upserts rewrite whole partitions,
        but streaming epochs and repeated refreshes accrete files; at
        cluster scale unbounded file counts degrade scan planning, so
        compaction is a first-class maintenance op.

        Values are unchanged (asserted in tests); the rewrite is one
        dynamic-partition overwrite reusing the store's own layout."""
        import glob

        import shutil

        if tier.endswith("_packed"):
            raise ValueError(
                "compact() operates on long-layout tiers; packed tiers are "
                "rewritten by write_packed"
            )
        base = self.path(tier)
        before = len(glob.glob(f"{base}/*/*/*.parquet"))
        if before == 0:
            # a fully-expired or empty tier dir has no data files; reading
            # it would fail schema inference — nothing to compact
            return {"tier": tier, "files_before": 0, "files_after": 0}
        df = self.spark.read.parquet(base).select(
            *self.series_cols, "t_us", "value"
        )
        part = self._partitioned(df)
        if target_files_per_partition <= 1:
            # hash-repartition on the partition cols: every (p_date,
            # p_bucket) lands whole in one task -> one file per partition
            compacted = part.repartition(F.col("p_date"), F.col("p_bucket"))
        else:
            salt = F.pmod(
                F.xxhash64(*self.series_cols, F.col("t_us")),
                F.lit(int(target_files_per_partition)),
            )
            compacted = part.repartition(F.col("p_date"), F.col("p_bucket"), salt)
        # rewrite into a sibling dir, then swap (a scan must never overlap
        # an in-place overwrite of its own input files)
        tmp = f"{base}.__compact__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # leftover from a crashed compact
        (
            compacted.write.mode("overwrite")
            .partitionBy("p_date", "p_bucket")
            .parquet(tmp)
        )
        # atomic exchange: no window with the tier missing, and a crash at
        # any point leaves the tier readable under its live name
        _atomic_swap_dirs(base, tmp)
        after = len(glob.glob(f"{base}/*/*/*.parquet"))
        return {"tier": tier, "files_before": before, "files_after": after}

    # ----------------------------------------------------- packed segments
    def write_packed(
        self, df: DataFrame, tier: str, segment_us: int = 86400 * US
    ) -> None:
        """Persist a tier Gorilla-packed: one binary segment row per
        (series, segment window) — XOR-encoded values + delta-of-delta
        timestamps (``operators/segments.py``) under the same
        ``(p_date, p_bucket)`` partition spec as the long layout, so
        retention partition-drops and bucket clustering apply unchanged.
        The coarse tiers' long-term storage format per BASELINE."""
        from ..operators.segments import pack_segments

        segs = pack_segments(df, segment_us, self.series_cols)
        out = segs.withColumn(
            "p_date",
            F.date_format(F.timestamp_micros(F.col("seg_start_us")), "yyyy-MM-dd"),
        ).withColumn(
            "p_bucket",
            F.pmod(F.xxhash64(F.col(self.series_cols[0])), F.lit(self.n_buckets)).cast(
                "int"
            ),
        )
        path = self.path(f"{tier}_packed")
        (
            out.write.mode("overwrite")
            .partitionBy("p_date", "p_bucket")
            .parquet(path)
        )
        with open(f"{path}/_segment_meta.json", "w") as f:
            json.dump({"segment_us": int(segment_us)}, f)

    def read_packed(
        self,
        tier: str,
        start_us: int | None = None,
        end_us: int | None = None,
    ) -> DataFrame:
        """Range-read a packed tier back as long rows. Pruning happens at
        *segment* granularity before any decode runs: the p_date/seg_start
        predicates reach the parquet scan, and only surviving segments pay
        the Arrow unpack; exact t_us trimming follows after decode."""
        from ..operators.segments import unpack_segments

        base = self.path(f"{tier}_packed")
        meta_path = f"{base}/_segment_meta.json"
        has_data = (
            any(
                True
                for _root, _dirs, files in os.walk(base)
                for fn in files
                if fn.endswith(".parquet")
            )
            if os.path.exists(base)
            else False
        )
        if not has_data:
            return self._empty()
        with open(meta_path) as f:
            segment_us = json.load(f)["segment_us"]
        segs = self.spark.read.parquet(base)
        if start_us is not None:
            # a segment starting before start_us may still contain it
            d0 = time.strftime(
                "%Y-%m-%d", time.gmtime(max(start_us - segment_us, 0) // US)
            )
            segs = segs.where(F.col("p_date") >= d0).where(
                F.col("seg_start_us") > int(start_us) - segment_us
            )
        if end_us is not None:
            d1 = time.strftime("%Y-%m-%d", time.gmtime(end_us // US))
            segs = segs.where(F.col("p_date") <= d1).where(
                F.col("seg_start_us") <= int(end_us)
            )
        rows = unpack_segments(
            segs.select(*self.series_cols, "seg_start_us", "n", "ts_codec", "val_codec"),
            self.series_cols,
        )
        if start_us is not None:
            rows = rows.where(F.col("t_us") >= int(start_us))
        if end_us is not None:
            rows = rows.where(F.col("t_us") <= int(end_us))
        return rows.select(*self.series_cols, "t_us", "value")

    # --------------------------------------------------------- retention
    def expire_before(self, tier: str, cutoff_us: int) -> list[str]:
        """Retention: drop whole day partitions older than the cutoff —
        a metadata-only delete (Iceberg partition drop analog)."""
        import shutil

        cutoff_date = time.strftime("%Y-%m-%d", time.gmtime(cutoff_us // US))
        dropped = []
        base = self.path(tier)
        if not os.path.exists(base):
            return dropped
        for name in sorted(os.listdir(base)):
            if name.startswith("p_date=") and name.split("=", 1)[1] < cutoff_date:
                shutil.rmtree(os.path.join(base, name))
                dropped.append(name)
        return dropped

    # --------------------------------------------------------- state tiers
    #
    # Per-series operator state (e.g. SqDist Holt-Winters JSON) as a
    # parquet table keyed by the series — the reference's statefile
    # (``SqDistAlgorithm.py:122-167``) scaled out to millions of series:
    # state flows executor<->disk, never through the driver.
    #
    # Layout is SNAPSHOT-VERSIONED (the Iceberg pattern): each write lands
    # a complete new generation ``v<n>/`` and atomically advances the
    # ``_CURRENT`` pointer (os.replace). Readers resolve the pointer at
    # plan time and keep reading their generation's immutable files even
    # while a writer lands the next one — no FileNotFound races against
    # lazy downstream plans — and a crash mid-write leaves the previous
    # generation current (the statefile advance-after-data-lands
    # contract). The last ``keep`` generations are retained; state rows
    # are tiny. Single-writer per state name.

    STATE_KEEP_GENERATIONS = 3

    def state_path(self, name: str) -> str:
        return f"{self.root}/_state_{name}"

    def _state_current(self, name: str) -> str | None:
        ptr = f"{self.state_path(name)}/_CURRENT"
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return f.read().strip() or None

    def write_state(self, state_df: DataFrame, name: str) -> None:
        """Merge ``state_df`` into the state table as a new generation:
        last-wins on the series key; series absent from ``state_df`` keep
        their old state."""
        import shutil

        base = self.state_path(name)
        os.makedirs(base, exist_ok=True)
        cur = self._state_current(name)
        new = state_df.select(*self.series_cols, "state_json")
        if cur is not None:
            prev = self.read_state(name)
            keep = prev.join(
                new.select(*self.series_cols), self.series_cols, "left_anti"
            )
            merged = keep.unionByName(new)
            n_next = int(cur[1:]) + 1
        else:
            merged = new
            n_next = 1
        gen = f"v{n_next:08d}"
        (
            merged.repartition(max(1, self.n_buckets // 4), *self.series_cols)
            .write.mode("overwrite")
            .parquet(f"{base}/{gen}")
        )
        tmp = f"{base}/_CURRENT.tmp"
        with open(tmp, "w") as f:
            f.write(gen)
        os.replace(tmp, f"{base}/_CURRENT")  # atomic pointer advance
        for d in sorted(os.listdir(base)):
            if d.startswith("v") and int(d[1:]) <= n_next - self.STATE_KEEP_GENERATIONS:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def read_state(self, name: str) -> DataFrame:
        """Per-series state table ``(series_cols..., state_json)`` at the
        current generation; empty frame when no state exists yet."""
        cur = self._state_current(name)
        cols = ", ".join(f"{c} string" for c in self.series_cols)
        if cur is None:
            return self.spark.createDataFrame(
                [], schema=f"{cols}, state_json string"
            )
        return self.spark.read.parquet(f"{self.state_path(name)}/{cur}").select(
            *self.series_cols, "state_json"
        )

    # ----------------------------------------------------- lineage & metrics
    def append_lineage(self, tier: str, records: list[dict]) -> None:
        """Per-partition lineage: which run produced which partition from
        which input coverage (append-only JSONL — tiny metadata)."""
        path = f"{self.root}/_lineage_{tier}.jsonl"
        with open(path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")

    def read_lineage(self, tier: str) -> list[dict]:
        path = f"{self.root}/_lineage_{tier}.jsonl"
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
