"""Mergeable t-digest quantile sketches as a retention tier.

The exact percentile tier (``operators/rollup.py::quantile_rollup``) is
affordable only because its groups are bounded by the decimation ratio;
quantiles over UNBOUNDED groups (raw samples per bucket) cannot roll up:
an hour's p95 tells you nothing about the day's p95, so a naive
continuous aggregate re-sorts raw data for every coarser tier, and the
fixed-bin histogram tier (``histogram_rollup``) trades that for a preset
bin grid that must be chosen before the data is seen. The standard fix
is a MERGEABLE quantile sketch per fine bucket — here Dunning's t-digest
(arXiv:1902.04023), built as fully vectorized NumPy kernels — so every
coarser tier derives by merging fine-tier digests, exactly like the
boxcar tiers derive day from hour (tiers.py) and the HLL tier unions
sketches (operators/sketches.py): raw samples are read once, at the
finest tier.

Scale shape (the part that matters at 100 TB): the hour tier build is
DUAL-MODE. Default: one shuffle of the skinny raw rows keyed (series,
bucket), then one VECTORIZED digest build per partition covering all
its buckets — right when the input's partitioning does not cluster
bucket keys (an upstream aggregate hash-partitioned on a finer key),
where map-side "partials" would emit nearly one fat digest row per
input row and were measured 3x slower. ``partial=True``: a map-side
``mapInPandas`` pass turns each input partition's rows into
per-(series, bucket) PARTIAL digests (the hand-built analog of an
aggregate's partial state, since Spark has no pandas UDAF), then one
merge keyed (series, bucket) — the only shuffle carries centroid
arrays bounded by ``delta`` (~128 doubles), never the raw value
column; choose it for key-clustered input (a time-sorted store scan) —
the same adaptivity Spark's HashAggregate applies when partial
aggregation stops reducing. Either way, every per-group kernel runs
vectorized across ALL groups of a batch in one lexsort + reduceat
segment pass (:func:`_segment_compress`). Day-from-hour is a digest
merge whose input is already tier-sized; trailing windows
(:func:`tdigest_rolling`) explode the HOUR TIER to the window ends it
feeds — amplification bounded by calendar buckets, never corpus size.
Estimates are rank-approximate by construction -> the driver entries
are rows-only; the exact twins (``rollup_day_pctl``,
``rolling_p95_day``, same plan shapes with Spark's exact
``percentile``) carry the DuckDB oracles, and tests/test_tdigest.py
bounds the rank error and checks merge-vs-direct consistency.

Construction is the "one-shot" sorted build with the k1 scale function:
cluster boundaries fall at integer crossings of
``k(q) = delta * (asin(2q-1)/pi + 1/2)``, which concentrates clusters at
the tails (cluster width ~ sqrt(q(1-q))/delta in rank space). Sorting +
floor assignment is deterministic — no RNG — so digests are reproducible
across runs and partitionings of the SAME rows; different partial splits
produce different (equally valid) centroid sets, which is why parity
tests compare extracted quantiles, not bytes.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator, Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

#: compression factor — max ~delta+1 centroids per digest; rank error
#: near the median ~ O(1/delta), far tighter at the tails
DELTA = 128

_MAGIC = b"TD1\x00"


# --------------------------------------------------------------- kernels
def compress(
    means: np.ndarray, weights: np.ndarray, delta: int = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted points (or centroids) into <= delta+1 t-digest
    centroids — one vectorized pass: sort by mean, assign each point the
    integer cell of k1(q) at its weight-midpoint rank, segment-reduce.
    Total weight is preserved exactly; centroid means are weighted
    averages so they stay inside [min, max]."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    m = means[order]
    w = weights[order]
    total = w.sum()
    qmid = (np.cumsum(w) - 0.5 * w) / total
    # k1 scale, shifted to [0, delta]; qmid is strictly inside (0, 1)
    kk = delta * (np.arcsin(2.0 * qmid - 1.0) / np.pi + 0.5)
    cid = np.floor(kk).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
    ow = np.add.reduceat(w, starts)
    om = np.add.reduceat(w * m, starts) / ow
    return om, ow


def pack_digest(
    means: np.ndarray, weights: np.ndarray, vmin: float, vmax: float
) -> bytes:
    """Serialize centroids + exact extrema to a little-endian binary
    column value: magic, n (u32), min, max (f8), means[n], weights[n]."""
    m = np.ascontiguousarray(means, dtype="<f8")
    w = np.ascontiguousarray(weights, dtype="<f8")
    return (
        _MAGIC
        + struct.pack("<Idd", m.size, float(vmin), float(vmax))
        + m.tobytes()
        + w.tobytes()
    )


def unpack_digest(
    payload: bytes,
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Inverse of :func:`pack_digest`; raises ValueError on a foreign or
    truncated payload (a tier column should only ever hold our bytes)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a TD1 digest payload")
    n, vmin, vmax = struct.unpack_from("<Idd", payload, 4)
    need = 24 + 16 * n
    if len(payload) < need:
        raise ValueError("truncated TD1 digest payload")
    means = np.frombuffer(payload, "<f8", n, 24)
    weights = np.frombuffer(payload, "<f8", n, 24 + 8 * n)
    return means, weights, vmin, vmax


def digest_of(values: np.ndarray, delta: int = DELTA) -> bytes:
    """Build a packed digest from raw (unit-weight) values."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        raise ValueError("digest_of: no non-NaN values")
    m, w = compress(v, np.ones_like(v), delta)
    return pack_digest(m, w, v.min(), v.max())


def merge_digests(payloads: Iterable[bytes], delta: int = DELTA) -> bytes:
    """Merge packed digests into one: concatenate centroid sets, then
    one :func:`compress` pass; extrema are exact (min of mins)."""
    ms, ws, mns, mxs = [], [], [], []
    for p in payloads:
        m, w, mn, mx = unpack_digest(p)
        ms.append(m)
        ws.append(w)
        mns.append(mn)
        mxs.append(mx)
    m, w = compress(np.concatenate(ms), np.concatenate(ws), delta)
    return pack_digest(m, w, min(mns), max(mxs))


def digest_quantile(payload: bytes, qs: Sequence[float]) -> np.ndarray:
    """Extract quantiles: linear interpolation of the centroid means at
    their weight-midpoint cumulative ranks, anchored at the exact
    extrema (rank 0 -> min, rank W -> max)."""
    m, w, vmin, vmax = unpack_digest(payload)
    total = w.sum()
    c = np.cumsum(w) - 0.5 * w
    xs = np.r_[0.0, c, total]
    ys = np.r_[vmin, m, vmax]
    return np.interp(np.asarray(qs, dtype=np.float64) * total, xs, ys)


# ----------------------------------------------------------- Spark layer
def _segment_compress(codes, means, weights, delta):
    """The :func:`compress` kernel applied to MANY groups in one
    vectorized pass (the per-group-Python-call version costs ~0.5 ms/
    group in loop overhead — measured 10x slower at a few thousand
    groups/batch): lexsort by (group, mean), weighted in-group midpoint
    ranks via a base-subtracted global cumsum, k1 cells as group-offset
    segment ids, one ``reduceat``. Returns per-group centroid slices:
    (group_order_codes, seg_m, seg_w, gseg_starts, gseg_ends,
    group_starts, group_counts, order)."""
    order = np.lexsort((means, codes))
    c = codes[order]
    m = means[order]
    w = weights[order]
    n = len(c)
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    counts = np.diff(np.r_[starts, n])
    totals = np.add.reduceat(w, starts)
    cw = np.cumsum(w)
    base = np.repeat(np.r_[0.0, cw[starts[1:] - 1]], counts)
    qmid = (cw - base - 0.5 * w) / np.repeat(totals, counts)
    kk = np.floor(
        delta * (np.arcsin(np.clip(2.0 * qmid - 1.0, -1.0, 1.0)) / np.pi + 0.5)
    ).astype(np.int64)
    seg = c * (delta + 2) + kk  # group-major, cell-minor: non-decreasing
    seg_starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    seg_w = np.add.reduceat(w, seg_starts)
    seg_m = np.add.reduceat(w * m, seg_starts) / seg_w
    seg_grp = c[seg_starts]
    gseg_starts = np.flatnonzero(np.r_[True, seg_grp[1:] != seg_grp[:-1]])
    gseg_ends = np.r_[gseg_starts[1:], len(seg_grp)]
    return c, m, seg_m, seg_w, gseg_starts, gseg_ends, starts, counts, order


def _batch_digests(pdf, gcols: list, delta: int):
    """One digest per (gcols) group of a raw-value batch, vectorized
    across groups via :func:`_segment_compress`; only the final
    per-group ``pack_digest`` loops (~10 µs each). Returns
    (key_rows, digests, counts)."""
    codes = pdf.groupby(gcols, sort=False).ngroup().to_numpy()
    vals = pdf["_v"].to_numpy(dtype=np.float64)
    (c, m, seg_m, seg_w, ga, gb, starts, counts, order) = _segment_compress(
        codes, vals, np.ones_like(vals), delta
    )
    first_rows = order[starts]  # one original row index per group
    keys = pdf.iloc[first_rows][gcols].itertuples(index=False, name=None)
    digests = [
        pack_digest(seg_m[a:b], seg_w[a:b], m[s], m[s + k - 1])
        for a, b, s, k in zip(ga, gb, starts, counts)
    ]
    return list(keys), digests, counts.tolist()


def _batch_merge(pdf, gcols: list, delta: int):
    """Merge packed digests per (gcols) group, vectorized across groups:
    unpack rows (the only per-row loop), concatenate centroid arrays
    with per-row group codes, one :func:`_segment_compress`, exact
    extrema by ``minimum.reduceat`` over the stored mins/maxs. Returns
    (key_rows, digests, ns)."""
    codes = pdf.groupby(gcols, sort=False).ngroup().to_numpy()
    unpacked = [unpack_digest(bytes(b)) for b in pdf["digest"]]
    lens = np.array([len(u[0]) for u in unpacked])
    cat_m = np.concatenate([u[0] for u in unpacked])
    cat_w = np.concatenate([u[1] for u in unpacked])
    cat_codes = np.repeat(codes, lens)
    row_mn = np.array([u[2] for u in unpacked])
    row_mx = np.array([u[3] for u in unpacked])
    ns = pdf["n"].to_numpy(dtype=np.int64)
    ro = np.argsort(codes, kind="stable")
    rstarts = np.flatnonzero(
        np.r_[True, codes[ro][1:] != codes[ro][:-1]]
    )
    gmin = np.minimum.reduceat(row_mn[ro], rstarts)
    gmax = np.maximum.reduceat(row_mx[ro], rstarts)
    gn = np.add.reduceat(ns[ro], rstarts)
    keys = pdf.iloc[ro[rstarts]][gcols].itertuples(index=False, name=None)
    (_, _, seg_m, seg_w, ga, gb, _, _, _) = _segment_compress(
        cat_codes, cat_m, cat_w, delta
    )
    digests = [
        pack_digest(seg_m[a:b], seg_w[a:b], mn, mx)
        for a, b, mn, mx in zip(ga, gb, gmin, gmax)
    ]
    return list(keys), digests, gn.tolist()


def _tier_schema(df: DataFrame, series_cols: Sequence[str]) -> str:
    parts = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in set(series_cols)
    ]
    return ", ".join(parts + ["t_us long", "digest binary", "n long"])


def tdigest_tier(
    sig: DataFrame,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "value",
    delta: int = DELTA,
    partial: bool = False,
) -> DataFrame:
    """(series, t_us, digest, n): the storable quantile-sketch tier over
    an unbounded-cardinality signal.

    Default (``partial=False``): ONE shuffle of the skinny raw rows
    keyed (series, bucket), then one vectorized digest build per
    partition covering all its buckets — the same shuffle shape as the
    boxcar tiers. This is the right plan when the input's partitioning
    does not cluster bucket keys (e.g. the output of an upstream
    aggregate, hash-partitioned on a finer key): a map-side "partial"
    there would emit nearly one digest row per input row — a FATTER
    relation than the raw rows — and was measured 3x slower at 8M rows.

    ``partial=True``: map-side partial digests per input partition
    (mapInPandas, the hand-built partial-aggregate state), then the
    merge shuffle carries centroid arrays only. Choose this when input
    partitions are key-clustered — a time-sorted store scan, a kafka
    partition per series — where partials genuinely collapse many rows
    per (bucket, partition). This is the same adaptivity Spark's own
    HashAggregate applies when a partial aggregate stops reducing."""
    series_cols = list(series_cols)
    v = F.col(value_col)
    keyed = sig.where(v.isNotNull() & ~F.isnan(v)).select(
        *series_cols,
        F.expr(f"({ts_col} div {out_us}) * {out_us}").alias("t_us"),
        v.cast("double").alias("_v"),
    )
    schema = _tier_schema(keyed, series_cols)
    gcols = series_cols + ["t_us"]

    if not partial:

        def _build_all(batches: Iterator) -> Iterator:
            import pandas as pd

            parts = [p for p in batches if not p.empty]
            if not parts:
                return
            pdf = (
                pd.concat(parts, ignore_index=True)
                if len(parts) > 1
                else parts[0]
            )
            keys, digests, ns = _batch_digests(pdf, gcols, delta)
            out = pd.DataFrame(keys, columns=gcols)
            out["digest"] = digests
            out["n"] = ns
            yield out

        return keyed.repartition(*gcols).mapInPandas(
            _build_all, schema=schema
        )

    def _partials(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            keys, digests, ns = _batch_digests(pdf, gcols, delta)
            out = pd.DataFrame(keys, columns=gcols)
            out["digest"] = digests
            out["n"] = ns
            yield out

    partial_df = keyed.mapInPandas(_partials, schema=schema)
    return _merge_by_key(partial_df, gcols, schema, delta)


def _merge_by_key(
    digests: DataFrame, gcols: list, schema: str, delta: int
) -> DataFrame:
    """Merge digest rows per (gcols) key: hash-repartition on the key
    (all rows of a key land in one partition), then ONE vectorized
    merge per partition across all its keys (mapInPandas draining the
    partition — per-partition rows are bounded by tier cardinality /
    parallelism, the raw samples are long gone). applyInPandas would
    pay per-group Python overhead at every key instead."""

    def _merge_all(batches: Iterator) -> Iterator:
        import pandas as pd

        parts = [p for p in batches if not p.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        keys, ds, ns = _batch_merge(pdf, gcols, delta)
        out = pd.DataFrame(keys, columns=gcols)
        out["digest"] = ds
        out["n"] = ns
        yield out

    return digests.repartition(*gcols).mapInPandas(_merge_all, schema=schema)


def tdigest_rollup(
    fine: DataFrame,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    delta: int = DELTA,
) -> DataFrame:
    """Derive a coarser quantile tier by MERGING fine-tier digests —
    never re-reading raw samples. Input/output schema: series + t_us +
    digest + n."""
    series_cols = list(series_cols)
    rekeyed = fine.select(
        *series_cols,
        F.expr(f"(t_us div {out_us}) * {out_us}").alias("t_us"),
        "digest",
        "n",
    )
    schema = _tier_schema(rekeyed, series_cols)
    return _merge_by_key(rekeyed, series_cols + ["t_us"], schema, delta)


def tdigest_quantiles(
    tier: DataFrame,
    ps: Sequence[float] = (0.5, 0.95),
    digest_col: str = "digest",
    round_dp: int | None = 4,
) -> DataFrame:
    """Serve quantiles off a digest tier: one ``p<nn>`` column per
    requested quantile (same naming as quantile_rollup so the sketch
    tier is a drop-in beside the exact one) + ``n_values``. The
    extraction UDF is Arrow-batched over tier rows — bounded by tier
    cardinality, the raw samples are long gone."""
    from pyspark.sql.pandas.functions import pandas_udf

    ps = list(ps)

    @pandas_udf("array<double>")
    def _extract(col):
        import pandas as pd

        return pd.Series(
            [digest_quantile(p, ps).tolist() for p in col]
        )

    qcol = _extract(F.col(digest_col))
    out = []
    for i, p in enumerate(ps):
        c = F.element_at(qcol, i + 1)
        if round_dp is not None:
            c = F.round(c, round_dp)
        out.append(c.alias(f"p{str(p).replace('0.', '').ljust(2, '0')}"))
    keep = [c for c in tier.columns if c not in (digest_col, "n")]
    return tier.select(*keep, *out, F.col("n").alias("n_values"))


# ------------------------------------------------------ store integration
#
# Digest tiers persist through the SAME snapshot-manifest TierStore as the
# signal and HLL tiers (value_schema="digest binary, n long") and inherit
# partition pruning, snapshot isolation, optimistic upsert (a recomputed
# bucket REPLACES its digest — merging on upsert would double-count
# re-ingested samples), retention drops, and time travel, unchanged.


def tdigest_store(spark, root: str, series_col: str = "series"):
    """A TierStore configured for digest tiers."""
    from ..sources.store import TierStore

    return TierStore(
        spark,
        root,
        series_cols=(series_col,),
        value_schema="digest binary, n long",
    )


def tdigest_rolling(
    hour_tier: DataFrame,
    window_buckets: int = 24,
    bucket_us: int = HOUR_US,
    series_cols: Sequence[str] = ("series",),
    delta: int = DELTA,
) -> DataFrame:
    """Trailing-window digests ending at each PRESENT bucket — the
    quantile analog of the sliding distinct count
    (``operators/sketches.py::rolling_users_sketch``): a trailing-24h
    p95 recomputed exactly needs every window's raw samples re-sorted
    (the expand plan's 24x amplification over RAW rows); here each
    hour-tier digest row explodes to the ``window_buckets`` window ends
    it feeds — the amplified relation is bounded by calendar buckets,
    never corpus size — and one :func:`_merge_by_key` pass merges each
    window's <=24 digests. Output rows are restricted to window ends
    that are themselves present buckets (matching the exact twin's row
    set). Schema: series + t_us + digest + n."""
    series_cols = list(series_cols)
    gcols = series_cols + ["t_us"]
    span = (int(window_buckets) - 1) * bucket_us
    exploded = hour_tier.select(
        *series_cols,
        F.explode(
            F.expr(f"sequence(t_us, t_us + {span}, {bucket_us})")
        ).alias("t_us"),
        "digest",
        "n",
    )
    present = hour_tier.select(*gcols)
    schema = _tier_schema(exploded, series_cols)
    merged = _merge_by_key(exploded, gcols, schema, delta)
    return merged.join(present, gcols)
