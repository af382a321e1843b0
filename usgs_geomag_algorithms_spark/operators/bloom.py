"""Deterministic Bloom-filter membership prefilter.

The 100 TB anti-join optimization: before an exact contamination /
membership join of a petabyte candidate corpus against a reference set
(benchmark test splits, an allow/deny list, yesterday's corpus), build a
small Bloom bitmap over the reference keys and probe it with a broadcast
join — candidates that miss the filter are DEFINITELY absent and skip
the exact join entirely; hits (including ~1% false positives) proceed to
the exact check (``operators/dedup.py::exact_dedup`` /
``__spark_entry__``'s ``contamination`` path).  The filter is thousands
of times smaller than a distinct-key broadcast, so it fits where the
exact key set cannot.

Everything is md5-derived and integer-exact, so the whole construction —
bit positions, bitmap words, probe verdicts — reproduces bit-for-bit in
DuckDB (the ``('0x' || substr(md5(s),1,8))::BIGINT`` pattern shared with
``operators/dedup.py``), making even the false positives exactly
oracle-checkable.

Representation: the m-bit filter is ``m/32`` words of 32 bits built with
a ``bit_or`` aggregate (map-side combinable; the word table is at most
``m/32`` rows regardless of key count).  32-bit words — not 64 — keep
every mask ≤ 2^31 so the words themselves are BIGINT-identical in both
engines (DuckDB raises on ``1::BIGINT << 63``; Java wraps silently — a
cross-engine trap).  The probe explodes each candidate into its k
positions, broadcast-joins the word table, and reduces with ``bool_and``
— one corpus scan, zero corpus-side shuffles beyond the final per-key
reduce (which reuses the candidate id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _position(key: Column, i: int, m_bits: int) -> Column:
    """i-th Bloom position of a key: 32-bit md5 prefix of ``key|i`` mod m
    — exact BIGINT math in both Spark and DuckDB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(f"|{i}")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(m_bits)).alias("p")


def build_bloom(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Bloom word table ``(word_idx: long, w: long)`` over the distinct
    keys — at most ``m_bits/32`` rows (absent rows are all-zero words).
    One distinct + one bit_or aggregate, both map-side combinable."""
    if m_bits % 32 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 32: {m_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    key = F.col(key_col)
    pos = keys.select(key.alias("key")).distinct().select(
        F.explode(
            F.array(*[_position(F.col("key"), i, m_bits) for i in range(k)])
        ).alias("p")
    )
    return pos.groupBy(F.expr("p div 32").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(1L, int(p % 32))")).alias("w")
    )


def bloom_probe(
    candidates: DataFrame,
    words: DataFrame,
    key_col: str,
    id_cols: tuple[str, ...],
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Probe: per candidate id, ``bloom_hit`` = all k bits set.

    The word table is broadcast (≤ m/32 rows); the candidate side stays
    shuffle-free until the final per-id ``bool_and`` reduce on the id it
    already carries."""
    key = F.col(key_col)
    probe = candidates.select(
        *id_cols,
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k)])
        ).alias("p"),
    )
    joined = probe.join(
        F.broadcast(words),
        F.expr("p div 32") == F.col("word_idx"),
        "left",
    )
    bit = F.expr("shiftleft(1L, int(p % 32))")
    hit = F.col("w").isNotNull() & (F.col("w").bitwiseAND(bit) != 0)
    return joined.groupBy(*id_cols).agg(
        F.bool_and(hit).alias("bloom_hit")
    )
