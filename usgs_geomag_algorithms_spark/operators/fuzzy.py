"""Blocked fuzzy-match join: entity resolution by edit distance.

The string sibling of the LSH near-dup join (``operators/dedup.py``):
where MinHash banding buckets by set similarity, entity resolution
(titles, product names, observatory station labels) buckets by a cheap
BLOCKING key and pays the quadratic comparison only inside each bucket —
the classic ER blocking pattern.  An all-pairs Levenshtein over 10^12
rows is impossible; block-local pairs are linear in Σ|bucket|², which
the blocking key keeps tiny (prefix/phonetic/length-band keys in
production; a tighter key trades recall for cost, exactly like LSH band
width).

Scale shape: one self-equi-join on the block key (hash exchange on the
key the relation already carries), distance evaluated inside codegen
(``levenshtein`` is a JVM builtin — no Python), output bounded by
matched pairs.  Hot blocks (e.g. an empty-title block) are the skewed
keys — AQE skew-join is the backstop, and production keys should fold a
length band into the block to cap bucket size.

Determinism: Levenshtein is an integer DP — exactly reproducible in
DuckDB for ASCII inputs.  (Caveat for the oracle only: DuckDB computes
edit distance over BYTES, Spark over CHARACTERS — they diverge on
non-ASCII strings, e.g. 'héllo'→'hello' is 1 in Spark, 2 in DuckDB.
The driver corpus is pure ASCII; production correctness does not depend
on the oracle's byte/char agreement.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    key: Column,
    block: Column,
    max_dist: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` whose ``key``
    strings are within ``max_dist`` edits, compared only within equal
    ``block`` values (missed cross-block matches are the documented
    recall trade, as with LSH banding)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0: {max_dist}")
    t = df.select(
        F.col(id_col).alias("_id"), key.alias("_k"), block.alias("_b")
    )
    a = t.select(
        F.col("_id").alias("id_a"), F.col("_k").alias("_ka"), "_b"
    )
    b = t.select(
        F.col("_id").alias("id_b"), F.col("_k").alias("_kb"), "_b"
    )
    pairs = a.join(b, "_b").where(F.col("id_a") < F.col("id_b"))
    dist = F.levenshtein(F.col("_ka"), F.col("_kb"))
    return (
        pairs.select("id_a", "id_b", dist.alias("dist"))
        .where(F.col("dist") <= max_dist)
    )
