"""Sequence packing: lay a curated corpus out as fixed-length training
sequences (the GPT-style concat-and-chunk batch layout).

A pretraining loader consumes sequences of exactly ``seq_len`` tokens;
the build step must assign every document a position in that token
stream ahead of time, deterministically (so any worker can materialize
any shard independently and a re-run bit-reproduces the epoch):

- documents are ordered by a content-free hash of their id (the epoch
  'shuffle' — reproducible, resharding-safe, no RNG state);
- token counts accumulate in that order; a document's span is
  [start_offset, start_offset + n_tokens) in the concatenated stream;
- sequence (bin) ids are span / seq_len — documents may straddle a
  boundary (concat-and-chunk semantics; the loader slices, it never
  pads mid-stream).

Packing is PER STRATUM (``source``), matching how mixture weights are
applied per-domain before interleaving: each stratum's running sum is an
independent window, so the plan is one shuffle on the stratum key and a
per-stratum sort — embarrassingly parallel across strata, no global
total order. (A single-stream layout is the one-stratum special case;
at 10^12 documents a global sort is one range-partitioned exchange,
legitimate once per build, but the per-stratum form is both cheaper and
what mixture-weighted builds actually consume.)

All-integer outputs (offsets, bin ids) -> exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "source",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, stratum, n_tokens, start_offset, first_bin, last_bin): the
    document's place in its stratum's concatenated token stream.

    Order within a stratum is (md5(id), id) — the id tiebreak makes the
    window frame deterministic even under hash collisions, and hashing
    the id (not the text) keeps the epoch order independent of upstream
    edits to document content.

    ``tokens_col`` names a precomputed per-document token-count column
    (e.g. real BPE counts from ``bpe.bpe_tokenize``); the default counts
    whitespace tokens from ``text_col``."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if tokens_col is not None:
        n_tokens = F.col(tokens_col).cast("long")
    else:
        n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        df.select(id_col, stratum_col, n_tokens.alias("n_tokens"))
        .withColumn("_cum", cum)
        .select(
            id_col,
            stratum_col,
            "n_tokens",
            (F.col("_cum") - F.col("n_tokens")).alias("start_offset"),
            # BIGINT `div`, not double division + cast: offsets at corpus
            # scale can pass 2^53 where double arithmetic loses integers
            F.expr(f"(_cum - n_tokens) div {seq_len}").alias("first_bin"),
            F.expr(f"(_cum - 1) div {seq_len}").alias("last_bin"),
        )
    )


def sequence_manifest(
    packed: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """The LOADER side of the packing contract: one row per
    (sequence, contributing document) with exact token coordinates —
    (stratum, seq_id, id, doc_from, seq_from, n) means "tokens
    [doc_from, doc_from+n) of the document land at [seq_from, seq_from+n)
    of sequence seq_id". A worker materializing shard seq_id reads ONLY
    these rows (filter pushdown on seq_id/stratum), fetches the named
    documents, and slices — no scan of the corpus, no global state.

    Map-only off the packed table: each document explodes into its
    first_bin..last_bin span (amplification = ceil(n_tokens/seq_len) + 1,
    bounded by document length). All-integer arithmetic -> exact oracle.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    L = int(seq_len)
    b = F.col("seq_id")
    s = F.col("start_offset")
    e = F.col("start_offset") + F.col("n_tokens")
    lo = F.greatest(s, b * L)
    hi = F.least(e, (b + 1) * L)
    return (
        packed.withColumn(
            "seq_id", F.explode(F.expr("sequence(first_bin, last_bin)"))
        )
        .select(
            stratum_col,
            "seq_id",
            id_col,
            (lo - s).alias("doc_from"),
            (lo - b * L).alias("seq_from"),
            (hi - lo).alias("n"),
        )
        .where(F.col("n") > 0)
    )

def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "epoch0",
) -> DataFrame:
    """Deterministic epoch shuffle into loader shards: every row gets a
    (shard, pos) coordinate — shard by a salted content-free hash of the
    id, pos by rank of the hash within the shard.

    This is the distributed-dataloader contract of a pretraining build:
    worker ``w`` of ``W`` streams shards ``w, w+W, w+2W, ...`` in pos
    order and the epoch's global order is reproducible bit-for-bit from
    (ids, salt) alone — no RNG state, resharding-safe, and a different
    ``salt`` per epoch reshuffles without rewriting data.

    Scale shape: ONE hash exchange on shard + per-shard sort (the
    row_number window). Shards are the loader's parallel unit, so
    ``num_shards`` must scale with the corpus (10^12 docs wants
    ~10^4-10^5 shards, each a reducer-sized partition); the rank's sort
    key is (md5, id) — uniform by construction, no skew. All-integer
    output -> exact DuckDB oracle.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
        % F.lit(num_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        df.select(id_col, key.alias("_key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .select(id_col, "shard", F.col("pos").cast("long").alias("pos"))
    )
