"""Distributed BPE tokenizer training + corpus tokenization.

Byte-pair encoding (Sennrich et al. 2016) is THE canonical
training-data-pipeline job still missing from the webtext pack: before a
single model step, the tokenizer itself is trained over the corpus. This
module re-expresses it Spark-first, and — because every quantity involved
is an integer count or a string — the whole trainer is engine-exact and
carries a fully self-contained DuckDB oracle (each merge round unrolled
as CTEs that recompute their own argmax; no trained state smuggled in as
literals).

Algorithm contract (classic word-histogram BPE):

- train over the DISTINCT-word histogram, not the raw corpus — the
  standard trick that makes cost vocabulary-sized (10^7 rows) instead of
  corpus-sized (10^12 tokens). One corpus scan builds the histogram;
  every merge round after that touches only the vocab relation.
- a word starts as its character symbols plus a terminal ``</w>`` marker
  (so word-final units are distinct from word-internal ones).
- each round: count ADJACENT symbol pairs weighted by word frequency
  (overlapping occurrences count, as in the reference implementation),
  pick the most frequent pair — ties broken (count DESC, left ASC,
  right ASC) so the fit is deterministic — and merge its occurrences
  greedily left-to-right within every word.
- greedy left-to-right on a run of overlapping matches (only possible
  when left == right, e.g. ``(a,a)`` on ``aaaa``) merges alternate
  positions: expressed relationally as consecutive-match islands +
  odd-rank selection — no per-row Python anywhere.

Physical shape per round at 10^12 tokens: the vocab relation is
hash-partitioned by word; both window passes (pair lead, island rank)
and the merge-position join all share that one partitioning, and each
round ends in an eager localCheckpoint so plan depth and join-side
statistics stay bounded (NOTES.md session-4: stats-less lazy checkpoints
let Catalyst broadcast corpus-sized sides). The single driver-side value
per round is the argmax pair — one row, exactly like MLlib iterators.

Tokenizing the corpus with a TRAINED merge list is map-only: each merge
is one fixed-order ``aggregate`` fold over the symbol array (the greedy
scan is exactly a left fold, since a token produced by a merge can never
re-match as the LEFT side of the same merge — ``L+R != L``), chained k
deep in a single projection; and it runs per DISTINCT word, joined back
to the corpus — the dictionary-encode trick, so tokenization cost is
vocab-sized + one corpus-sized hash join, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: terminal symbol appended to every word (classic end-of-word marker)
EOW = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): whitespace-token frequencies; empty tokens (from
    repeated spaces) are skipped. One corpus scan, map-side partials."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _explode_symbols(hist: DataFrame) -> DataFrame:
    """(word, wcount, pos, sym): character symbols + the EOW marker."""
    chars = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    return hist.select(
        "word", "wcount", F.posexplode(chars).alias("pos", "sym")
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 4, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (merge_round, lhs, rhs, pair_count, token) — k rows, the artifact a
    tokenizer ships. Stops early if the vocab runs out of pairs."""
    spark = docs.sparkSession
    syms = _explode_symbols(word_histogram(docs, text_col)).localCheckpoint()
    w = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, int, str]] = []
    for r in range(int(n_merges)):
        pairs = syms.withColumn("nxt", F.lead("sym").over(w)).where(
            F.col("nxt").isNotNull()
        )
        best = (
            pairs.groupBy("sym", "nxt")
            .agg(F.sum("wcount").alias("c"))
            .orderBy(F.col("c").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["sym"], best[0]["nxt"], int(best[0]["c"])
        merges.append((r, left, right, cnt, left + right))
        syms = _apply_merge(syms, left, right).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_round int, lhs string, rhs string,"
        " pair_count bigint, token string",
    )


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) in every word:
    consecutive-match islands, odd ranks merge, the following symbol is
    consumed, positions re-densified."""
    w = Window.partitionBy("word").orderBy("pos")
    marked = (
        syms.withColumn("nxt", F.lead("sym").over(w))
        .where((F.col("sym") == left) & (F.col("nxt") == right))
        .withColumn("island", F.col("pos") - F.row_number().over(w))
        .withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy("word", "island").orderBy("pos")
            ),
        )
        .where(F.col("rn2") % 2 == 1)
        .select("word", "pos")
    )
    m1 = marked.withColumn("is_m", F.lit(True))
    m2 = marked.select(
        "word", (F.col("pos") + 1).alias("pos"), F.lit(True).alias("is_c")
    )
    return (
        syms.join(m1, ["word", "pos"], "left")
        .join(m2, ["word", "pos"], "left")
        .where(F.col("is_c").isNull())
        .select(
            "word",
            "wcount",
            (F.row_number().over(w) - 1).alias("npos"),
            F.when(F.col("is_m").isNotNull(), F.lit(left + right))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .withColumnRenamed("npos", "pos")
        .select("word", "wcount", "pos", "sym")
    )


def _sql_str(s: str) -> str:
    """Spark-SQL string literal: backslash is an escape character in
    Spark SQL (unlike ANSI), so it must be doubled BEFORE quoting or a
    corpus symbol like a lone backslash breaks the fold expression (and
    backslash+n would silently become a newline)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold_expr(arr_expr: str, left: str, right: str) -> str:
    """One greedy merge as a fixed-order left fold over a symbol array.
    Exactly the leftmost-non-overlapping scan: a merged token never
    re-matches as the LEFT of the same merge (L+R != L), so appending-or-
    replacing the accumulator tail is the full greedy semantics."""
    ls, rs = _sql_str(left), _sql_str(right)
    tok = _sql_str(left + right)
    return (
        f"aggregate({arr_expr}, cast(array() as array<string>),"
        f" (acc, s) -> if(size(acc) > 0 and element_at(acc, -1) = {ls}"
        f" and s = {rs},"
        f" concat(slice(acc, 1, size(acc) - 1), array({tok})),"
        f" concat(acc, array(s))))"
    )


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, tokens array<string>): tokenize each distinct word by
    chaining the trained merges as k nested folds — map-only, zero
    shuffle, whole-stage codegen."""
    expr = "concat(split(word, ''), array('" + EOW + "'))"
    for left, right in merges:
        expr = _merge_fold_expr(expr, left, right)
    return words.select("word", F.expr(expr).alias("tokens"))


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, tokens_md5): tokenize the corpus with a trained
    merge list via dictionary encode — tokenize each DISTINCT word once,
    hash-join back to the corpus word positions, reassemble per document
    in order. tokens_md5 fingerprints the full token stream (unit-
    separator joined) so the check covers every token, not just counts."""
    words_pos = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("widx", "word")
    ).where(F.col("word") != "")
    vocab = bpe_encode_words(
        words_pos.select("word").distinct(), merges
    )
    joined = words_pos.join(vocab, "word")
    # ONE collect_list; counts and the stream hash project off the same
    # sorted-flattened array (a second collect in the agg doubles the
    # aggregation buffer for nothing)
    agg = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("widx", "tokens"))).alias("_wt")
    )
    toks = F.flatten(F.transform(F.col("_wt"), lambda s: s["tokens"]))
    return agg.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(toks, "\x1f").cast("binary")).alias("tokens_md5"),
    )


def bpe_vocab(
    docs: DataFrame, n_merges: int = 4, text_col: str = "text"
) -> DataFrame:
    """(token, freq): the trained vocabulary with corpus frequencies —
    the other half of the tokenizer artifact (merges + vocab is what a
    runtime tokenizer loads). Train, encode each DISTINCT word once with
    the chained folds, then one weighted aggregate: freq(token) =
    Σ wcount over words containing it (with multiplicity)."""
    hist = word_histogram(docs, text_col)
    merges_rows = (
        bpe_train(docs, n_merges=n_merges, text_col=text_col)
        .orderBy("merge_round")
        .collect()
    )
    merges = [(r["lhs"], r["rhs"]) for r in merges_rows]
    enc = bpe_encode_words(hist.select("word"), merges)
    return (
        hist.join(enc, "word")
        .select("wcount", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("wcount").alias("freq"))
    )
