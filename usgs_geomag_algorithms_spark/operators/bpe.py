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
  positions: expressed as a fixed-order left fold over the word's symbol
  ARRAY (``_merge_fold_expr`` — the exact greedy scan, because a token
  produced by a merge can never re-match as the LEFT side of the same
  merge, ``L+R != L``) — no per-row Python anywhere. The fold is the
  same expression the encode path chains, so train and encode share one
  proven kernel (property-tested against a classic pure-Python BPE).

Physical shape per round at 10^12 tokens: each word travels as ONE row
holding its symbol array, so applying a merge is a map-only projection —
zero shuffle. Pair counting is a codegen'd ``explode(sequence)`` +
``element_at`` pass (no interpreted lambdas, no window over a word
partitioning) into one aggregate whose shuffle is bounded by the
DISTINCT-PAIR count (~|alphabet|² + merged tokens), not the vocabulary.
Each round ends in an eager localCheckpoint so plan depth and join-side
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

from pyspark.sql import DataFrame, functions as F

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


def _word_arrays(hist: DataFrame) -> DataFrame:
    """(word, wcount, syms array<string>): character symbols + the EOW
    marker, one row per distinct word."""
    chars = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    return hist.select("word", "wcount", chars.alias("syms"))


def _pair_counts(arr: DataFrame) -> DataFrame:
    """(sym, nxt, c): adjacent-pair counts weighted by word frequency
    (overlapping occurrences count). Codegen'd explode(sequence) +
    element_at — no interpreted lambda, no window shuffle; the aggregate
    shuffle is bounded by the distinct-pair count. Fully-merged words
    (single symbol) are filtered out BEFORE the sequence: sequence(1, 0)
    would DESCEND (NOTES.md) and element_at past the end errors under
    ANSI."""
    return (
        arr.where(F.expr("size(syms) > 1"))
        .select(
            "wcount",
            "syms",
            F.explode(F.expr("sequence(1, size(syms) - 1)")).alias("i"),
        )
        .select(
            "wcount",
            F.expr("element_at(syms, i)").alias("sym"),
            F.expr("element_at(syms, i + 1)").alias("nxt"),
        )
        .groupBy("sym", "nxt")
        .agg(F.sum("wcount").alias("c"))
    )


def _train_arrays(
    hist: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int, str]], DataFrame]:
    """Shared trainer core: run the merge rounds over the word-array
    relation; returns (merge rows, final symbol-array DataFrame). Each
    round = one tiny argmax job + one map-only fold projection."""
    arr = _word_arrays(hist).localCheckpoint()
    merges: list[tuple[int, str, str, int, str]] = []
    for r in range(int(n_merges)):
        best = (
            _pair_counts(arr)
            .orderBy(F.col("c").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["sym"], best[0]["nxt"], int(best[0]["c"])
        merges.append((r, left, right, cnt, left + right))
        arr = arr.select(
            "word",
            "wcount",
            F.expr(_merge_fold_expr("syms", left, right)).alias("syms"),
        ).localCheckpoint()
    return merges, arr


def bpe_train(
    docs: DataFrame, n_merges: int = 4, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (merge_round, lhs, rhs, pair_count, token) — k rows, the artifact a
    tokenizer ships. Stops early if the vocab runs out of pairs."""
    spark = docs.sparkSession
    merges, _ = _train_arrays(word_histogram(docs, text_col), n_merges)
    return spark.createDataFrame(
        merges,
        "merge_round int, lhs string, rhs string,"
        " pair_count bigint, token string",
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
    runtime tokenizer loads). The trainer's final symbol arrays ARE the
    encoded distinct words, so freq(token) = Σ wcount over the final
    arrays (with multiplicity) — one weighted aggregate, no re-encode."""
    _, arr = _train_arrays(word_histogram(docs, text_col), n_merges)
    return (
        arr.select("wcount", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("wcount").alias("freq"))
    )
