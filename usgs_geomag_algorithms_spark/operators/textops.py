"""Text analysis operators: token counting, language-ID, quality scoring,
document fingerprinting. All pure column expressions / explode+aggregate
plans (no Python in the hot path) with exact DuckDB-oracle equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
}


#: GPT-2-style pre-tokenizer pattern, restricted to constructs shared by
#: Java regex and RE2 (no lookahead, ASCII classes): contraction
#: suffixes, space-prefixed letter runs, space-prefixed digit runs,
#: space-prefixed punctuation runs, residual whitespace. Alternation is
#: leftmost-FIRST in both engines, so match counts agree exactly.
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens, a REAL BPE-ish regex tokenization count (the
    GPT-2 pre-tokenizer shape — what a BPE vocabulary merges within), and
    the chars/4 quick estimate — all plain column expressions."""
    n_ws = F.size(F.split(F.col(text_col), r"\s+"))
    n_chars = F.length(text_col)
    # pattern passed as a literal COLUMN (not an SQL string literal): the
    # leading quote in the contraction branch needs no escaping this way
    n_bpe = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
        )
    ).cast("long")
    bpe_ish = F.ceil(n_chars.cast("double") / 4.0).cast("long")
    return df.select(
        id_col,
        n_chars.cast("long").alias("n_chars"),
        n_ws.cast("long").alias("n_tokens_ws"),
        n_bpe.alias("n_tokens_bpe"),
        bpe_ish.alias("n_tokens_bpe_est"),
    )


def _count_occurrences(text: F.Column, word: str) -> F.Column:
    """Occurrences of ' word ' (space-delimited) via length arithmetic —
    reproducible in any SQL dialect, unlike regexp counting."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_score_columns(text: F.Column) -> dict:
    """Per-language marker scores as column expressions — the single
    source for ``lang_id`` and ``lang_pred_column``."""
    return {
        lang: sum((_count_occurrences(text, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def lang_pred_column(text: F.Column, scores: dict = None) -> F.Column:
    """The language prediction as a single column expression (argmax of
    marker scores, first-wins tie-break) — reusable by single-scan
    compositions like ``curate``."""
    scores = scores if scores is not None else lang_score_columns(text)
    langs = sorted(LANG_MARKERS)
    best = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = (
                scores[lang] >= scores[other]
                if other > lang
                else scores[lang] > scores[other]
            )
            cond = c if cond is None else (cond & c)
        best = (
            F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
        )
    return best.otherwise(F.lit(langs[0]))


def quality_columns(text: F.Column) -> dict:
    """Quality features as raw column expressions keyed by output name —
    the single source shared by ``quality_score`` and ``curate``."""
    n_chars = F.length(text)
    n_tokens = F.size(F.split(text, r"\s+"))
    n_spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    mean_tok_len = (n_chars - n_spaces).cast("double") / n_tokens
    stop_hits = sum(
        (_count_occurrences(text, w) for w in LANG_MARKERS["en"]), F.lit(0)
    )
    stop_ratio = stop_hits.cast("double") / n_tokens
    alnum_removed = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    punct_ratio = F.length(alnum_removed).cast("double") / n_chars
    score = (
        F.when(mean_tok_len.between(3.0, 10.0), 0.4).otherwise(0.0)
        + F.when(stop_ratio > 0.02, 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.3).otherwise(0.0)
    )
    return {
        "mean_token_len": F.round(mean_tok_len, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality_score": F.round(score, 2),
    }


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: score = Σ occurrences of each language's
    marker words; predict argmax (ties broken by language code order)."""
    scores = lang_score_columns(F.col(text_col))
    langs = sorted(LANG_MARKERS)
    return df.select(
        id_col,
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        lang_pred_column(F.col(text_col), scores).alias("pred_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: mean token length, stopword ratio,
    non-alnum ratio, plus a composite [0,1] score. Deterministic closed-form
    expressions only."""
    cols = quality_columns(F.col(text_col))
    return df.select(
        id_col, *[expr.alias(name) for name, expr in cols.items()]
    )


def word_ngrams(words: F.Column, n: int) -> F.Column:
    """Word n-grams of a split-text array as a JVM-side expression
    (1-based ``element_at`` over a guarded ``sequence`` — ``sequence``
    DESCENDS when start>stop, so short docs must short-circuit to []).

    NOTE: ``transform`` lambdas evaluate interpreted (~13 µs/gram
    measured); the hot paths below use :func:`_exploded_gram_index`
    + :func:`_gram_at` instead, which stay in whole-stage codegen."""
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(words, i - (n - 1 - j)) for j in range(n)]
    )
    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(n), F.size(words)), gram),
    ).otherwise(F.array().cast("array<string>"))


def _exploded_gram_index(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, w array<string>, i int): one row per n-gram END position
    (1-based ``i`` in ``n..size(w)``) — ``explode(sequence)`` is a
    codegen'd generator, so gram construction downstream is plain string
    expressions instead of interpreted ``transform`` lambdas. The
    ``when`` guard handles sequence's DESCENDING start>stop trap for
    short docs (null -> explode emits nothing)."""
    w = F.split(F.col(text_col), " ")
    return df.select(id_col, w.alias("w")).select(
        id_col,
        "w",
        F.explode(
            F.when(F.size("w") >= n, F.sequence(F.lit(n), F.size("w")))
        ).alias("i"),
    )


def _gram_at(w: F.Column, i: F.Column, n: int) -> F.Column:
    """The n-gram ending at 1-based word index ``i`` — identical
    composition to :func:`word_ngrams` (same ``element_at`` order,
    same ``concat_ws``), as codegen'd expressions."""
    return F.concat_ws(
        " ", *[F.element_at(w, i - (n - 1 - j)) for j in range(n)]
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition counters: per doc, total /
    top / duplicated word-2-gram and 3-gram instance counts.

    All-integer outputs so the driver oracle is bit-exact (ratios like
    ``top_2gram_count / n_2grams`` are one division away and inherit
    exactness).  Plan: ONE corpus scan explodes both gram sizes as tagged
    (n, gram) structs -> count per (doc, n, gram) with map-side partial
    aggregation -> per-doc conditional roll-up.  A single shuffle keyed
    by (doc, n, gram) spreads hot grams across docs — no skew pile-up at
    100 TB, explode factor bounded by document length, and the 3-gram
    pass rides the 2-gram scan for free (vs. a naive two-scan two-join
    plan).  Docs long enough for 2-grams but not 3-grams carry NULL
    3-gram columns; docs under 2 words emit nothing.
    """
    wi = _exploded_gram_index(df, 2, text_col, id_col)
    i, w = F.col("i"), F.col("w")
    # both gram sizes off ONE index explode: the 2-gram at i always, the
    # 3-gram at i when it exists — inline() is a codegen'd generator, so
    # no interpreted lambdas anywhere on this path (measured 6.8 s ->
    # sub-second for the map side at sf0.1)
    tagged = F.array(
        F.struct(F.lit(2).alias("n"), _gram_at(w, i, 2).alias("gram")),
        F.struct(
            F.when(i >= 3, F.lit(3)).alias("n"),
            F.when(i >= 3, _gram_at(w, i, 3)).alias("gram"),
        ),
    )
    counts = (
        wi.select(id_col, F.inline(tagged))
        .where(F.col("n").isNotNull())
        .groupBy(id_col, "n", "gram")
        .count()
    )

    def rollup(n: int):
        here = F.col("n") == n
        return [
            F.sum(F.when(here, F.col("count")))
            .cast("long")
            .alias(f"n_{n}grams"),
            F.max(F.when(here, F.col("count")))
            .cast("long")
            .alias(f"top_{n}gram_count"),
            F.when(
                F.max(F.when(here, F.col("count"))).isNotNull(),
                F.coalesce(
                    F.sum(
                        F.when(here & (F.col("count") > 1), F.col("count"))
                    ),
                    F.lit(0),
                ),
            )
            .cast("long")
            .alias(f"dup_{n}gram_count"),
        ]

    return counts.groupBy(id_col).agg(*rollup(2), *rollup(3))


def contamination(
    df: DataFrame,
    n: int = 5,
    bench_mod: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination screen: corpus documents sharing any word
    n-gram with the benchmark slice (here ``doc_id % bench_mod == 0`` —
    in production a separate benchmark table).

    The benchmark side is tiny by construction, so it broadcasts: the
    corpus scan stays shuffle-free until the final per-doc count, which
    is bounded by hit cardinality.  Counts (distinct contaminated grams,
    distinct benchmark docs matched) are integers -> exact oracle.
    """
    wi = _exploded_gram_index(df, n, text_col, id_col)
    grams = wi.select(
        id_col, _gram_at(F.col("w"), F.col("i"), n).alias("gram")
    ).distinct()
    is_bench = F.col(id_col) % bench_mod == 0
    bench = grams.where(is_bench).select(
        F.col(id_col).alias("bench_id"), "gram"
    )
    corpus = grams.where(~is_bench)
    hits = corpus.join(F.broadcast(bench), "gram")
    return hits.groupBy(id_col).agg(
        F.countDistinct("gram").cast("long").alias("n_hit_grams"),
        F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
    )


def corpus_word_stats(
    df: DataFrame,
    rare_below: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-informed document scoring: join each document's words back
    against the corpus-wide word-frequency table (the two-pass pattern
    behind KenLM-style perplexity gates — here with all-integer outputs
    so the driver oracle is bit-exact; a log-prob is one ``ln`` away).

    Per doc: instance/type counts, min/max/sum of corpus frequency over
    word instances, and how many instances are corpus-rare
    (``freq < rare_below``).

    Scale: the vocabulary of a 100 TB corpus has billions of types, so
    the frequency table is NOT broadcast — both the count and the
    words->vocab join shuffle on the word key, where stopword skew is
    AQE's bread and butter (sorted-merge sides split per key); the final
    roll-up shuffles on doc_id.  Three shuffles total, each keyed by a
    high-cardinality column.
    """
    words = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("freq"))
    return (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.countDistinct("word").cast("long").alias("n_types"),
            F.min("freq").cast("long").alias("min_freq"),
            F.max("freq").cast("long").alias("max_freq"),
            F.sum("freq").cast("long").alias("freq_sum"),
            F.coalesce(
                F.sum(F.when(F.col("freq") < rare_below, F.lit(1))), F.lit(0)
            )
            .cast("long")
            .alias("n_rare"),
        )
    )


def fingerprint(
    df: DataFrame,
    n: int = 8,
    keep: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing-style document fingerprint: the ``keep`` smallest 32-bit
    char-n-gram hashes, concatenated and re-hashed — robust to local edits,
    exact-oracle-checkable (same md5 hashing as dedup)."""
    from .dedup import char_shingles, _shingle_hash

    sh = char_shingles(df, n=n, text_col=text_col, id_col=id_col)
    hashed = sh.select(id_col, _shingle_hash(F.col("shingle")).alias("_h"))
    return (
        hashed.groupBy(id_col)
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, keep).alias("_mins"))
        .select(
            id_col,
            F.md5(
                F.concat_ws(",", F.col("_mins").cast("array<string>")).cast("binary")
            ).alias("fingerprint"),
        )
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval for a bag-of-terms query -> top-k documents.

    Standard Okapi BM25 with the Lucene-style non-negative idf:
    ``idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))``,
    ``score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Plan shape (scale-first):
      1. one corpus scan computes per-doc ``dl`` (whitespace token count)
         and per-term ``tf`` as |terms| array-filter expressions — all
         JVM-side, no explode (no |terms|-fold row amplification);
      2. corpus stats (N, avgdl, per-term df) reduce to ONE row, re-joined
         by broadcast cross join — no shuffle of the corpus side;
      3. scores are rounded to 4 dp BEFORE ranking (summation-order and
         libm-ulp noise must not flip rank boundaries between engines);
         the deterministic (score desc, id asc) top-k goes through
         ``orderBy().limit(k)`` — Spark plans it as TakeOrderedAndProject
         (per-partition top-k, merge of k-row heaps), NOT a global sort,
         so no unpartitioned window ever sees the corpus; ``rank`` is a
         window over the k surviving rows only.

    avgdl is exact in both engines (integer token counts sum exactly), so
    every downstream double is deterministic; ln() is the one libm call —
    identical to the last ulp for these argument ranges in practice, and
    shielded by the pre-rank rounding.
    """
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col(text_col)), r"\s+")

    def _tf(term):
        # one-arg lambda only: a second (defaulted) parameter would make
        # Spark bind it as the (element, index) higher-order form
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        id_col,
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        tf = F.col(f"_tf{i}").cast("double")
        term_score = idf * (
            tf
            * F.lit(k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("_avgdl")
                )
            )
        )
        score = term_score if score is None else score + term_score
    top = (
        scored.select(id_col, "dl", F.round(score, 4).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def collocations(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level bigram collocation mining: adjacent word pairs ranked
    by PMI *lift* ``P(xy) / (P(x)·P(y))`` — the association statistic
    behind phrase detection in training-data pipelines (word2vec phrases,
    n-gram vocab induction).

    Contingency-table formulation (Dunning): every probability comes from
    the bigram relation alone — ``c_x``/``c_y`` are the left/right
    MARGINALS of the pair-count table, ``n_pairs`` its grand total — so
    the corpus is scanned ONCE; the marginals and the scalar total are
    re-aggregations of the (vocab²-bounded) counts relation, not the
    corpus. The counts relation is a lazy local checkpoint: three
    consumers (two marginals + the filtered pair list) read one
    materialization instead of re-exploding the corpus.

    Exactness: all counts are BIGINT; lift is computed in one fixed
    expression tree ``(c_xy·N) / (c_x·c_y)`` over DOUBLE operands — each
    IEEE operation is correctly rounded, so Spark and DuckDB agree
    bit-for-bit (NOTES.md exact-rational rule; no log, which libm-varies).

    Scale shape: one shuffle over (w1, w2) with map-side partial counts
    (explode factor = words/doc); everything downstream is vocab-sized.
    Hot function words spread across their pair keys — no single-key
    pile-up. 100 TB caveat: ``c_xy·N`` stays in DOUBLE deliberately
    (int64 would overflow near N≈3·10⁹ when a stopword-stopword pair
    dominates).
    """
    wi = _exploded_gram_index(df, 2, text_col, id_col)
    counts = (
        wi.select(
            F.element_at("w", F.col("i") - 1).alias("w1"),
            F.element_at("w", F.col("i")).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    left = counts.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    right = counts.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    total = counts.agg(F.sum("c_xy").alias("n_pairs"))
    lift = (F.col("c_xy").cast("double") * F.col("n_pairs").cast("double")) / (
        F.col("c_x").cast("double") * F.col("c_y").cast("double")
    )
    return (
        counts.where(F.col("c_xy") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c_xy", "c_x", "c_y", "n_pairs", lift.alias("lift"))
    )


#: Flesch reading-ease coefficients — fixed IEEE-double literals so the
#: score expression tree is engine-portable
FLESCH_BASE, FLESCH_SENT, FLESCH_SYLL = 206.835, 1.015, 84.6


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document from three integer counts:
    words (space runs), sentences (./!/? runs, min 1), and a syllable
    PROXY (vowel-group runs per word, min 1/word — the classic heuristic;
    exact hyphenation needs a dictionary, out of scope for corpus-scale
    screening). Pure column expressions, no explode — O(bytes) per doc.

    ``score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``
    evaluated in one fixed DOUBLE tree (bit-identical cross-engine), NULL
    for empty/whitespace-only docs.
    """
    text = F.col(text_col)
    n_words = F.size(F.regexp_extract_all(text, F.lit(r"[^ ]+"), F.lit(0))).cast(
        "long"
    )
    n_sent_raw = F.size(
        F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))
    ).cast("long")
    n_sents = F.greatest(n_sent_raw, F.lit(1).cast("long"))
    # per-word max(1, vowel groups) == vowel groups + words with no vowel;
    # the latter as n_words − words-containing-a-vowel so every pattern is
    # lookaround-free (RE2/DuckDB has no lookahead) and the whole op stays
    # explode-free single-regexp counts
    vowel_groups = F.size(
        F.regexp_extract_all(text, F.lit(r"[aeiouyAEIOUY]+"), F.lit(0))
    ).cast("long")
    vowel_words = F.size(
        F.regexp_extract_all(
            text, F.lit(r"(?:^| )[^ ]*[aeiouyAEIOUY][^ ]*"), F.lit(0)
        )
    ).cast("long")
    n_syll = vowel_groups + (n_words - vowel_words)
    score = (
        F.lit(FLESCH_BASE)
        - F.lit(FLESCH_SENT) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(FLESCH_SYLL) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        n_sents.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.when(n_words > 0, score).alias("flesch"),
    )


def tfidf_keywords(
    df: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: top-``top_n`` terms by TF-IDF —
    the classic summarization / labeling primitive for corpus triage.

    ``score = tf · ln(1 + N/df_t)`` with ``N`` = documents holding at
    least one token (defined off the term relation itself, so the corpus
    is scanned ONCE: document frequency and N are both re-aggregations
    of the (doc, word, tf) relation — same single-scan discipline as
    :func:`collocations`, lazily checkpointed for its three consumers).

    Determinism: scores round to 4 dp BEFORE ranking (ln is the one libm
    call — same engine-agreement discipline as :func:`bm25_topk`); ties
    break (score desc, word asc).  The rank window partitions by doc —
    never global.  Scale shape: one explode→(doc,word) shuffle, a
    word-keyed df aggregation, and a word join of the two (both sides
    word-partitioned); top-n filter drops everything else early.
    """
    from pyspark.sql import Window

    wi = _exploded_gram_index(df, 1, text_col, id_col)
    tf = (
        wi.select(id_col, _gram_at(F.col("w"), F.col("i"), 1).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    docfreq = tf.groupBy("word").agg(F.count("*").cast("long").alias("df_t"))
    total = tf.agg(
        F.count_distinct(F.col(id_col)).cast("long").alias("n_docs")
    )
    score = F.round(
        F.col("tf").cast("double")
        * F.log(
            F.lit(1.0)
            + F.col("n_docs").cast("double") / F.col("df_t").cast("double")
        ),
        4,
    )
    scored = (
        tf.join(docfreq, "word")
        .crossJoin(F.broadcast(total))
        .select(id_col, "word", "tf", "df_t", score.alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select(id_col, "word", "tf", "df_t", "score", "rank")
    )


#: explicit whitespace-run class for canonicalization — Java's ``\s``
#: includes ``\x0B`` (vertical tab), RE2's does not; an explicit class
#: keeps Spark and the DuckDB oracle byte-identical
CANON_WS = "[ \t\r\n]+"


def nfc_normalize_col(col) -> F.Column:
    """Unicode NFC normalization of a string column as an Arrow-batched
    pandas UDF over ``pandas.Series.str.normalize`` (the ``unicodedata``
    C kernel per element — UAX#15, the same tables DuckDB's utf8proc
    implements, so oracles are byte-identical). NOT Arrow's
    ``utf8_normalize``: this container's build fails to compose
    (NFC of e + U+0301 stays decomposed — verified). NULLs pass
    through."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        return s.str.normalize("NFC")

    # real annotation objects: the module's postponed (string) annotations
    # are unresolvable for pandas_udf's signature inspection
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_nfc, "string")
    return udf(col if isinstance(col, F.Column) else F.col(col))


def canonicalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "canon"
) -> DataFrame:
    """Dedup-key canonicalization: NFC-normalize (combining sequences
    fold to precomposed codepoints), lowercase, trim, collapse whitespace
    runs to single spaces — the standard pre-dedup text folding so that
    byte-distinct but visually/semantically identical crawls share one
    exact-dedup key (the per-url byte-identity invariant stays on the RAW
    text column; this derives a SEPARATE key).

    Everything after the NFC kernel is a JVM column expression; the exact
    DuckDB twin is
    ``regexp_replace(trim(lower(nfc_normalize(s))), '[ \\t\\r\\n]+', ' ', 'g')``
    (both engines trim 0x20 only and lowercase after NFC in the same
    order, so results are byte-identical)."""
    canon = F.regexp_replace(
        F.trim(F.lower(nfc_normalize_col(text_col))), CANON_WS, " "
    )
    return df.withColumn(out_col, canon)
