"""Bigram language-model scoring — the KenLM-style perplexity gate of a
CCNet-shaped curation pipeline (train an n-gram LM on a held-in
reference slice, score every document by per-token surprisal; low-LM
docs are boilerplate/gibberish, suspiciously-low ones are templates).

Reference analog: the corpus-informed two-pass scoring of
``textops.corpus_word_stats`` (unigram), extended to CONDITIONAL
bigram costs — the smallest model that actually penalizes scrambled
word order, which unigram frequency sums cannot.

Two score surfaces, one plan:

* :func:`bigram_bits` — INTEGER bit-surprisal. Each bigram event costs
  ``BL(c1) - BL(c12)`` bits, where ``BL(x) = floor(log2 x)`` computed as
  ``length(bin(x)) - 1`` — pure string/arith expressions that are
  bit-identical in every engine (no float log anywhere), so the driver
  oracle is exact. The sum is within ``n`` bits of the true
  ``sum(log2(c1/c12))`` cross-entropy.
* :func:`bigram_cross_entropy` — the true double cross-entropy
  (float ``log2``), parity-tested against NumPy in pytest; NOT
  driver-oracled because cross-engine ``ln`` is not bit-contracted.

Unseen-event charging (Laplace-flavored, all-integer):

* bigram seen in training        -> ``BL(c1) - BL(c12)``
* context ``w1`` seen, pair not  -> ``BL(c1)`` (i.e. ``c12`` ~ 1)
* context unseen (OOV)           -> ``BL(B)``, B = total training events

Scale: the bigram table of a 100 TB corpus has ~10^10 types — far past
broadcast, so BOTH score joins shuffle on their key ((w1, w2) then w1),
where stopword-pair skew is AQE's skew-join bread and butter. Training
aggregates once on (w1, w2) (map-side partials; bounded by distinct
pairs, not corpus rows); the context table derives from the PAIR table
(vocab-sized aggregate), never re-scanning the corpus. Per-doc roll-up
is one more shuffle on doc_id. Nothing corpus-sized touches the driver;
the one collected scalar is the training-event total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import _exploded_gram_index


def _bl(c) -> F.Column:
    """floor(log2(c)) for c >= 1 as exact integer expressions: the bit
    length of the binary rendering (Spark ``bin`` never left-pads)."""
    return (F.length(F.bin(c)) - F.lit(1)).cast("long")


def bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2): one row per adjacent word pair, via the codegen'd
    explode(sequence) + element_at path (no interpreted lambdas); docs
    under 2 words emit nothing (guarded sequence)."""
    wi = _exploded_gram_index(df, 2, text_col, id_col)
    return wi.select(
        id_col,
        F.element_at("w", F.col("i") - 1).alias("w1"),
        F.element_at("w", F.col("i")).alias("w2"),
    )


def bigram_lm(
    train: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the LM: (w1, w2, c12, c1) — pair counts plus the context
    total ``c1 = sum_w2 c12`` joined on. ``c1`` is derived FROM the pair
    table (a vocab-bounded aggregate), not from a second corpus scan."""
    c12 = bigrams(train, text_col, id_col).groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    return c12.join(c1, "w1")


def bigram_bits(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document integer bit-surprisal under ``lm`` (see module doc
    for the three-way unseen charging). Output per doc with >= 1 bigram:
    (id, n_bigrams, n_unseen, n_ctx_oov, bits, avg_bits) — all integer
    except the single terminal division (exact: int64 operands).

    The LM relation is referenced by BOTH score joins (pair and
    context), so it is EAGERLY checkpointed first — otherwise each
    reference re-executes the training subtree, i.e. a second full
    corpus scan at 100 TB (the dedup shingle-relation lesson; eager =
    runtime sizes known, so AQE size-validates any broadcast of it)."""
    lm = lm.localCheckpoint(eager=True)
    total = lm.agg(F.sum("c12").cast("long").alias("b")).first()["b"]
    if not total:
        raise ValueError("empty language model")
    bl_total = int(total).bit_length() - 1
    bi = bigrams(df, text_col, id_col)
    c1_tbl = lm.select("w1", "c1").groupBy("w1").agg(
        F.first("c1").alias("c1")
    )
    scored = (
        bi.join(lm.select("w1", "w2", "c12"), ["w1", "w2"], "left")
        .join(c1_tbl, "w1", "left")
        .select(
            id_col,
            F.when(
                F.col("c12").isNotNull(),
                _bl(F.col("c1")) - _bl(F.col("c12")),
            )
            .when(F.col("c1").isNotNull(), _bl(F.col("c1")))
            .otherwise(F.lit(bl_total).cast("long"))
            .alias("cost"),
            F.col("c12").isNull().cast("int").alias("unseen"),
            F.col("c1").isNull().cast("int").alias("ctx_oov"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("unseen").cast("long").alias("n_unseen"),
        F.sum("ctx_oov").cast("long").alias("n_ctx_oov"),
        F.sum("cost").cast("long").alias("bits"),
        (F.sum("cost") / F.count("*")).alias("avg_bits"),
    )


def bigram_cross_entropy(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """True per-doc cross-entropy H = mean(log2(c1/c12)) over SEEN
    bigrams (unseen events carry the integer path's charges — this
    surface is the float refinement for ranking, pytest-parity-checked
    vs NumPy, not driver-oracled)."""
    bi = bigrams(df, text_col, id_col)
    seen = bi.join(lm.select("w1", "w2", "c12", "c1"), ["w1", "w2"])
    return seen.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_seen"),
        (F.sum(F.log2("c1") - F.log2("c12")) / F.count("*")).alias(
            "cross_entropy"
        ),
    )
