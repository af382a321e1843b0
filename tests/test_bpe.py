"""Distributed BPE trainer/tokenizer vs a classic pure-Python reference
(Sennrich et al. 2016 get_stats/merge_vocab shape, with the engine's
deterministic (count DESC, pair ASC) tie order)."""

from __future__ import annotations

import hashlib

import pytest

from usgs_geomag_algorithms_spark.operators.bpe import (
    EOW,
    bpe_encode_words,
    bpe_tokenize,
    bpe_train,
    word_histogram,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ reference
def _ref_word_counts(texts):
    wc: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(word_counts, n_merges):
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for r in range(n_merges):
        pairs: dict = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((r, left, right, cnt, left + right))
        vocab = {w: _ref_apply(s, left, right) for w, s in vocab.items()}
    return merges, vocab


# ------------------------------------------------------------ trainer
class TestBpeTrain:
    def test_matches_reference_on_corpus_sample(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(40)
            .select("doc_id", "text")
        )
        texts = [r["text"] for r in docs.collect()]
        expect, _ = _ref_train(_ref_word_counts(texts), 5)
        got = [
            (r["merge_round"], r["lhs"], r["rhs"], r["pair_count"], r["token"])
            for r in bpe_train(docs, n_merges=5)
            .orderBy("merge_round")
            .collect()
        ]
        assert got == expect

    def test_overlapping_run_merges_alternate_positions(self, spark):
        # 'aaaa' + pair (a,a): overlapping occurrences count 3, greedy
        # merges positions 0 and 2 -> aa aa </w>
        docs = spark.createDataFrame(
            [(1, "aaaa aaaa b")], "doc_id long, text string"
        )
        m = bpe_train(docs, n_merges=2).orderBy("merge_round").collect()
        assert (m[0]["lhs"], m[0]["rhs"], m[0]["pair_count"]) == ("a", "a", 6)
        # after round 0 each word is [aa, aa, </w>]: (aa,aa) and (aa,</w>)
        # tie at 2 and '<' sorts before 'a', so (aa,</w>) wins the tie
        assert (m[1]["lhs"], m[1]["rhs"], m[1]["pair_count"]) == ("aa", "</w>", 2)

    def test_tie_breaks_lexicographically(self, spark):
        # 'ab' and 'cd' each once: pairs (a,b), (c,d), (b,</w>), (d,</w>)
        # all count 1 -> lexicographic min (a,b) wins
        docs = spark.createDataFrame(
            [(1, "ab cd")], "doc_id long, text string"
        )
        m = bpe_train(docs, n_merges=1).collect()
        assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "b")

    def test_word_histogram_skips_empty_tokens(self, spark):
        docs = spark.createDataFrame(
            [(1, "x  y"), (2, "x")], "doc_id long, text string"
        )
        got = {
            r["word"]: r["wcount"]
            for r in word_histogram(docs).collect()
        }
        assert got == {"x": 2, "y": 1}


# ------------------------------------------------------------ tokenizer
class TestBpeEncode:
    def test_fold_equals_reference_greedy(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(40)
            .select("doc_id", "text")
        )
        texts = [r["text"] for r in docs.collect()]
        wc = _ref_word_counts(texts)
        merges_full, vocab = _ref_train(wc, 5)
        merges = [(left, right) for _r, left, right, _c, _t in merges_full]
        words = spark.createDataFrame(
            [(w,) for w in wc], "word string"
        )
        got = {
            r["word"]: list(r["tokens"])
            for r in bpe_encode_words(words, merges).collect()
        }
        assert got == vocab

    def test_fold_handles_merged_token_not_rematching(self, spark):
        # merges [(a,a)] on 'aaa' must give [aa, a, </w>] (the merged
        # 'aa' must not absorb the third 'a')
        words = spark.createDataFrame([("aaa",)], "word string")
        got = bpe_encode_words(words, [("a", "a")]).collect()[0]["tokens"]
        assert list(got) == ["aa", "a", EOW]

    def test_tokenize_counts_and_stream_hash(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(20)
            .select("doc_id", "text")
        )
        rows = docs.collect()
        wc = _ref_word_counts([r["text"] for r in rows])
        merges_full, vocab = _ref_train(wc, 4)
        merges = [(left, right) for _r, left, right, _c, _t in merges_full]
        expect = {}
        for r in rows:
            toks = []
            for w in r["text"].split(" "):
                if w:
                    toks.extend(vocab[w])
            expect[r["doc_id"]] = (
                len(toks),
                hashlib.md5("\x1f".join(toks).encode()).hexdigest(),
            )
        got = {
            r["doc_id"]: (r["n_tokens"], r["tokens_md5"])
            for r in bpe_tokenize(docs, merges).collect()
        }
        assert got == expect

    def test_encode_is_map_only(self, spark):
        words = spark.createDataFrame(
            [("hello",), ("world",)], "word string"
        )
        df = bpe_encode_words(words, [("l", "l"), ("o", EOW)])
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final


# ------------------------------------------------------------ properties
class TestBpeProperties:
    def test_tokens_reassemble_to_word(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(30)
            .select("doc_id", "text")
        )
        texts = [r["text"] for r in docs.collect()]
        wc = _ref_word_counts(texts)
        merges_full, _ = _ref_train(wc, 5)
        merges = [(left, right) for _r, left, right, _c, _t in merges_full]
        words = spark.createDataFrame([(w,) for w in wc], "word string")
        for r in bpe_encode_words(words, merges).collect():
            assert "".join(r["tokens"]) == r["word"] + EOW


class TestBpeHypothesis:
    def test_random_corpora_match_reference(self, spark):
        """Property: bpe_train == the classic reference on randomized
        small corpora (few Spark examples — each costs a round trip)."""
        from hypothesis import given, settings, strategies as st

        word = st.text(alphabet="abcd", min_size=1, max_size=5)
        corpus = st.lists(
            st.lists(word, min_size=1, max_size=6).map(" ".join),
            min_size=1,
            max_size=4,
        )

        @settings(max_examples=8, deadline=None)
        @given(corpus)
        def check(texts):
            docs = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)],
                "doc_id long, text string",
            )
            expect, _ = _ref_train(_ref_word_counts(texts), 3)
            got = [
                (
                    r["merge_round"],
                    r["lhs"],
                    r["rhs"],
                    r["pair_count"],
                    r["token"],
                )
                for r in bpe_train(docs, n_merges=3)
                .orderBy("merge_round")
                .collect()
            ]
            assert got == expect

        check()


class TestBpeEscaping:
    def test_backslash_and_quote_symbols_round_trip(self, spark):
        """Backslash is a Spark-SQL escape character: merge symbols
        containing backslashes or quotes must survive the literal-folded
        encode expressions (regression: ParseException / silent newline
        substitution)."""
        texts = ["a\\b a\\b c'd c'd", "a\\b c'd"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        expect, vocab = _ref_train(_ref_word_counts(texts), 4)
        got = [
            (r["merge_round"], r["lhs"], r["rhs"], r["pair_count"], r["token"])
            for r in bpe_train(docs, n_merges=4)
            .orderBy("merge_round")
            .collect()
        ]
        assert got == expect
        merges = [(left, right) for _r, left, right, _c, _t in expect]
        words = spark.createDataFrame([(w,) for w in vocab], "word string")
        for r in bpe_encode_words(words, merges).collect():
            assert "".join(r["tokens"]) == r["word"] + EOW
            assert list(r["tokens"]) == vocab[r["word"]]


class TestBpeVocab:
    def test_vocab_matches_reference(self, spark):
        from usgs_geomag_algorithms_spark.operators.bpe import bpe_vocab

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(30)
            .select("doc_id", "text")
        )
        texts = [r["text"] for r in docs.collect()]
        wc = _ref_word_counts(texts)
        _m, vocab = _ref_train(wc, 4)
        expect: dict = {}
        for w, toks in vocab.items():
            for t in toks:
                expect[t] = expect.get(t, 0) + wc[w]
        got = {
            r["token"]: r["freq"] for r in bpe_vocab(docs, 4).collect()
        }
        assert got == expect


class TestBpeDecodeRoundTrip:
    def test_concat_tokens_reconstructs_words(self, spark):
        """BPE tokens partition each word's characters, so decode is
        concat — asserted for every distinct word under a trained merge
        list (the tokenizer's losslessness contract)."""
        from usgs_geomag_algorithms_spark.operators.bpe import (
            bpe_encode_words,
            bpe_train,
        )
        from pyspark.sql import functions as F

        texts = [
            (i, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(5)
        ] + [(9, "unseen zebra words never merged")]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        merges = [
            (r.lhs, r.rhs)
            for r in bpe_train(docs, n_merges=6)
            .orderBy("merge_round")
            .collect()
        ]
        assert merges, "training should produce merges"
        words = docs.select(
            F.explode(F.split("text", " ")).alias("word")
        ).where(F.col("word") != "").distinct()
        enc = bpe_encode_words(words, merges)
        # tokens partition word chars + the EOW marker: decode = concat
        from usgs_geomag_algorithms_spark.operators.bpe import EOW

        bad = enc.where(
            F.array_join(F.col("tokens"), "")
            != F.concat(F.col("word"), F.lit(EOW))
        ).collect()
        assert bad == []
