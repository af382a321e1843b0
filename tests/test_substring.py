"""Exact-substring dedup: window fingerprints, span merge, strip — parity
with a pure-Python suffix-scan reference, plus boilerplate-cap and stride
semantics and the plan shape (no Python, no token-granular explode on the
merge path)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators import substring as SS


def docs_df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def py_dup_spans(rows, w, stride=1, min_docs=2, max_docs=None):
    """Reference implementation: dict-of-fingerprints + interval merge."""
    seen = {}
    wins = {}
    for did, text in rows:
        toks = text.split(" ")
        wins[did] = []
        for pos in range(0, max(0, len(toks) - w + 1), stride):
            fp = hashlib.md5(" ".join(toks[pos:pos + w]).encode()).hexdigest()
            wins[did].append((pos + 1, fp))
            seen.setdefault(fp, set()).add(did)
    dup = {
        fp for fp, ds in seen.items()
        if len(ds) >= min_docs and (max_docs is None or len(ds) <= max_docs)
    }
    spans = {}
    for did, ws in wins.items():
        ivs = sorted(p for p, fp in ws if fp in dup)
        merged = []
        for p in ivs:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + w)
            else:
                merged.append([p, p + w])
        if merged:
            spans[did] = [tuple(m) for m in merged]
    return spans


CORPUS = [
    (0, "a b c d e f g h i j k l m n o p"),
    (1, "z z a b c d e f g h q r s t u v"),
    (2, "completely different words here only four"),
    (3, "a b c d e f g h i j k l zz yy xx ww"),
    (4, "the tail also matches i j k l m n o p"),
]


class TestSpans:
    def test_matches_python_reference(self, spark):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in SS.substring_dup_spans(docs_df(spark, CORPUS), w=8).collect()
        }
        want = {
            (did, s, e)
            for did, sp in py_dup_spans(CORPUS, w=8).items()
            for s, e in sp
        }
        assert got == want

    def test_disjoint_spans_stay_separate(self, spark):
        rows = [
            (0, "a b c d e f g h X Y Z Q m n o p q r s t"),
            (1, "a b c d e f g h 1 2 3 4 m n o p q r s t"),
        ]
        got = sorted(
            (r.span_start, r.span_end)
            for r in SS.substring_dup_spans(docs_df(spark, rows), w=8)
            .where(F.col("doc_id") == 0)
            .collect()
        )
        assert got == [(1, 9), (13, 21)]

    def test_max_docs_caps_boilerplate(self, spark):
        # the same 8-token banner in every doc; unique bodies
        rows = [
            (i, "site chrome banner text common to every page "
                + " ".join(f"u{i}x{j}" for j in range(8)))
            for i in range(6)
        ]
        capped = SS.substring_dup_spans(
            docs_df(spark, rows), w=8, max_docs=3
        ).count()
        uncapped = SS.substring_dup_spans(docs_df(spark, rows), w=8).count()
        assert uncapped == 6 and capped == 0

    def test_stride_samples_windows(self, spark):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in SS.substring_dup_spans(
                docs_df(spark, CORPUS), w=8, stride=4
            ).collect()
        }
        want = {
            (did, s, e)
            for did, sp in py_dup_spans(CORPUS, w=8, stride=4).items()
            for s, e in sp
        }
        assert got == want
        # strided starts only: every span starts on a sampled position
        assert all((s - 1) % 4 == 0 for _, s, _e in got)

    def test_short_docs_emit_nothing(self, spark):
        rows = [(0, "a b c"), (1, "a b c")]
        assert SS.window_fingerprints(docs_df(spark, rows), w=8).count() == 0


class TestFractionAndStrip:
    def test_fraction_accounts_every_doc(self, spark):
        rows = {
            r.doc_id: r
            for r in SS.substring_dup_fraction(
                docs_df(spark, CORPUS), w=8
            ).collect()
        }
        assert set(rows) == {0, 1, 2, 3, 4}
        assert rows[2].dup_tokens == 0 and rows[2].dup_fraction == 0.0
        spans = py_dup_spans(CORPUS, w=8)
        for did, sp in spans.items():
            assert rows[did].dup_tokens == sum(e - s for s, e in sp)
            assert rows[did].dup_fraction == pytest.approx(
                rows[did].dup_tokens / rows[did].n_tokens
            )

    def test_strip_removes_exactly_the_spans(self, spark):
        got = {
            r.doc_id: r.text
            for r in SS.strip_dup_spans(docs_df(spark, CORPUS), w=8).collect()
        }
        spans = py_dup_spans(CORPUS, w=8)
        for did, text in CORPUS:
            toks = text.split(" ")
            covered = set()
            for s, e in spans.get(did, []):
                covered.update(range(s, e))
            want = " ".join(
                t for i, t in enumerate(toks, start=1) if i not in covered
            )
            assert got[did] == want, did

    def test_strip_preserves_schema_and_clean_docs(self, spark):
        df = docs_df(spark, CORPUS).withColumn("lang", F.lit("en"))
        out = SS.strip_dup_spans(df, w=8)
        assert out.columns == df.columns
        clean = out.where(F.col("doc_id") == 2).first()
        assert clean.text == CORPUS[2][1] and clean.lang == "en"


class TestPlanShape:
    def test_no_python_and_no_token_explode_on_merge_path(self, spark):
        from tests.test_plan_audit import phys

        out = SS.substring_dup_fraction(docs_df(spark, CORPUS), w=8)
        out.collect()
        p = phys(out).split("== Initial Plan ==")[0]
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # the window explode ran ONCE inside the fingerprint checkpoint
        # job: the final plan re-reads that relation (ExistingRDD with a
        # pos column) on both branches instead of re-fingerprinting, and
        # the span merge never re-explodes windows into per-token rows
        assert p.count("Generate explode") == 0
        fp_scans = [
            ln for ln in p.splitlines()
            if "Scan ExistingRDD" in ln and ",pos#" in ln
        ]
        assert len(fp_scans) == 2, fp_scans
        # the stats-less checkpoint side must not be broadcast wholesale:
        # the fp join stays a shuffle join (SortMergeJoin)
        assert "SortMergeJoin" in p
