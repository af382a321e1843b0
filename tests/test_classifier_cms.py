"""Hashed linear classifier (operators/classifier.py) and count-min
heavy hitters (operators/cms.py): inline-vs-broadcast-table bit
identity, pruned-model zeros, CMS upper-bound/merge properties, and a
collision-free exactness check at oversized width."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.classifier import (
    N_BUCKETS,
    hashed_linear_score,
    linear_score_with_table,
    md5_weight_table,
)
from usgs_geomag_algorithms_spark.operators.cms import (
    cms_counters,
    cms_estimate,
    cms_merge,
    heavy_hitters,
)

DOCS = [
    (1, "alpha beta gamma alpha"),
    (2, "delta delta delta"),
    (3, "alpha"),
    (4, "epsilon zeta eta theta iota kappa"),
    (5, "beta beta gamma gamma gamma"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


class TestClassifier:
    def test_inline_matches_table_path(self, spark, docs):
        """The broadcast weight-table path is bit-identical to the
        inline-md5 path when the table holds the md5 weights."""
        inline = {
            r["doc_id"]: r.asDict()
            for r in hashed_linear_score(docs).collect()
        }
        table = {
            r["doc_id"]: r.asDict()
            for r in linear_score_with_table(
                docs, md5_weight_table(spark)
            ).collect()
        }
        assert inline == table

    def test_word_count_and_determinism(self, docs):
        rows = {r["doc_id"]: r for r in hashed_linear_score(docs).collect()}
        assert rows[1]["n_words"] == 4
        assert rows[4]["n_words"] == 6
        # same word -> same weight: doc 3 is one 'alpha'
        assert rows[3]["logit_num"] * 4 != 0 or rows[3]["score"] == 0.0
        assert rows[3]["score"] == rows[3]["logit_num"] / rows[3]["n_words"]
        assert rows[3]["keep"] == (rows[3]["logit_num"] > 0)

    def test_pruned_table_scores_zero(self, spark, docs):
        """Buckets missing from a sparsified model contribute 0."""
        empty = md5_weight_table(spark).where(F.lit(False))
        rows = linear_score_with_table(docs, empty).collect()
        assert all(r["logit_num"] == 0 and not r["keep"] for r in rows)

    def test_table_join_broadcasts(self, spark, docs):
        df = linear_score_with_table(docs, md5_weight_table(spark))
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "SortMergeJoin" not in final


class TestCms:
    def test_estimate_upper_bounds_exact(self, docs):
        rows = heavy_hitters(docs, k=50, width=16).collect()
        assert rows, "non-empty corpus must surface hitters"
        for r in rows:
            assert r["est_count"] >= r["exact_count"]
        # deterministic order: est desc, word asc
        keys = [(-r["est_count"], r["word"]) for r in rows]
        assert keys == sorted(keys)

    def test_wide_grid_is_exact(self, docs):
        """With width >> vocab the sketch has no collisions: est == exact
        and the top hitter is the true mode."""
        rows = heavy_hitters(docs, k=50, width=4096).collect()
        assert all(r["est_count"] == r["exact_count"] for r in rows)
        assert rows[0]["word"] in ("alpha", "gamma")  # 4-way tie broken asc
        assert rows[0]["est_count"] == 4

    def test_merge_equals_global(self, spark, docs):
        """Cell-wise addition of per-split grids == the global grid (the
        property that makes the sketch a storable/streamable tier)."""
        a = cms_counters(docs.where(F.col("doc_id") <= 2))
        b = cms_counters(docs.where(F.col("doc_id") > 2))
        merged = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_merge(a, b).collect()
        }
        whole = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_counters(docs).collect()
        }
        assert merged == whole

    def test_plans_are_python_free(self, spark, docs):
        """Classifier, CMS and heavy_hitters never leave the JVM."""
        from usgs_geomag_algorithms_spark.operators.classifier import (
            hashed_linear_score,
        )

        py_nodes = (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
        )
        for df in (
            hashed_linear_score(docs),
            heavy_hitters(docs, k=5),
        ):
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert not any(n in final for n in py_nodes)

    def test_estimate_broadcasts_grid(self, spark, docs):
        grid = cms_counters(docs)
        vocab = docs.select(
            F.explode(F.split("text", " ")).alias("word")
        ).distinct()
        est = cms_estimate(vocab, grid)
        est.collect()
        plan = est._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final
        assert "SortMergeJoin" not in final
