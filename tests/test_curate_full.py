"""curate_full: the composed pretraining build — every gate exercised by a
planted document, sample determinism, and gate independence."""

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.curate import (
    curate_full,
    sample_uniform,
)

EN = (
    "the quick brown fox and the lazy dog were found in the house "
    "with that other dog and this was not a surprise for they had "
    "been there for days"
)
EN2 = (
    "it was the best of times and it was the worst of times for the "
    "dogs that were in the house with all the other animals that day "
    "and the days after that one"
)


def corpus(spark):
    rows = [
        (0, EN, "web"),                        # survives everything
        (1, EN, "web"),                        # exact dup of 0 -> dropped
        (2, EN + " extra", "web"),             # near-dup of 0 -> non-canonical
        (3, "le chat est dans la maison avec les autres et il est la", "web"),
        (4, "zzzz!!!! ####### @@@@", "web"),   # junk quality
        (5, EN2, "web"),                       # clean independent survivor
        (6, EN2, "ads"),                       # exact-dup text, rate-0 stratum
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestCurateFull:
    def test_every_gate_fires(self, spark):
        out = curate_full(
            corpus(spark),
            lang="en",
            min_quality=0.7,
            jaccard=0.3,
            max_dup_fraction=0.9,
            substr_w=8,
            rates={"web": 1.0, "ads": 0.0},
        ).collect()
        ids = sorted(r.doc_id for r in out)
        # 1 exact dup, 2 non-canonical near-dup, 3 lang, 4 quality,
        # 6 rate-0 stratum (and 6 is also a non-canonical dup of 5's text)
        assert ids == [0, 5]
        by_id = {r.doc_id: r for r in out}
        assert by_id[0].source == "web" and by_id[0].pred_lang == "en"
        # doc 0's text is substring-shared with docs 1/2/6-family, so its
        # coverage is high but below the loose gate
        assert 0.0 <= by_id[0].dup_fraction <= 0.9

    def test_substring_gate_drops_heavy_coverage(self, spark):
        # tighten the coverage gate below doc 0's (its text recurs
        # verbatim in docs 1 and 2, so coverage is ~1.0)
        out = curate_full(
            corpus(spark),
            lang="en",
            min_quality=0.7,
            jaccard=0.999,  # near-dup gate effectively off (exact only)
            max_dup_fraction=0.5,
            substr_w=8,
            rates=None,
        ).collect()
        ids = {r.doc_id for r in out}
        assert 0 not in ids  # full-coverage duplicated spans
        assert 5 in ids      # EN2 recurs only as doc 6's exact dup text

    def test_sample_is_deterministic_and_content_free(self, spark):
        df = corpus(spark)
        u = df.select(
            "doc_id", sample_uniform(F.col("doc_id")).alias("u")
        ).collect()
        assert all(0.0 <= r.u < 1.0 for r in u)
        a = curate_full(df, rates={"web": 0.75, "ads": 0.75}).collect()
        b = curate_full(df, rates={"web": 0.75, "ads": 0.75}).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestLeakageSafeSplit:
    def test_clusters_never_straddle_and_split_is_deterministic(self, spark):
        import hashlib

        from usgs_geomag_algorithms_spark.operators.curate import (
            leakage_safe_split,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = leakage_safe_split(docs, threshold=0.3).collect()
        assert len(rows) == docs.count()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
            # md5 first-8-hex dyadic rational, replicated locally
            u = int(
                hashlib.md5(str(r["cluster_id"]).encode()).hexdigest()[:8],
                16,
            ) / 4294967296.0
            assert r["split"] == ("holdout" if u < 0.25 else "train")
        assert all(len(s) == 1 for s in by_cluster.values())
        splits = {r["split"] for r in rows}
        assert splits == {"train", "holdout"}


class TestDomainCap:
    def test_cap_matches_python_reference(self, spark):
        import hashlib

        from usgs_geomag_algorithms_spark.operators.curate import (
            cap_per_domain,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "source")
        rows = docs.collect()
        by_dom: dict = {}
        for r in rows:
            by_dom.setdefault(r["source"], []).append(r["doc_id"])
        expect = {}
        for dom, ids in by_dom.items():
            ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            for rank, i in enumerate(ids[:5], 1):
                expect[i] = (dom, rank)
        got = {
            r["doc_id"]: (r["source"], r["domain_rank"])
            for r in cap_per_domain(docs, max_docs=5).collect()
        }
        assert got == expect

    def test_cap_validates(self, spark):
        import pytest as _pytest

        from usgs_geomag_algorithms_spark.operators.curate import (
            cap_per_domain,
        )

        docs = spark.createDataFrame(
            [(1, "a")], "doc_id long, source string"
        )
        with _pytest.raises(ValueError):
            cap_per_domain(docs, max_docs=0)


class TestUpsampleStratified:
    def test_copies_match_python_reference(self, spark):
        import hashlib
        import math

        from usgs_geomag_algorithms_spark.operators.curate import (
            upsample_stratified,
        )

        rates = {"src0": 2.5, "src1": 0.5, "src2": 1.0, "src3": 0.0}
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "source")
        rows = docs.collect()
        expect: dict = {}
        for r in rows:
            rate = rates.get(r["source"], 0.0)
            u = int(
                hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
            ) / 4294967296.0
            n = int(math.floor(rate)) + (1 if u < rate - math.floor(rate) else 0)
            if n > 0:
                expect[r["doc_id"]] = (r["source"], list(range(n)))
        got: dict = {}
        for r in upsample_stratified(docs, rates).collect():
            got.setdefault(r["doc_id"], (r["source"], []))[1].append(r["copy"])
        got = {k: (s, sorted(c)) for k, (s, c) in got.items()}
        assert got == expect

    def test_integer_rate_is_exact_replication(self, spark):
        from usgs_geomag_algorithms_spark.operators.curate import (
            upsample_stratified,
        )

        docs = spark.createDataFrame(
            [(i, "w") for i in range(10)], "doc_id long, source string"
        )
        out = upsample_stratified(docs, {"w": 3.0}).collect()
        assert len(out) == 30
        assert {r["copy"] for r in out} == {0, 1, 2}

    def test_rate_below_one_matches_stratified_sample(self, spark):
        from usgs_geomag_algorithms_spark.operators.curate import (
            stratified_sample,
            upsample_stratified,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "source")
        rates = {f"src{i}": (i % 5) / 4.0 for i in range(20)}
        up = {r["doc_id"] for r in upsample_stratified(docs, rates).collect()}
        down = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
        assert up == down
