"""URL canonicalization / URL dedup / cross-source overlap."""

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.overlap import source_overlap
from usgs_geomag_algorithms_spark.operators.urls import (
    canonical_url,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c"))
        .collect()
    ]


class TestCanonicalUrl:
    def test_scheme_www_port_fragment(self, spark):
        out = _canon(
            spark,
            [
                "http://www.a.com:80/p/1?q=2#top",
                "https://a.com/p/1?q=2",
                "https://www.a.com:443/p/1?q=2",
            ],
        )
        assert out == ["https://a.com/p/1?q=2"] * 3

    def test_tracking_params_dropped_and_sorted(self, spark):
        out = _canon(
            spark,
            [
                "https://a.com/x?utm_source=feed&b=2&a=1&gclid=zz",
                "https://a.com/x?a=1&fbclid=k&b=2",
                "https://a.com/x?b=2&a=1",
            ],
        )
        assert out == ["https://a.com/x?a=1&b=2"] * 3

    def test_all_params_tracking_drops_query(self, spark):
        out = _canon(
            spark,
            ["https://a.com/x?utm_campaign=c&ref=r", "https://a.com/x"],
        )
        assert out == ["https://a.com/x"] * 2

    def test_trailing_slash(self, spark):
        out = _canon(spark, ["https://a.com/x/", "https://a.com/x"])
        assert out == ["https://a.com/x"] * 2

    def test_non_default_port_and_meaningful_params_kept(self, spark):
        out = _canon(spark, ["http://a.com:8080/x?z=1&y=2"])
        assert out == ["https://a.com:8080/x?y=2&z=1"]


class TestUrlDedup:
    def test_keeper_is_min_id_per_group(self, spark):
        rows = [
            (1, "http://www.a.com/p?utm_source=s"),
            (2, "https://a.com/p"),
            (3, "https://a.com/other"),
        ]
        out = {
            r["doc_id"]: (r["canonical_url"], r["is_kept"])
            for r in url_dedup(
                spark.createDataFrame(rows, "doc_id int, url string")
            ).collect()
        }
        assert out[1] == ("https://a.com/p", True)
        assert out[2] == ("https://a.com/p", False)
        assert out[3] == ("https://a.com/other", True)

    def test_exactly_one_keeper_per_canonical(self, spark):
        rows = [
            (i, f"http://www.h.com/p/{i % 3}?utm_c=x&v={i % 3}")
            for i in range(30)
        ]
        got = url_dedup(
            spark.createDataFrame(rows, "doc_id int, url string")
        )
        per = (
            got.groupBy("canonical_url")
            .agg(
                F.sum(F.col("is_kept").cast("int")).alias("k"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        assert len(per) == 3
        assert all(r["k"] == 1 for r in per)
        assert sum(r["n"] for r in per) == 30


class TestSourceOverlap:
    def test_matches_hand_computation(self, spark):
        # n=2 shingles: sets are position 1..max(len-1,1) substrings
        docs = spark.createDataFrame(
            [
                ("s1", "abcd"),   # {ab, bc, cd}
                ("s1", "xy"),     # {xy}
                ("s2", "bcde"),   # {bc, cd, de}
                ("s3", "zz"),     # {zz}
            ],
            "source string, text string",
        )
        out = {
            (r["src_a"], r["src_b"]): r
            for r in source_overlap(docs, n=2).collect()
        }
        assert set(out) == {("s1", "s2")}
        r = out[("s1", "s2")]
        assert (r["n_a"], r["n_b"], r["inter"]) == (4, 3, 2)
        assert abs(r["jaccard"] - 2 / 5) < 1e-15

    def test_symmetric_ordering_and_self_excluded(self, spark):
        docs = spark.createDataFrame(
            [("b", "hello"), ("a", "hello"), ("a", "hello world")],
            "source string, text string",
        )
        rows = source_overlap(docs, n=4).collect()
        assert all(r["src_a"] < r["src_b"] for r in rows)
        assert len(rows) == 1  # (a, b) once, never (a, a)


class TestNewOpPlans:
    """Executed-plan audits (AQE final plan — collect first, match before
    '== Initial Plan ==', per NOTES.md)."""

    PY_NODES = (
        "BatchEvalPython",
        "ArrowEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
    )

    def _phys(self, df) -> str:
        df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
        return df._jdf.queryExecution().executedPlan().toString()

    def test_url_dedup_single_exchange_no_python(self, spark):
        rows = [(i, f"http://www.h.com/p/{i % 5}?v={i % 5}") for i in range(100)]
        out = url_dedup(spark.createDataFrame(rows, "doc_id int, url string"))
        out.collect()
        p = self._phys(out).split("== Initial Plan ==")[0]
        assert p.count("Exchange hashpartitioning") == 1
        assert all(n not in p for n in self.PY_NODES)

    def test_source_overlap_no_python_and_partial_aggs(self, spark):
        docs = spark.createDataFrame(
            [(f"s{i % 4}", f"text body number {i} with shared words")
             for i in range(80)],
            "source string, text string",
        )
        out = source_overlap(docs, n=4)
        out.collect()
        p = self._phys(out).split("== Initial Plan ==")[0]
        assert all(n not in p for n in self.PY_NODES)
        # sizes join both sides broadcast; no corpus-sized shuffle join
        assert p.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in p


class TestCanonicalProperties:
    """Property: canonicalization is idempotent and invariant across the
    messy-variant space (hypothesis over generated URL components)."""

    def test_idempotent_and_variant_invariant(self, spark):
        from hypothesis import given, settings, strategies as st

        hosts = st.sampled_from(["a.com", "b-site.org", "x.co"])
        paths = st.lists(
            st.sampled_from(["p", "q2", "r-r", "s_s"]), min_size=0,
            max_size=3,
        )
        params = st.lists(
            st.sampled_from(["a=1", "b=2", "c=x", "zz=9"]),
            min_size=0, max_size=4, unique=True,
        )
        tracking = st.lists(
            st.sampled_from(
                ["utm_source=f", "utm_c=x", "gclid=g1", "fbclid=f1", "ref=r"]
            ),
            min_size=0, max_size=3, unique=True,
        )

        cases = []

        @settings(max_examples=60, deadline=None)
        @given(
            host=hosts, path=paths, ps=params, tr=tracking,
            scheme=st.sampled_from(["http://", "https://"]),
            www=st.booleans(), port=st.sampled_from(["", ":80", ":443"]),
            slash=st.booleans(), frag=st.booleans(),
            shuffle=st.randoms(),
        )
        def collect(host, path, ps, tr, scheme, www, port, slash, frag,
                    shuffle):
            allp = ps + tr
            shuffle.shuffle(allp)
            u = (
                scheme + ("www." if www else "") + host + port
                + "/" + "/".join(path) + ("/" if slash and path else "")
                + ("?" + "&".join(allp) if allp else "")
                + ("#top" if frag else "")
            )
            # key: the canonical form must depend ONLY on (host, path, ps)
            cases.append((u, (host, tuple(path), tuple(sorted(ps)))))

        collect()
        df = spark.createDataFrame(
            [(u, str(k)) for u, k in cases], "url string, key string"
        )
        out = df.select(
            "key", canonical_url(F.col("url")).alias("c1")
        ).withColumn("c2", canonical_url(F.col("c1")))
        rows = out.collect()
        # idempotence
        assert all(r["c1"] == r["c2"] for r in rows)
        # variant invariance: same key -> same canonical, diff key -> diff
        by_key = {}
        for r in rows:
            by_key.setdefault(r["key"], set()).add(r["c1"])
        assert all(len(v) == 1 for v in by_key.values())
        canons = [next(iter(v)) for v in by_key.values()]
        assert len(set(canons)) == len(canons)


class TestSourceOverlapSketch:
    def test_tracks_exact_operator(self, spark):
        from usgs_geomag_algorithms_spark.operators.overlap import (
            source_overlap_sketch,
        )

        # heavily overlapping synthetic sources with distinct tails
        rows = []
        for s in range(4):
            for i in range(60):
                shared = " ".join(f"common{j}" for j in range(i % 7))
                rows.append(
                    (f"s{s}", f"{shared} body text {s * (i % 3)} tail{s}-{i}")
                )
        docs = spark.createDataFrame(rows, "source string, text string")
        exact = {
            (r["src_a"], r["src_b"]): r
            for r in __import__(
                "usgs_geomag_algorithms_spark.operators.overlap",
                fromlist=["source_overlap"],
            ).source_overlap(docs, n=6).collect()
        }
        est = {
            (r["src_a"], r["src_b"]): r
            for r in source_overlap_sketch(docs, n=6).collect()
        }
        # every real pair with meaningful overlap is found with sizes and
        # intersections close to exact (HLL at lg_k=14 on small sets is
        # near-exact: sparse mode is lossless until ~0.75*2^14 items)
        for k, ex in exact.items():
            if ex["inter"] < 5:
                continue
            got = est[k]
            assert abs(got["n_a"] - ex["n_a"]) / ex["n_a"] < 0.03
            assert abs(got["inter"] - ex["inter"]) / ex["inter"] < 0.10
            assert abs(got["jaccard"] - ex["jaccard"]) < 0.05

    def test_single_corpus_aggregate_no_second_scan(self, spark):
        from usgs_geomag_algorithms_spark.operators.overlap import (
            source_overlap_sketch,
        )

        docs = spark.createDataFrame(
            [(f"s{i % 3}", f"words shared words tail {i}") for i in range(50)],
            "source string, text string",
        )
        out = source_overlap_sketch(docs, n=4)
        out.collect()
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        p = (
            out._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        # the pair join broadcasts the S-row sketch side; the corpus is
        # scanned by exactly one aggregate chain (LocalTableScan here),
        # never shuffled into a join
        assert "SortMergeJoin" not in p
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
