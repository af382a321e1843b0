"""Chunk-level boilerplate dedup, integer-exact distributed k-means, and
product-quantization ANN — each checked against an independent pure-Python
reference of the same integer-exact contract.

Reference parity targets: the curation role of CCNet/RefinedWeb paragraph
dedup and FAISS's KMeans/PQ index layouts, re-expressed as Catalyst plans
(see module docstrings for the 100 TB plan shapes).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.chunkdedup import (
    CHUNK_W,
    remove_duplicate_chunks,
)
from usgs_geomag_algorithms_spark.operators.kmeans import (
    kmeans_centroids,
    kmeans_fit,
)
from usgs_geomag_algorithms_spark.operators.pq import (
    md5_sign_codebooks,
    pq_adc_topk,
    pq_encode,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ references
def _quant_int8(vec):
    """Mirror quantize_int8: floor(x / max|x| * 127 + 0.5), float64 ops."""
    import math

    xs = [float(x) for x in vec]
    mx = max(abs(x) for x in xs)
    if mx == 0:
        return None
    return [int(math.floor(x / mx * 127.0 + 0.5)) for x in xs]


def _ref_kmeans(vecs: dict, k: int, n_iter: int):
    """Integer-state Lloyd's, the exact contract of kmeans_fit."""
    ids = sorted(vecs)
    state = [(list(vecs[i]), 1) for i in ids[:k]]
    dim = len(state[0][0])
    for _ in range(n_iter):
        agg: dict = {}
        for vid in ids:
            q = vecs[vid]
            best = None
            for c, (s, n) in enumerate(state):
                s2 = sum(v * v for v in s)
                idot = sum(x * y for x, y in zip(q, s))
                sc = float(s2 - 2 * n * idot) / float(n * n)
                if best is None or sc < best[0]:
                    best = (sc, c)
            cell = best[1]
            s, n = agg.setdefault(cell, ([0] * dim, 0))
            for j, x in enumerate(q):
                s[j] += x
            agg[cell] = (s, n + 1)
        state = [agg.get(c, state[c]) for c in range(k)]
    return state


def _load_qvecs(spark, limit):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(limit)
        .collect()
    )
    out = {}
    for r in rows:
        q = _quant_int8(r["embedding"])
        if q is not None:
            out[int(r["vec_id"])] = q
    return out


# ------------------------------------------------------------ chunk dedup
class TestChunkDedup:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shared_chunk_removed_everywhere(self, spark):
        boiler = " ".join(f"nav{i}" for i in range(CHUNK_W))
        rows = [
            (1, boiler + " " + "alpha beta gamma"),
            (2, boiler + " " + "delta epsilon"),
            (3, "unique words only here"),
        ]
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_chunks(self._docs(spark, rows)).collect()
        }
        assert got[1]["clean_text"] == "alpha beta gamma"
        assert got[2]["clean_text"] == "delta epsilon"
        assert got[3]["clean_text"] == "unique words only here"
        assert got[1]["n_chunks"] == 2 and got[1]["kept_chunks"] == 1
        assert got[1]["removed_fraction"] == pytest.approx(0.5)
        assert got[3]["removed_fraction"] == 0.0

    def test_all_boilerplate_doc_survives_empty(self, spark):
        boiler = " ".join(f"w{i}" for i in range(CHUNK_W))
        rows = [(1, boiler), (2, boiler)]
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_chunks(self._docs(spark, rows)).collect()
        }
        for d in (1, 2):
            assert got[d]["kept_chunks"] == 0
            assert got[d]["clean_text"] == ""
            assert got[d]["removed_fraction"] == 1.0

    def test_remainder_chunk_and_order(self, spark):
        # 10 words -> chunks of 8 + 2; duplicate only the 2-word tail
        tail = "common tail"
        rows = [
            (1, " ".join(f"a{i}" for i in range(CHUNK_W)) + " " + tail),
            (2, " ".join(f"b{i}" for i in range(CHUNK_W)) + " " + tail),
        ]
        got = {
            r["doc_id"]: r
            for r in remove_duplicate_chunks(self._docs(spark, rows)).collect()
        }
        assert got[1]["clean_text"] == " ".join(f"a{i}" for i in range(CHUNK_W))
        assert got[1]["n_chunks"] == 2 and got[1]["kept_chunks"] == 1

    def test_matches_python_reference_on_corpus_sample(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id")
            .limit(60)
            .select("doc_id", "text")
        )
        rows = docs.collect()
        # pure-python replica
        chunks = {}
        for r in rows:
            w = r["text"].split(" ")
            cs = [
                " ".join(w[i : i + CHUNK_W]) for i in range(0, len(w), CHUNK_W)
            ]
            chunks[r["doc_id"]] = cs
        fp_docs: dict = {}
        for d, cs in chunks.items():
            for c in cs:
                fp_docs.setdefault(hashlib.md5(c.encode()).hexdigest(), set()).add(d)
        dup = {fp for fp, ds in fp_docs.items() if len(ds) >= 2}
        expect = {}
        for d, cs in chunks.items():
            kept = [c for c in cs if hashlib.md5(c.encode()).hexdigest() not in dup]
            expect[d] = (
                len(cs),
                len(kept),
                (len(cs) - len(kept)) / len(cs),
                " ".join(kept),
            )
        got = {
            r["doc_id"]: (
                r["n_chunks"],
                r["kept_chunks"],
                r["removed_fraction"],
                r["clean_text"],
            )
            for r in remove_duplicate_chunks(docs).collect()
        }
        assert got == expect


# ------------------------------------------------------------ k-means
class TestKmeans:
    def test_matches_integer_reference_bit_for_bit(self, spark):
        vecs = _load_qvecs(spark, 60)
        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(60)
        )
        got = {
            (r["cell"], r["i"]): (r["csum"], r["n"])
            for r in kmeans_fit(emb, k=4, n_iter=2).collect()
        }
        state = _ref_kmeans(vecs, k=4, n_iter=2)
        expect = {
            (c, i): (s[i], n)
            for c, (s, n) in enumerate(state)
            for i in range(len(s))
        }
        assert got == expect

    def test_empty_cell_carries_prior_state(self, spark):
        # two tight clusters + 4 requested cells: seeds 0 and 1 both sit in
        # cluster A, so at least one seed cell must end up empty and carry
        # its single-seed state forward.
        rows = []
        for vid in range(8):
            base = 1.0 if vid < 4 else -1.0
            rows.append((vid, [base, base, 0.1 * (vid % 2), 0.0]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        vecs = {vid: _quant_int8(v) for vid, v in rows}
        # n_iter=1: seeds 2 and 3 duplicate seeds 0 and 1, so the first
        # assignment leaves cells 2/3 empty and the final union must carry
        # their seed state (n=1) forward.
        got = {
            (r["cell"], r["i"]): (r["csum"], r["n"])
            for r in kmeans_fit(emb, k=4, n_iter=1).collect()
        }
        state = _ref_kmeans(vecs, k=4, n_iter=1)
        expect = {
            (c, i): (s[i], n)
            for c, (s, n) in enumerate(state)
            for i in range(len(s))
        }
        assert got == expect
        # sanity: the scenario actually exercises carry-forward
        ns = {c: n for (c, _i), (_s, n) in got.items()}
        assert any(n == 1 for n in ns.values())

    def test_centroids_shape_and_norm(self, spark):
        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(40)
        )
        cents = kmeans_centroids(emb, k=3, n_iter=2)
        assert len(cents) == 3
        for v in cents:
            assert len(v) == 64
            n = sum(x * x for x in v) ** 0.5
            assert n == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------------ PQ
class TestPQ:
    def _ref_encode(self, q, cbs):
        m, ks, d = len(cbs), len(cbs[0]), len(cbs[0][0])
        codes = []
        for s in range(m):
            best = None
            for c in range(ks):
                dot = sum(
                    q[s * d + j] * cbs[s][c][j] for j in range(d)
                )
                if best is None or dot > best[0]:
                    best = (dot, c)
            codes.append(best[1])
        return codes

    def test_encode_matches_reference(self, spark):
        vecs = _load_qvecs(spark, 40)
        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(40)
        )
        cbs = md5_sign_codebooks()
        got = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb).collect()
        }
        expect = {vid: self._ref_encode(q, cbs) for vid, q in vecs.items()}
        assert got == expect

    def test_adc_topk_matches_reference(self, spark):
        vecs = _load_qvecs(spark, 40)
        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(40)
        )
        queries = emb.where(F.col("vec_id") < 3)
        cbs = md5_sign_codebooks()
        m, ks, d = len(cbs), len(cbs[0]), len(cbs[0][0])
        codes = {vid: self._ref_encode(q, cbs) for vid, q in vecs.items()}
        expect = {}
        for q_id in (0, 1, 2):
            if q_id not in vecs:
                continue
            lut = [
                [
                    sum(
                        vecs[q_id][s * d + j] * cbs[s][c][j]
                        for j in range(d)
                    )
                    for c in range(ks)
                ]
                for s in range(m)
            ]
            scored = sorted(
                (
                    (-sum(lut[s][codes[n][s]] for s in range(m)), n)
                    for n in codes
                    if n != q_id
                ),
            )[:3]
            for rank, (neg, n) in enumerate(scored, 1):
                expect[(q_id, n)] = (-neg, rank)
        got = {
            (r["q_id"], r["n_id"]): (r["adc_score"], r["rank"])
            for r in pq_adc_topk(emb, queries, k=3).collect()
        }
        assert got == expect

    def test_encode_is_map_only(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        df = pq_encode(emb)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final


# ------------------------------------------------------------ trained IVF
class TestIvfKmeans:
    def test_probe_all_equals_flat_int8_topk(self, spark):
        from pyspark.sql import functions as F

        from usgs_geomag_algorithms_spark.operators.kmeans import (
            ivf_kmeans_topk,
        )
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8,
        )

        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(120)
        )
        queries = emb.where(F.col("vec_id") < 4)
        km_k = 4
        ivf = {
            (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
            for r in ivf_kmeans_topk(
                emb, queries, k=3, n_probe=km_k, km_k=km_k, n_iter=2
            ).collect()
        }
        flat = {
            (r["q_id"], r["rank"]): (r["n_id"], r["cosine"])
            for r in cosine_topk_int8(emb, queries, k=3).collect()
        }
        assert ivf == flat

    def test_narrow_probe_recall(self, spark):
        from pyspark.sql import functions as F

        from usgs_geomag_algorithms_spark.operators.kmeans import (
            ivf_kmeans_topk,
        )
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 10)
        ivf = {
            (r["q_id"], r["n_id"])
            for r in ivf_kmeans_topk(
                emb, queries, k=3, n_probe=2, km_k=4, n_iter=2
            ).collect()
        }
        exact = {
            (r["q_id"], r["n_id"])
            for r in cosine_topk_int8(emb, queries, k=3).collect()
        }
        assert len(ivf & exact) / len(exact) >= 0.5


# ------------------------------------------------------------ IVF-PQ
class TestIvfPq:
    def test_probe_all_equals_flat_pq(self, spark):
        from usgs_geomag_algorithms_spark.operators.pq import (
            IVF_PQ_CELLS,
            ivf_pq_topk,
        )

        emb = (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(120)
        )
        queries = emb.where(F.col("vec_id") < 4)
        ivf = {
            (r["q_id"], r["rank"]): (r["n_id"], r["adc_score"])
            for r in ivf_pq_topk(
                emb, queries, k=3, n_probe=IVF_PQ_CELLS
            ).collect()
        }
        flat = {
            (r["q_id"], r["rank"]): (r["n_id"], r["adc_score"])
            for r in pq_adc_topk(emb, queries, k=3).collect()
        }
        assert ivf == flat

    def test_index_is_one_corpus_projection(self, spark):
        from usgs_geomag_algorithms_spark.operators.pq import ivf_pq_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(80)
        queries = emb.where(F.col("vec_id") < 2)
        out = ivf_pq_topk(emb, queries, k=3)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # corpus side: zero shuffles before the broadcast probe join; the
        # only exchange is the final rank window's
        assert final.count("Exchange hashpartitioning") <= 1, final
        assert "BroadcastHashJoin" in final


class TestChunkDedupHypothesis:
    def test_random_corpora_match_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        word = st.sampled_from(["a", "b", "c", "nav0", "nav1", "x"])
        corpus = st.lists(
            st.lists(word, min_size=1, max_size=2 * CHUNK_W + 3).map(
                " ".join
            ),
            min_size=1,
            max_size=5,
        )

        @settings(max_examples=8, deadline=None)
        @given(corpus)
        def check(texts):
            docs = spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)],
                "doc_id long, text string",
            )
            chunks = {
                i: [
                    " ".join(t.split(" ")[j : j + CHUNK_W])
                    for j in range(0, len(t.split(" ")), CHUNK_W)
                ]
                for i, t in enumerate(texts)
            }
            dup = {
                c
                for i, cs in chunks.items()
                for c in cs
                if any(c in chunks[j] for j in chunks if j != i)
            }
            expect = {}
            for i, cs in chunks.items():
                kept = [c for c in cs if c not in dup]
                expect[i] = (len(cs), len(kept), " ".join(kept))
            got = {
                r["doc_id"]: (r["n_chunks"], r["kept_chunks"], r["clean_text"])
                for r in remove_duplicate_chunks(docs).collect()
            }
            assert got == expect

        check()


# ------------------------------------------- Arrow kernel == SQL expression
class TestArrowKernelParity:
    """The vectorized Arrow/NumPy index kernels (annkernels.py) must be
    BIT-IDENTICAL to the Catalyst-expression path they accelerate — same
    integer dots, same first-max/lower-index tie-breaks. These tests pin
    that equivalence on real data (incl. the quantization float64 ops)."""

    def test_pq_encode_vectorized_equals_sql(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        vec = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, vectorized=True).collect()
        }
        sql = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, vectorized=False).collect()
        }
        assert vec == sql and len(vec) > 0

    def test_ivf_pq_vectorized_equals_sql(self, spark):
        from usgs_geomag_algorithms_spark.operators.pq import ivf_pq_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 5)
        key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
        vec = {
            key(r): (r["n_id"], r["adc_score"])
            for r in ivf_pq_topk(emb, queries, vectorized=True).collect()
        }
        sql = {
            key(r): (r["n_id"], r["adc_score"])
            for r in ivf_pq_topk(emb, queries, vectorized=False).collect()
        }
        assert vec == sql and len(vec) > 0

    def test_ivf_kmeans_vectorized_equals_sql(self, spark):
        from usgs_geomag_algorithms_spark.operators.kmeans import (
            ivf_kmeans_topk,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 5)
        key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
        vec = {
            key(r): (r["n_id"], r["cosine"])
            for r in ivf_kmeans_topk(emb, queries, vectorized=True).collect()
        }
        sql = {
            key(r): (r["n_id"], r["cosine"])
            for r in ivf_kmeans_topk(emb, queries, vectorized=False).collect()
        }
        assert vec == sql and len(vec) > 0

    def test_ivf_assign_arrow_equals_assign_cells(self, spark):
        from usgs_geomag_algorithms_spark.operators.annkernels import (
            ivf_assign_arrow,
        )
        from usgs_geomag_algorithms_spark.operators.kmeans import (
            _assign_cells,
        )
        from usgs_geomag_algorithms_spark.operators.quantize import (
            quantize_int8,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        # deliberately unequal member counts so the n² division matters
        state = [([7] * 64, 3), ([-5] * 64, 11), ([1] * 32 + [-1] * 32, 1)]
        vec = {
            r["n_id"]: (list(r["qvec"]), r["cell"])
            for r in ivf_assign_arrow(emb, state).collect()
        }
        sql = {
            r["vec_id"]: (list(r["qvec"]), r["cell"])
            for r in _assign_cells(quantize_int8(emb), state)
            .select("vec_id", "qvec", "cell")
            .collect()
        }
        assert vec == sql and len(vec) > 0
