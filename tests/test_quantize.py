"""Int8 quantization: NumPy parity, dequantization error bound, quantized
top-k vs a pure-Python reference, zero-vector contract, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.quantize import (
    cosine_topk_int8,
    quantize_int8,
)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<float>",
    )


def py_quant(v):
    v = np.asarray(v, dtype=np.float32).astype(np.float64)
    m = np.abs(v).max()
    return np.floor(v / m * 127.0 + 0.5).astype(np.int64), m / 127.0


RNG = np.random.default_rng(7)
VECS = RNG.normal(size=(40, 16)).astype(np.float32)


class TestQuantize:
    def test_matches_numpy(self, spark):
        got = {
            r.vec_id: (list(r.qvec), r.scale)
            for r in quantize_int8(emb_df(spark, VECS)).collect()
        }
        for i, v in enumerate(VECS):
            q, s = py_quant(v)
            assert got[i][0] == q.tolist(), i
            assert got[i][1] == pytest.approx(s, abs=0)

    def test_range_and_error_bound(self, spark):
        rows = quantize_int8(emb_df(spark, VECS)).collect()
        for r in rows:
            assert all(-127 <= q <= 127 for q in r.qvec)
            v = VECS[r.vec_id].astype(np.float64)
            err = np.abs(np.array(r.qvec) * r.scale - v).max()
            assert err <= r.scale / 2 + 1e-12

    def test_zero_vectors_dropped(self, spark):
        vecs = [np.zeros(16), np.ones(16)]
        out = quantize_int8(emb_df(spark, vecs)).collect()
        assert [r.vec_id for r in out] == [1]


class TestTopkInt8:
    def test_matches_python_reference(self, spark):
        df = emb_df(spark, VECS)
        got = cosine_topk_int8(df, df.where(F.col("vec_id") < 5), k=3).collect()
        qs = {i: py_quant(v)[0] for i, v in enumerate(VECS)}
        want = {}
        for qi in range(5):
            scores = []
            for ni in range(len(VECS)):
                if ni == qi:
                    continue
                d = int(np.dot(qs[qi], qs[ni]))
                c = d / (
                    np.sqrt(float(np.dot(qs[qi], qs[qi])))
                    * np.sqrt(float(np.dot(qs[ni], qs[ni])))
                )
                scores.append((-c, ni))
            for rank, (negc, ni) in enumerate(sorted(scores)[:3], start=1):
                want[(qi, ni)] = (rank, -negc)
        assert len(got) == 15
        for r in got:
            rank, c = want[(r.q_id, r.n_id)]
            assert r.rank == rank and r.cosine == pytest.approx(c, abs=0)

    def test_quantized_close_to_float_cosine(self, spark):
        # int8 cosine should track float cosine within quantization noise
        df = emb_df(spark, VECS)
        got = cosine_topk_int8(df, df.where(F.col("vec_id") < 5), k=3).collect()
        for r in got:
            a, b = VECS[r.q_id].astype(float), VECS[r.n_id].astype(float)
            ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(r.cosine - ref) < 0.02

    def test_plan_is_jvm_side(self, spark):
        from tests.test_plan_audit import phys

        df = emb_df(spark, VECS)
        out = cosine_topk_int8(df, df.where(F.col("vec_id") < 5), k=3)
        out.collect()
        p = phys(out).split("== Initial Plan ==")[0]
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastNestedLoopJoin" in p  # query side broadcast


class TestRerank:
    def test_large_m_recovers_exact_float_topk(self, spark):
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8_rerank,
        )
        from usgs_geomag_algorithms_spark.operators.similarity import (
            cosine_topk,
        )

        df = emb_df(spark, VECS)
        q = df.where(F.col("vec_id") < 5)
        got = {
            (r.q_id, r.n_id, r.cosine, r.rank)
            for r in cosine_topk_int8_rerank(df, q, k=3, m=len(VECS)).collect()
        }
        want = {
            (r.q_id, r.n_id, r.cosine, r.rank)
            for r in cosine_topk(df, q, k=3).collect()
        }
        assert got == want

    def test_small_m_subsets_candidates(self, spark):
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8,
            cosine_topk_int8_rerank,
        )

        df = emb_df(spark, VECS)
        q = df.where(F.col("vec_id") < 5)
        cand = {
            (r.q_id, r.n_id) for r in cosine_topk_int8(df, q, k=4).collect()
        }
        got = cosine_topk_int8_rerank(df, q, k=3, m=4).collect()
        assert len(got) == 15
        assert all((r.q_id, r.n_id) in cand for r in got)

    def test_float_column_not_scanned_corpus_wide(self, spark, tmp_path):
        """Stage 2 reads the float vectors through a candidate-driven
        broadcast join — the corpus-wide scans feed the int8 stage only."""
        from tests.test_plan_audit import phys

        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8_rerank,
        )

        path = str(tmp_path / "emb")
        emb_df(spark, VECS).write.parquet(path)
        df = spark.read.parquet(path)
        out = cosine_topk_int8_rerank(df, df.where(F.col("vec_id") < 5), k=3, m=6)
        out.collect()
        p = phys(out).split("== Initial Plan ==")[0]
        # the re-rank join must be a broadcast of the Q*m candidate pairs
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


class TestIvfSq8:
    def test_probe_is_cell_subset_with_int8_scores(self, spark):
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8,
            ivf_sq8_topk,
        )
        from usgs_geomag_algorithms_spark.operators.similarity import (
            md5_sign_planes,
        )
        import numpy as np

        cents = np.array(md5_sign_planes(4, 16, seed=5))
        cents = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).tolist()
        df = emb_df(spark, VECS)
        q = df.where(F.col("vec_id") < 5)
        got = ivf_sq8_topk(df, q, k=3, centroids=cents, n_probe=4).collect()
        # n_probe == C: every cell probed -> identical to flat int8 top-k
        want = {
            (r.q_id, r.n_id, r.cosine, r.rank)
            for r in cosine_topk_int8(df, q, k=3).collect()
        }
        assert {(r.q_id, r.n_id, r.cosine, r.rank) for r in got} == want

    def test_narrow_probe_recall(self, spark):
        from usgs_geomag_algorithms_spark.operators.quantize import (
            cosine_topk_int8,
            ivf_sq8_topk,
        )
        from usgs_geomag_algorithms_spark.operators.similarity import (
            md5_sign_planes,
        )
        import numpy as np

        cents = np.array(md5_sign_planes(8, 16, seed=5))
        cents = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).tolist()
        df = emb_df(spark, VECS)
        q = df.where(F.col("vec_id") < 5)
        got = {
            (r.q_id, r.n_id)
            for r in ivf_sq8_topk(df, q, k=3, centroids=cents, n_probe=3).collect()
        }
        exact = {
            (r.q_id, r.n_id)
            for r in cosine_topk_int8(df, q, k=3).collect()
        }
        # approximate by design; probe-3-of-8 should still find most
        assert len(got & exact) / len(exact) >= 0.5
