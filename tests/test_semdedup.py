"""Semantic dedup (operators/semdedup.py): drop rule vs a NumPy
brute-force reference on clustered synthetic vectors, survivor/dropped
partition, zero-vector contract, and tau validation."""

import numpy as np
import pytest

from usgs_geomag_algorithms_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dropped,
)

DIM = 8
K = 2
N_ITER = 2
TAU = (9, 10)


def _corpus():
    """Two well-separated direction clusters; within each, some vectors
    are near-copies (cos > 0.9 after int8 quantization) and some are
    rotated away. Plus one zero vector."""
    rng = np.random.default_rng(7)
    base_a = np.array([1.0] * 4 + [0.0] * 4)
    base_b = np.array([0.0] * 4 + [1.0] * 4)
    rows = []
    for i in range(12):
        base = base_a if i % 2 == 0 else base_b
        if i < 8:  # near-copies: tiny jitter
            v = base + rng.normal(0, 0.01, DIM)
        else:  # distinct members: big jitter
            v = base + rng.normal(0, 0.8, DIM)
        rows.append((i, [float(x) for x in v]))
    rows.append((99, [0.0] * DIM))
    return rows


def _quant(v):
    v = np.asarray(v, dtype=np.float64)
    m = np.abs(v).max()
    if m == 0:
        return None
    return np.floor(v / m * 127.0 + 0.5).astype(np.int64)


def _ref_dropped(rows, cells, tau):
    num, den = tau
    q = {i: _quant(v) for i, v in rows}
    ids = sorted(i for i in q if q[i] is not None)
    out = {}
    for b in ids:
        sims = []
        for a in ids:
            if a >= b or cells[a] != cells[b]:
                continue
            dot = int(q[a] @ q[b])
            n2a, n2b = int(q[a] @ q[a]), int(q[b] @ q[b])
            if dot > 0 and dot * dot * den * den >= num * num * n2a * n2b:
                sims.append(a)
        if sims:
            out[b] = (cells[b], min(sims), len(sims))
    return out


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _corpus(), "vec_id long, embedding array<double>"
    )


class TestSemanticDedup:
    def test_dropped_matches_reference(self, emb):
        dropped = semantic_dropped(
            emb, k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1]
        ).collect()
        cells = {
            r["vec_id"]: r["cell"]
            for r in __import__(
                "usgs_geomag_algorithms_spark.operators.annkernels",
                fromlist=["ivf_assign_arrow"],
            )
            .ivf_assign_arrow(
                emb,
                self._state(emb),
                "vec_id",
                "embedding",
                out_id="vec_id",
            )
            .collect()
        }
        ref = _ref_dropped(_corpus(), cells, TAU)
        got = {
            r["vec_id"]: (r["cell"], r["kept_by"], r["n_dups"])
            for r in dropped
        }
        assert got == ref
        assert len(got) >= 3  # the jittered near-copies collapse

    @staticmethod
    def _state(emb):
        from usgs_geomag_algorithms_spark.operators.kmeans import (
            kmeans_fit,
            state_from_rows,
        )

        return state_from_rows(
            kmeans_fit(emb, k=K, n_iter=N_ITER).collect(), K
        )

    def test_partition(self, emb):
        dropped = {
            r["vec_id"]
            for r in semantic_dropped(
                emb, k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1]
            ).collect()
        }
        kept = {
            r["vec_id"]
            for r in semantic_dedup(
                emb, k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1]
            ).collect()
        }
        assert dropped | kept == {i for i, _ in _corpus()}
        assert not (dropped & kept)

    def test_zero_vector_survives(self, emb):
        kept = {
            r["vec_id"]
            for r in semantic_dedup(
                emb, k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1]
            ).collect()
        }
        assert 99 in kept

    def test_kept_by_is_lower_and_same_cell(self, emb):
        for r in semantic_dropped(
            emb, k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1]
        ).collect():
            assert r["kept_by"] < r["vec_id"]
            assert 1 <= r["n_dups"]

    def test_arrow_matches_sql_path(self, emb):
        kw = dict(k=K, n_iter=N_ITER, tau_num=TAU[0], tau_den=TAU[1])
        fast = {
            tuple(r)
            for r in semantic_dropped(emb, vectorized=True, **kw).collect()
        }
        spec = {
            tuple(r)
            for r in semantic_dropped(emb, vectorized=False, **kw).collect()
        }
        assert fast == spec and fast

    def test_bad_tau_raises(self, emb):
        with pytest.raises(ValueError, match="tau"):
            semantic_dropped(emb, tau_num=0, tau_den=5)
        with pytest.raises(ValueError, match="tau"):
            semantic_dropped(emb, tau_num=6, tau_den=5)


class TestAutoDials:
    def test_auto_k_rule(self):
        from usgs_geomag_algorithms_spark.operators.semdedup import auto_k

        assert auto_k(0) == 2
        assert auto_k(100) == 10
        assert auto_k(1_000_000) == 1000
        # cells stay ~sqrt(N): occupancy N/k also ~sqrt(N)
        assert auto_k(64_000) in range(250, 260)

    def test_semantic_dropped_auto(self, spark):
        from usgs_geomag_algorithms_spark.operators.semdedup import (
            semantic_dropped,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 7), 1.0, float((i * 3) % 5)]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        out = semantic_dropped(emb, k="auto", n_iter=1)
        assert out.columns == ["vec_id", "cell", "kept_by", "n_dups"]
        out.collect()  # runs end-to-end with the derived k
