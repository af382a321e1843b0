"""Link-graph rank propagation (operators/graphrank.py): pure-Python
fixed-point parity, teleport floor for isolated/dangling nodes, and
graph-builder contracts."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.graphrank import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    link_rank,
    md5_link_graph,
    rank_propagation,
)

BASE = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN


def _reference(nodes, edges, iters):
    """The exact integer recurrence, driver-side."""
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {
            n: BASE + (DAMP_NUM * inflow[n]) // DAMP_DEN for n in nodes
        }
    return rank


class TestRankPropagation:
    NODES = [1, 2, 3, 4, 5]
    # 5 is isolated; 4 is dangling (out-degree 0 after its only edge
    # targets 1); 1<->2<->3 cycle concentrates mass
    EDGES = [(1, 2), (2, 3), (3, 1), (2, 1), (4, 1)]

    def _spark_rank(self, spark, iters):
        nodes = spark.createDataFrame(
            [(n,) for n in self.NODES], schema="id long"
        )
        edges = spark.createDataFrame(self.EDGES, schema="src long, dst long")
        return {
            r["id"]: r
            for r in rank_propagation(nodes, edges, iters=iters).collect()
        }

    @pytest.mark.parametrize("iters", [1, 3, 6])
    def test_matches_reference(self, spark, iters):
        got = self._spark_rank(spark, iters)
        want = _reference(self.NODES, self.EDGES, iters)
        assert {k: v["rank_fp"] for k, v in got.items()} == want

    def test_isolated_node_sits_on_teleport_floor(self, spark):
        got = self._spark_rank(spark, 3)
        assert got[5]["rank_fp"] == BASE
        assert got[1]["rank_fp"] > got[5]["rank_fp"]
        # float view is the exact one division of the fixed-point value
        assert got[1]["rank"] == got[1]["rank_fp"] / SCALE


class TestMd5LinkGraph:
    def test_contracts(self, spark):
        docs = spark.range(1, 41).select(F.col("id").alias("doc_id"))
        edges = md5_link_graph(docs, out_degree=3)
        rows = edges.collect()
        ids = set(range(1, 41))
        assert rows, "graph must be non-empty"
        for r in rows:
            assert r["src"] in ids and r["dst"] in ids
            assert r["src"] != r["dst"]
        # deterministic across runs
        again = {(r["src"], r["dst"]) for r in md5_link_graph(docs, 3).collect()}
        assert again == {(r["src"], r["dst"]) for r in rows}

    def test_link_rank_end_to_end(self, spark):
        docs = spark.range(1, 41).select(F.col("id").alias("doc_id"))
        out = link_rank(docs, iters=2).collect()
        assert len(out) == 40
        assert all(r["rank_fp"] >= BASE for r in out)
