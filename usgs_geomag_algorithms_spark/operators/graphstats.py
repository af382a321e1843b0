"""Link-graph structure statistics: triangles and degree distribution.

The static-analysis siblings of the rank propagation in
``operators/graphrank.py``: triangle participation measures local
clustering (link farms and navigation boilerplate show up as dense
triangle neighborhoods in a web graph; spam-detection features), the
degree histogram is the first sanity check of any crawl's link
extraction.

Triangle counting is the canonical "join your way to structure"
computation: canonicalize to undirected edges ``(u < v)``, then one
self-join builds wedges ``a–b–c (a<b<c)`` and one semi-join closes them
against the edge list.  Everything is an equi-join on node ids —
hash-partitioned, no driver state.  At web scale the classic refinement
is degree orientation (point each edge at the higher-degree endpoint)
which bounds wedge fan-out by arboricity; here ids are the orientation
(the id-ordered join is already the textbook node-iterator algorithm),
and the hot-node wedge explosion is AQE skew-join's backstop (a
production web graph would additionally re-orient by degree before the
wedge join — noted, not needed at the synthetic graph's bounded
out-degree).

Determinism: pure integer joins/counts — exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list ``(u < v)`` from a directed one:
    self-loops dropped, direction folded, duplicates collapsed."""
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        edges.select(u, v).where(F.col("u") != F.col("v")).distinct()
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle count over the canonicalized graph: each
    triangle ``a<b<c`` credits all three corners.

    Wedge build + closure are two hash joins on node ids; output is
    node-bounded.  Isolated or triangle-free nodes are absent (join the
    node table with ``coalesce(0)`` for a dense vector)."""
    e = undirected_edges(edges)
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # a<b<c by construction
    corners = tri.select(F.col("a").alias("id")).unionAll(
        tri.select(F.col("b").alias("id"))
    ).unionAll(tri.select(F.col("c").alias("id")))
    return corners.groupBy("id").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Undirected degree histogram: ``(degree, n_nodes)`` — the crawl
    link-extraction sanity plot. Two bounded aggregations."""
    e = undirected_edges(edges)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
