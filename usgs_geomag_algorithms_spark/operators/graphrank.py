"""Link-graph rank propagation (PageRank-shaped quality signal).

Web-corpus curation ranks documents by link-graph centrality before
sampling (Common Crawl publishes harmonic-centrality / PageRank ranks;
CCNet-style builds use them as a quality prior).  The computation is
iterative sparse mat-vec: each round, every node's rank flows to its
out-links and is re-mixed with a damping teleport term.

Spark shape (the same discipline as ``dedup.connected_components``):

* one round = ONE edges×ranks join + ONE groupBy(dst) — both shuffles
  keyed on node id, so a 100 TB graph re-uses a stable hash
  partitioning across rounds;
* every round's rank relation is eagerly ``localCheckpoint``-ed —
  without it the Catalyst plan doubles per iteration;
* no rank ever reaches the driver.

Arithmetic is INTEGER FIXED-POINT (ranks in ``SCALE`` units, flooring
``div`` for the out-degree split and the damping multiply), which makes
a fixed iteration count bit-reproducible under any partitioning or
summation order — and therefore exactly checkable by the DuckDB oracle
(float PageRank is order-dependent across partitions).  Dangling-node
mass leaks (the standard simplification); ranks stay well-defined, just
not normalized to exactly n·SCALE.

The synthetic graph (:func:`md5_link_graph`) derives a deterministic
~k-regular edge list from md5 of the doc ids — the documents table has
no link column, so the GRAPH is synthetic but the OPERATOR is the real
iterative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point rank scale (1.0 == SCALE units)
SCALE = 1_000_000
#: damping factor 0.85 as an integer ratio
DAMP_NUM, DAMP_DEN = 85, 100
OUT_DEGREE = 3
N_ITERS = 5


def md5_link_graph(
    docs: DataFrame, out_degree: int = OUT_DEGREE, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic (src, dst) edge list: each doc points at
    ``out_degree`` md5-derived targets folded into the corpus id range
    (targets joined back against real ids; self-loops and duplicate
    targets dropped)."""
    ids = docs.select(F.col(id_col).alias("id"))
    bounds = ids.agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
    j = F.explode(
        F.array(*[F.lit(x) for x in range(1, out_degree + 1)])
    ).alias("j")
    raw = ids.crossJoin(F.broadcast(bounds)).select("id", "lo", "hi", j)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    dst = F.col("lo") + h % (F.col("hi") - F.col("lo") + 1)
    edges = raw.select(F.col("id").alias("src"), dst.alias("dst")).where(
        F.col("dst") != F.col("src")
    )
    return (
        edges.join(ids.select(F.col("id").alias("dst")), "dst")
        .select("src", "dst")
        .distinct()
    )


def rank_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = N_ITERS,
    scale: int = SCALE,
    damp: tuple = (DAMP_NUM, DAMP_DEN),
) -> DataFrame:
    """Fixed-point damped rank over ``iters`` rounds.

    ``nodes`` is (id) — every corpus doc, including isolated ones (they
    hold the teleport floor).  Returns (id, rank_fp BIGINT, rank DOUBLE
    = rank_fp / scale, one exact int→double division).
    """
    num, den = damp
    base = scale * (den - num) // den
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    esrc = edges.join(deg, "src")
    rank = nodes.select("id", F.lit(scale).cast("long").alias("rank_fp"))
    for _ in range(iters):
        inflow = (
            esrc.join(
                rank.select(
                    F.col("id").alias("src"), F.col("rank_fp").alias("prank")
                ),
                "src",
            )
            .select("dst", F.expr("prank div odeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        rank = (
            nodes.join(inflow.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({num} * coalesce(inflow, 0L)) div {den}")
                )
                .cast("long")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select(
        "id", "rank_fp", (F.col("rank_fp") / F.lit(float(scale))).alias("rank")
    )


def link_rank(
    docs: DataFrame,
    iters: int = N_ITERS,
    out_degree: int = OUT_DEGREE,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end: md5 link graph over the corpus ids → damped rank."""
    nodes = docs.select(F.col(id_col).alias("id"))
    edges = md5_link_graph(docs, out_degree, id_col)
    return rank_propagation(nodes, edges, iters).select(
        F.col("id").alias(id_col), "rank_fp", "rank"
    )
