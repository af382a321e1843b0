"""Market-basket co-occurrence mining: item-pair support and lift.

The events-side sibling of :func:`operators.textops.collocations` — where
collocations associates ADJACENT words, this associates items that share a
basket (a session, a user-day, an order): ``lift = P(ab) / (P(a)·P(b))``
over basket membership.  The classic affinity/recommendation primitive.

Single-scan discipline: the distinct (basket, item) relation is computed
once and lazily checkpointed; pair counts, item marginals, and the basket
total are all re-aggregations of it.  Lift is one fixed DOUBLE tree
``(c_ab·N) / (c_a·c_b)`` over BIGINT counts — bit-identical cross-engine
(no log).

Scale shape: the pair self-join shuffles on basket id; its output is
Σ k·(k−1)/2 rows per basket, k = DISTINCT items per basket — bounded by
the item catalog, not by event volume (a power user with 10⁶ events over
40 item types still contributes ≤ 780 pairs).  If the catalog itself is
huge (e.g. items = SKUs), pre-cap with a per-basket top-m filter before
the join; everything downstream is catalog²-bounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def basket_pairs(
    df: DataFrame,
    basket_cols: Sequence[str] = ("basket",),
    item_col: str = "item",
    min_support: int = 1,
) -> DataFrame:
    """Per unordered item pair (item_a < item_b): ``c_ab`` (baskets with
    both), marginals ``c_a``/``c_b`` (baskets with each), ``n_baskets``
    (baskets with ≥1 item), and ``lift``.  Pairs below ``min_support``
    co-occurrences are dropped before the marginal joins.
    """
    basket_cols = list(basket_cols)
    si = (
        df.select(*basket_cols, F.col(item_col).alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = si.select(*basket_cols, F.col("item").alias("item_a"))
    b = si.select(*basket_cols, F.col("item").alias("item_b"))
    pairs = (
        a.join(b, on=basket_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_support)
    )
    marg = si.groupBy("item").agg(F.count("*").cast("long").alias("c"))
    total = si.select(*basket_cols).distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    lift = (F.col("c_ab").cast("double") * F.col("n_baskets").cast("double")) / (
        F.col("c_a").cast("double") * F.col("c_b").cast("double")
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("item").alias("item_a"),
                                    F.col("c").alias("c_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"),
                                    F.col("c").alias("c_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a", "item_b", "c_ab", "c_a", "c_b", "n_baskets",
            lift.alias("lift"),
        )
    )
