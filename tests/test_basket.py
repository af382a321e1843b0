"""Market-basket pair mining vs a pure-Python reference."""

from itertools import combinations

from usgs_geomag_algorithms_spark.operators.basket import basket_pairs

BASKETS = {
    1: {"beer", "chips", "salsa"},
    2: {"beer", "chips"},
    3: {"milk", "bread"},
    4: {"beer", "milk", "chips"},
    5: {"bread"},
}


def ref_pairs(baskets, min_support):
    n = len(baskets)
    marg, pair = {}, {}
    for items in baskets.values():
        for i in items:
            marg[i] = marg.get(i, 0) + 1
        for a, b in combinations(sorted(items), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    return {
        (a, b): (c, marg[a], marg[b], n, (c * n) / (marg[a] * marg[b]))
        for (a, b), c in pair.items()
        if c >= min_support
    }


def _df(spark, baskets):
    # duplicate event rows prove the distinct() (3 rows of beer in b1)
    rows = [
        (bid, item)
        for bid, items in baskets.items()
        for item in items
    ] + [(1, "beer"), (1, "beer")]
    return spark.createDataFrame(rows, "basket long, item string")


class TestBasketPairs:
    def test_matches_reference(self, spark):
        got = {
            (r.item_a, r.item_b): (r.c_ab, r.c_a, r.c_b, r.n_baskets, r.lift)
            for r in basket_pairs(_df(spark, BASKETS)).collect()
        }
        assert got == ref_pairs(BASKETS, 1)
        # beer+chips co-occur in all 3 beer baskets -> lift > 1
        assert got[("beer", "chips")][4] > 1.0

    def test_min_support_filters(self, spark):
        got = basket_pairs(_df(spark, BASKETS), min_support=3).collect()
        assert {(r.item_a, r.item_b) for r in got} == {("beer", "chips")}

    def test_composite_basket_key(self, spark):
        rows = [
            (1, "mon", "a"), (1, "mon", "b"),
            (1, "tue", "a"), (2, "mon", "a"), (2, "mon", "b"),
        ]
        df = spark.createDataFrame(rows, "u long, d string, item string")
        got = {
            (r.item_a, r.item_b): (r.c_ab, r.n_baskets)
            for r in basket_pairs(df, basket_cols=("u", "d")).collect()
        }
        # baskets: (1,mon)={a,b}, (1,tue)={a}, (2,mon)={a,b} -> 3 baskets
        assert got == {("a", "b"): (2, 3)}
