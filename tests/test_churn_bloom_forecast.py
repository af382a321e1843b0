"""Session-14 op pack: crawl-revision churn, Bloom prefilter, seasonal
naive forecast error."""

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.bloom import (
    bloom_probe,
    build_bloom,
)
from usgs_geomag_algorithms_spark.operators.churn import (
    changed_flag,
    churn_rate,
    revision_dedup,
    staleness,
)
from usgs_geomag_algorithms_spark.operators.forecast import (
    seasonal_naive_error,
)

DAY = 86_400_000_000
HOUR = 3_600_000_000


def _fetches(spark):
    # url A: a,a,b,b,a  -> revisions at t=0 (first), t=2 (a->b), t=4 (b->a)
    # url B: x          -> single fetch
    # url C: c,c,c      -> first only; 2 trailing unchanged
    rows = [
        ("A", 0, 1, "a"),
        ("A", 1, 2, "a"),
        ("A", 2, 3, "b"),
        ("A", 3, 4, "b"),
        ("A", 4, 5, "a"),
        ("B", 0, 6, "x"),
        ("C", 0, 7, "c"),
        ("C", 1, 8, "c"),
        ("C", 2, 9, "c"),
    ]
    return spark.createDataFrame(
        rows, "url string, t_us long, fid long, digest string"
    )


class TestChurn:
    def test_changed_flag(self, spark):
        out = {
            (r.url, r.t_us): (r.is_first, r.is_changed)
            for r in changed_flag(
                _fetches(spark), ("url",), "t_us", "digest", ("fid",)
            ).collect()
        }
        assert out[("A", 0)] == (True, True)
        assert out[("A", 1)] == (False, False)
        assert out[("A", 2)] == (False, True)
        assert out[("A", 4)] == (False, True)
        assert out[("B", 0)] == (True, True)
        assert out[("C", 2)] == (False, False)

    def test_null_digests(self, spark):
        # NULL digest = failed fetch: a NULL after a NULL is UNchanged;
        # NULL after content (and content after NULL) is changed; the
        # first fetch is first even when its digest is NULL
        rows = [
            ("N", 0, 1, None),
            ("N", 1, 2, None),
            ("N", 2, 3, "a"),
            ("N", 3, 4, None),
        ]
        df = spark.createDataFrame(
            rows, "url string, t_us long, fid long, digest string"
        )
        out = {
            r.t_us: (r.is_first, r.is_changed)
            for r in changed_flag(
                df, ("url",), "t_us", "digest", ("fid",)
            ).collect()
        }
        assert out[0] == (True, True)
        assert out[1] == (False, False)
        assert out[2] == (False, True)
        assert out[3] == (False, True)

    def test_revision_dedup(self, spark):
        kept = revision_dedup(
            _fetches(spark), ("url",), "t_us", "digest", ("fid",)
        ).collect()
        byurl = {}
        for r in kept:
            byurl.setdefault(r.url, []).append((r.t_us, r.revision_no))
        assert sorted(byurl["A"]) == [(0, 1), (2, 2), (4, 3)]
        assert byurl["B"] == [(0, 1)]
        assert byurl["C"] == [(0, 1)]

    def test_churn_rate(self, spark):
        out = {
            (r.url, r.t_us): r
            for r in churn_rate(
                _fetches(spark),
                DAY,
                group_cols=["url"],
                key_cols=("url",),
                tiebreak_cols=("fid",),
            ).collect()
        }
        a = out[("A", 0)]
        assert (a.n_fetches, a.n_revisits, a.n_changed) == (5, 4, 2)
        assert a.change_ratio == 0.5
        b = out[("B", 0)]
        assert (b.n_fetches, b.n_revisits, b.n_changed) == (1, 0, 0)
        assert b.change_ratio is None  # no revisits -> undefined

    def test_staleness(self, spark):
        out = {
            r.url: r
            for r in staleness(
                _fetches(spark), ("url",), "t_us", "digest", ("fid",)
            ).collect()
        }
        # A last changed at t=4 (the final fetch) -> streak 0
        assert out["A"].last_change_t_us == 4
        assert out["A"].fetches_since_change == 0
        assert out["A"].n_changes == 3
        # C never changed after the first fetch -> 2 trailing unchanged
        assert out["C"].last_change_t_us == 0
        assert out["C"].fetches_since_change == 2
        assert out["C"].n_changes == 1


class TestBloom:
    def test_no_false_negatives(self, spark):
        keys = spark.createDataFrame(
            [(f"key{i}",) for i in range(200)], "key string"
        )
        words = build_bloom(keys, "key", m_bits=4096, k=4)
        hits = bloom_probe(
            keys.select(F.col("key").alias("k")),
            words,
            "k",
            ("k",),
            m_bits=4096,
            k=4,
        )
        assert hits.where(~F.col("bloom_hit")).count() == 0

    def test_false_positive_rate_bounded(self, spark):
        train = spark.createDataFrame(
            [(f"train{i}",) for i in range(200)], "key string"
        )
        probe = spark.createDataFrame(
            [(f"probe{i}",) for i in range(500)], "key string"
        )
        words = build_bloom(train, "key", m_bits=4096, k=4)
        out = bloom_probe(probe, words, "key", ("key",), 4096, 4)
        fp = out.where(F.col("bloom_hit")).count()
        # 200 keys x 4 bits in 4096 -> fill ~0.18, fp ~ 0.18^4 ~ 0.1%
        assert fp / 500 < 0.05

    def test_word_table_bounded_and_broadcast(self, spark):
        train = spark.createDataFrame(
            [(f"t{i}",) for i in range(1000)], "key string"
        )
        words = build_bloom(train, "key", m_bits=128, k=4)
        assert words.count() <= 128 // 32
        probe = spark.createDataFrame([("t1",), ("zz",)], "key string")
        out = bloom_probe(probe, words, "key", ("key",), 128, 4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan.split("== Initial Plan ==")[0]
        out.collect()

    def test_validation(self, spark):
        keys = spark.createDataFrame([("a",)], "key string")
        import pytest

        with pytest.raises(ValueError):
            build_bloom(keys, "key", m_bits=100, k=4)
        with pytest.raises(ValueError):
            build_bloom(keys, "key", m_bits=128, k=0)


class TestSeasonalNaive:
    def test_hand_computed(self, spark):
        # series s: hour counts over 2 days; day-2 value = day-1 value + d
        rows = []
        day1 = [5, 7, 9, 4]
        deltas = [1, -2, 0, 3]
        for h, v in enumerate(day1):
            rows.append(("s", h * HOUR, v))
        for h, (v, d) in enumerate(zip(day1, deltas)):
            rows.append(("s", DAY + h * HOUR, v + d))
        sig = spark.createDataFrame(rows, "series string, t_us long, v long")
        out = seasonal_naive_error(sig, DAY, DAY, ("series",)).collect()
        assert len(out) == 1  # only day 2 has pairs
        r = out[0]
        assert r.t_us == DAY
        assert r.n_paired == 4
        assert r.sum_abs_err == sum(abs(d) for d in deltas)
        assert r.sum_err == sum(deltas)
        assert r.mae == sum(abs(d) for d in deltas) / 4

    def test_gap_awareness(self, spark):
        rows = [("s", 0, 10), ("s", DAY, 12), ("s", DAY + HOUR, 9)]
        # DAY+HOUR has no partner at HOUR on day 1 -> no pair
        sig = spark.createDataFrame(rows, "series string, t_us long, v long")
        out = seasonal_naive_error(sig, DAY, DAY, ("series",)).collect()
        assert len(out) == 1 and out[0].n_paired == 1
        assert out[0].sum_err == 2

    def test_suffix_join_shape(self, spark):
        rows = [("s", h * HOUR, h % 3) for h in range(48)]
        sig = spark.createDataFrame(rows, "series string, t_us long, v long")
        a = seasonal_naive_error(sig, DAY, DAY, ("series",))
        b = seasonal_naive_error(sig, HOUR, DAY, ("series",), suffix="_n1")
        j = a.join(b, ["series", "t_us"])
        assert {"mae", "mae_n1"} <= set(j.columns)
        # seasonal pairs exist only for day 2; the inner join keeps it
        assert j.count() == 1


class TestEwma:
    def test_matches_numpy_with_gap_renormalization(self, spark):
        from usgs_geomag_algorithms_spark.operators.forecast import (
            ewma_smooth,
        )

        SLOT = 60_000_000
        # slots 0..9 with a hole at 4 and 7
        present = [0, 1, 2, 3, 5, 6, 8, 9]
        vals = {t: 10 + 3 * t for t in present}
        df = spark.createDataFrame(
            [("a", t * SLOT, v) for t, v in vals.items()],
            "series string, t_us long, v long",
        )
        out = {
            r.t_us // SLOT: (r.num, r.den, r.n_present, r.ewma)
            for r in ewma_smooth(df, SLOT, window=4).collect()
        }
        # independent reconstruction: anchor k collects lags j=0..3
        for k in range(0, 13):
            num = den = n = 0
            for j in range(4):
                t = k - j
                if t in vals:
                    w = 1 << (3 - j)
                    num += vals[t] * w
                    den += w
                    n += 1
            if n == 0:
                assert k not in out
            else:
                assert out[k] == (num, den, n, num / den)
        # a fully-populated window is the classic dyadic EWMA
        assert out[3] == (
            19 * 8 + 16 * 4 + 13 * 2 + 10,
            15,
            4,
            (19 * 8 + 16 * 4 + 13 * 2 + 10) / 15,
        )
        # anchors 10..12 are decaying forecasts off the last samples
        assert out[12][2] == 1 and out[12][3] == vals[9]
