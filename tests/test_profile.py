"""Table profiling (operators/profile.py): exact stats per dtype,
null handling, column subsetting, one-scan plan."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "alpha", 2.5, "2020-01-06 00:00:00"),
        (2, "be", None, "2020-01-06 01:00:00"),
        (3, None, -1.0, None),
        (4, "alpha", 4.0, "2020-01-06 01:00:00"),
    ]
    return spark.createDataFrame(
        rows, schema="id long, s string, x double, t_s string"
    ).select("id", "s", "x", F.col("t_s").cast("timestamp").alias("t"))


class TestProfile:
    def test_exact_stats(self, spark, table):
        got = {r["column"]: r for r in profile_table(table).collect()}
        assert set(got) == {"id", "s", "x", "t"}
        for r in got.values():
            assert r["n_rows"] == 4
        i = got["id"]
        assert (i["n_null"], i["n_distinct"]) == (0, 4)
        assert (i["min_num"], i["max_num"]) == (1.0, 4.0)
        assert i["min_len"] is None and i["sum_len"] is None
        s = got["s"]
        assert (s["n_null"], s["n_distinct"]) == (1, 2)
        assert (s["min_len"], s["max_len"], s["sum_len"]) == (2, 5, 12)
        assert s["min_num"] is None
        x = got["x"]
        assert (x["n_null"], x["min_num"], x["max_num"]) == (1, -1.0, 4.0)
        t = got["t"]
        assert t["n_null"] == 1 and t["n_distinct"] == 2
        assert t["max_num"] - t["min_num"] == 3_600_000_000.0

    def test_column_subset(self, spark, table):
        out = profile_table(table, columns=["s"]).collect()
        assert [r["column"] for r in out] == ["s"]

    def test_single_scan(self, spark, table):
        df = profile_table(table)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # one source scan feeds the whole profile (Expand handles the
        # multi-distinct), and nothing leaves the JVM
        assert final.count("Scan ExistingRDD[id") == 1
        assert "BatchEvalPython" not in final and "InPandas" not in final
