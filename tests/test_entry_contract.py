"""Driver-contract lint: queries()/oracle_sql() stay structurally sound.

Cheap static checks that catch wiring mistakes before the driver's
correctness gate does: every oracle has a query, callables are callable,
and the flagship entry() references an existing sf dir.
"""

from __future__ import annotations

import inspect

import __spark_entry__ as entry


class TestDriverContract:
    def test_every_oracle_has_a_query(self):
        q = entry.queries()
        o = entry.oracle_sql()
        missing = set(o) - set(q)
        assert not missing, f"oracle_sql keys without queries(): {missing}"

    def test_queries_are_binary_callables(self):
        for name, fn in entry.queries().items():
            assert callable(fn), name
            params = inspect.signature(fn).parameters
            assert len(params) == 2, f"{name} must take (spark, sf_dir)"

    def test_oracle_sql_is_nonempty_select(self):
        for name, sql in entry.oracle_sql().items():
            assert "select" in sql.lower(), name

    def test_rows_only_queries_documented(self):
        # queries without an oracle are the approximate/stateful by-design
        # set; growing it silently weakens the gate — keep the list explicit
        q, o = entry.queries(), entry.oracle_sql()
        rows_only = sorted(set(q) - set(o))
        assert rows_only == [
            "hll_users_day",  # DataSketches estimate; exact twin is
            # distinct_users_day, error bound in tests/test_sketches.py
            "knn_ivf",  # coarse centroids trained from data (seeded k-means)
            "rolling_p95_day_sketch",  # t-digest trailing-window estimate;
            # exact twin is rolling_p95_day
            "rolling_users_day_sketch",  # HLL range-frame estimate; exact
            # twin is rolling_users_day
            "rollup_day_pctl_sketch",  # t-digest day percentiles; exact
            # twin is rollup_day_pctl
            "source_overlap_sketch",  # HLL set-algebra estimate; exact
            # twin is source_overlap, error bound in tests
            "sqdist_decompose",  # real-data stateful; kernel oracle-checked
            # via sqdist_golden
        ], rows_only
