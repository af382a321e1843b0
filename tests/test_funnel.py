"""Funnel sequence match (operators/funnel.py): earliest-chain
semantics vs a pure-Python reference, strict ordering on ties, the
conversion window, and the depth report."""

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.funnel import (
    funnel,
    funnel_counts,
)

STEPS = ("view", "click", "purchase")

# (user, t_sec, type) — crafted cases:
#   u1 completes in order; u2 clicks BEFORE viewing (click must not
#   count), then clicks again after; u3 views only; u4 purchases first
#   (depth 0 — no view); u5 same-ts view+click (strict > rejects the
#   tie); u6 nothing relevant
ROWS = [
    (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
    (2, 5, "click"), (2, 10, "view"), (2, 40, "click"),
    (3, 7, "view"),
    (4, 3, "purchase"),
    (5, 11, "view"), (5, 11, "click"), (5, 12, "click"),
    (6, 1, "error"),
]


def _reference(rows, steps, window=None):
    out = {}
    users = {u for u, _, _ in rows}
    for u in sorted(users):
        ev = sorted((t, ty) for uu, t, ty in rows if uu == u)
        ts, prev = [], None
        for step in steps:
            cand = [
                t
                for t, ty in ev
                if ty == step
                and (prev is None or t > prev)
                and (window is None or not ts or t <= ts[0] + window)
            ]
            if not cand:
                break
            prev = min(cand)
            ts.append(prev)
        out[u] = ts
    return out


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [(u, t * 1_000_000, ty) for u, t, ty in ROWS],
        schema="user_id long, t_raw long, event_type string",
    ).select(
        "user_id",
        F.timestamp_micros(F.col("t_raw")).alias("ts"),
        "event_type",
    )


class TestFunnel:
    def test_matches_reference(self, spark, events):
        got = {r["user_id"]: r for r in funnel(events).collect()}
        want = _reference(ROWS, STEPS)
        assert set(got) == set(want)
        for u, ts in want.items():
            r = got[u]
            assert r["depth"] == len(ts)
            chain = [r["t1_us"], r["t2_us"], r["t3_us"]]
            assert chain[: len(ts)] == [t * 1_000_000 for t in ts]
            assert all(v is None for v in chain[len(ts):])

    def test_tie_is_rejected_and_out_of_order_ignored(self, spark, events):
        got = {r["user_id"]: r["depth"] for r in funnel(events).collect()}
        assert got[5] == 2  # 11s click tied with view -> the 12s click
        assert got[2] == 2  # the 5s click (before view) must not count
        assert got[4] == 0  # purchase without view

    def test_window_caps_conversion(self, spark, events):
        win = 15 * 1_000_000  # u1's purchase at +20s falls out
        got = {r["user_id"]: r["depth"] for r in funnel(events, window_us=win).collect()}
        want = _reference(ROWS, STEPS, window=15)
        assert got == {u: len(ts) for u, ts in want.items()}

    def test_counts_report(self, spark, events):
        rep = {r["depth"]: r["n_users"] for r in funnel_counts(funnel(events)).collect()}
        assert sum(rep.values()) == 6
        assert rep[3] == 1 and rep[0] == 2

    def test_needs_two_steps(self, spark, events):
        with pytest.raises(ValueError):
            funnel(events, steps=("view",))
