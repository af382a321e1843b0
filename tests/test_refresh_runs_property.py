"""Property tests for the refresh checkpoint's run-length-encoded
interval algebra (_insert_run / _subtract_runs): checked against a naive
slot-set model over randomized slot universes."""

from hypothesis import given, settings, strategies as st

from usgs_geomag_algorithms_spark.plans.refresh import _insert_run, _subtract_runs

OUT = 10  # slot spacing for the model


def runs_to_slots(runs):
    out = set()
    for s, e in runs:
        out.update(range(s, e + 1, OUT))
    return out


slot = st.integers(min_value=0, max_value=40).map(lambda k: k * OUT)


@st.composite
def run_list(draw):
    n = draw(st.integers(0, 5))
    runs = []
    for _ in range(n):
        s = draw(slot)
        e = s + draw(st.integers(0, 6)) * OUT
        runs.append((s, e))
    # normalize to the invariant _insert_run maintains: sorted + disjoint
    norm: list[list[int]] = []
    for s, e in sorted(runs):
        if norm and s <= norm[-1][1] + OUT:
            norm[-1][1] = max(norm[-1][1], e)
        else:
            norm.append([s, e])
    return [tuple(r) for r in norm]


@settings(max_examples=300, deadline=None)
@given(run_list(), slot, st.integers(0, 6))
def test_insert_run_matches_set_model(runs, s, n):
    new = (s, s + n * OUT)
    got = _insert_run([list(r) for r in runs], new, OUT)
    want_slots = runs_to_slots(runs) | runs_to_slots([new])
    assert runs_to_slots(got) == want_slots
    # output is sorted, disjoint, and maximally merged
    for (a1, b1), (a2, b2) in zip(got, got[1:]):
        assert b1 + OUT < a2
    assert all(a <= b for a, b in got)


@settings(max_examples=300, deadline=None)
@given(run_list(), slot, st.integers(0, 8))
def test_subtract_runs_matches_set_model(runs, s, n):
    gap = (s, s + n * OUT)
    got = _subtract_runs(gap, [list(r) for r in runs], OUT)
    want = runs_to_slots([gap]) - runs_to_slots(runs)
    assert runs_to_slots(got) == want
    # pieces are sorted, disjoint sub-intervals of the gap
    for a, b in got:
        assert gap[0] <= a <= b <= gap[1]
    for (a1, b1), (a2, b2) in zip(got, got[1:]):
        assert b1 < a2


@settings(max_examples=200, deadline=None)
@given(run_list(), slot, st.integers(0, 6))
def test_subtract_after_insert_is_empty(runs, s, n):
    """Anything just marked complete is never re-computed."""
    new = (s, s + n * OUT)
    done = _insert_run([list(r) for r in runs], new, OUT)
    assert _subtract_runs(new, done, OUT) == []
