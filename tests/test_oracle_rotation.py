"""CI-style oracle drift gate (VERDICT r3 'what's wrong' #3): the driver
samples ~50 of the 148 queries() entries per round, so a query the driver
never draws could drift unnoticed between manual `tools/check_oracle.py`
runs.  This test runs a ROTATING deterministic subset against DuckDB at
sf0.001 on every pytest run — the rotation key advances weekly, so over a
few weeks of CI every query cycles through, while any single run stays
cheap (~25 queries at the smallest scale factor).

Uses the same comparison core as the manual tool (15-significant-digit
float normalization, exact ints/strings, NULL vs NaN distinct)."""

import hashlib
import os
import sys
from datetime import date

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_ROTATION_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.001 testdata not present"
)

SUBSET_SIZE = 25

# Pin the rotation week once at import so a run that straddles a week
# boundary (or a rerun a day later) draws the SAME subset.  Replay a past
# failure with SPARK_GRAFT_ROTATION_WEEK=<key from the failure message>.
ROTATION_WEEK = int(
    os.environ.get("SPARK_GRAFT_ROTATION_WEEK", date.today().toordinal() // 7)
)


def rotation_subset(names, size=SUBSET_SIZE, week=None):
    """Deterministic weekly rotation: rank by md5(name:week), take the
    first ``size``.  Same week -> same subset (reproducible failures);
    next week -> a different draw, so coverage cycles."""
    week = ROTATION_WEEK if week is None else week
    return sorted(
        names,
        key=lambda n: hashlib.md5(f"{n}:{week}".encode()).hexdigest(),
    )[:size]


def _entry():
    import __spark_entry__ as entrymod

    return entrymod


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        entrymod = _entry()
        names = rotation_subset(sorted(entrymod.queries()))
        metafunc.parametrize("query_name", names)


class TestOracleRotation:
    @pytest.fixture(scope="class")
    def duck(self):
        from tools.check_oracle import duck_views

        con = duck_views(SF_DIR)
        yield con
        con.close()

    def test_rotation_is_deterministic_per_week(self):
        names = sorted(_entry().queries())
        a = rotation_subset(names, week=123)
        b = rotation_subset(names, week=123)
        c = rotation_subset(names, week=124)
        assert a == b
        assert a != c  # the draw actually rotates
        assert len(a) == min(SUBSET_SIZE, len(names))

    def test_query_matches_oracle(self, spark, duck, query_name):
        entrymod = _entry()
        from tools.check_oracle import check_one

        fn = entrymod.queries()[query_name]
        sql = entrymod.oracle_sql().get(query_name)
        ok, msg = check_one(spark, duck, SF_DIR, query_name, fn, sql)
        assert ok, (
            f"{query_name}: {msg} "
            f"(replay with SPARK_GRAFT_ROTATION_WEEK={ROTATION_WEEK})"
        )
