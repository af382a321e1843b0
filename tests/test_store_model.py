"""Model-based randomized testing of the TierStore mutation matrix.

Every store capability is unit-tested in isolation (snapshots, MOR
deletes, spec evolution, rollback, retention, WAP); what those tests
cannot cover is the INTERACTION space — a delete landing between an
evolve and its compact, a rollback across a retention drop, an upsert
re-inserting a row a merge-on-read delete masked two commits ago. This
suite drives a seeded random program of mutations against a tiny
in-memory model (a plain ``{(url, channel, t_us): value}`` dict plus a
per-version snapshot history) and asserts after EVERY op that:

- the full read equals the model,
- random range / series-pruned reads equal the filtered model,
- ``as_of_version`` time travel equals the model's history snapshot,
- ``changelog(v_a, v_b)`` equals the model's snapshot diff,
- maintenance (compact / materialize_deletes / evolve_buckets) is
  invisible to readers.

The model is the store's semantics spec in ~40 lines:

- ``write``   = dynamic partition overwrite: drop every model key in the
  touched ``(p_date, bucket(url))`` partitions under the CURRENT spec,
  then insert the batch (refused with :class:`SpecEvolutionError` while
  an older spec still has live files on a written date).
- ``upsert``  = last-wins merge, gaps never clobber: a new valid value
  always wins; a new NaN loses to an existing valid value and lands
  otherwise.
- ``delete_rows`` / ``delete_series`` = key removal.
- ``expire_before`` = whole-day partition drop.
- ``rollback`` = restore the target version's snapshot.
- ``compact`` / ``materialize_deletes`` / ``evolve_buckets`` = identity.
"""

import math
import random

import pytest

from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.sources.store import (
    SpecEvolutionError,
    TierStore,
)
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1578268800 * US  # 2020-01-06 (UTC midnight)
DAY = 86400 * US
HOUR = 3600 * US
URLS = ["u0", "u1", "u2", "u3"]
CHANNELS = ["text_len", "lang_en"]
N_DAYS = 3
SLOTS = [T0 + d * DAY + h * HOUR for d in range(N_DAYS) for h in range(6)]

NAN = float("nan")


def _date_of(t_us: int) -> str:
    day = (t_us - T0) // DAY
    return f"2020-01-{6 + day:02d}"


def _valid(v) -> bool:
    return v is not None and not math.isnan(v)


def _norm(v):
    if v is None:
        return "null"
    if math.isnan(v):
        return "nan"
    return round(v, 6)


def _snap(model: dict) -> dict:
    return {k: _norm(v) for k, v in model.items()}


class Driver:
    """Runs one op against BOTH the store and the model."""

    def __init__(self, spark, store: TierStore, rnd: random.Random):
        self.spark = spark
        self.store = store
        self.rnd = rnd
        self.model: dict = {}
        self.history: dict[int, dict] = {0: {}}
        # url -> bucket under each spec modulus, filled lazily
        self._buckets: dict[tuple[str, int], int] = {}
        self.spec_list = [store.n_buckets]
        self.log: list[str] = []

    # ------------------------------------------------------------ utils
    def bucket(self, url: str, n: int) -> int:
        key = (url, n)
        if key not in self._buckets:
            (b,) = self.store._buckets_of([url], n)
            self._buckets[key] = b
        return self._buckets[key]

    def df(self, rows):
        return self.spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        )

    def batch(self, n: int):
        """n random rows with UNIQUE (url, channel, t_us) keys."""
        keys = self.rnd.sample(
            [(u, c, t) for u in URLS for c in CHANNELS for t in SLOTS],
            n,
        )
        return [
            (
                u,
                c,
                t,
                NAN
                if self.rnd.random() < 0.15
                else round(self.rnd.uniform(0, 100), 1),
            )
            for (u, c, t) in keys
        ]

    def _record_version(self):
        v = self.store.current_version("minute")
        snap = _snap(self.model)
        if v in self.history:
            assert self.history[v] == snap, (
                f"op changed content without a commit (v{v}): {self.log[-1]}"
            )
        self.history[v] = snap

    # -------------------------------------------------------------- ops
    def op_write(self):
        rows = self.batch(self.rnd.randint(1, 10))
        cur_n = self.spec_list[-1]
        try:
            self.store.write(self.df(rows), "minute")
        except SpecEvolutionError:
            # mid-migration overwrite refused: model unchanged; legal only
            # while an older spec still has live files
            self.log.append("write REFUSED (spec migration)")
            assert len(self.spec_list) > 1
            return
        touched = {
            (_date_of(t), self.bucket(u, cur_n)) for (u, c, t, v) in rows
        }
        for k in [
            k
            for k in self.model
            if (_date_of(k[2]), self.bucket(k[0], cur_n)) in touched
        ]:
            del self.model[k]
        for u, c, t, v in rows:
            self.model[(u, c, t)] = v
        self.log.append(f"write {len(rows)} rows")

    def op_upsert(self):
        rows = self.batch(self.rnd.randint(1, 10))
        self.store.upsert(self.df(rows), "minute")
        for u, c, t, v in rows:
            k = (u, c, t)
            if not _valid(v) and k in self.model and _valid(self.model[k]):
                continue  # gaps never clobber values
            self.model[k] = v
        self.log.append(f"upsert {len(rows)} rows")

    def op_delete_rows(self):
        pool = list(self.model) or [("u0", "text_len", T0)]
        keys = {
            self.rnd.choice(pool)
            for _ in range(self.rnd.randint(1, 4))
        }
        if self.rnd.random() < 0.3:  # some keys that match nothing
            keys.add(("u9", "text_len", T0))
        kdf = self.spark.createDataFrame(
            sorted(keys), "url string, channel string, t_us long"
        )
        self.store.delete_rows(kdf, "minute")
        for k in keys:
            self.model.pop(k, None)
        self.log.append(f"delete_rows {len(keys)} keys")

    def op_delete_series(self):
        url = self.rnd.choice(URLS)
        self.store.delete_series("minute", [url])
        for k in [k for k in self.model if k[0] == url]:
            del self.model[k]
        self.log.append(f"delete_series {url}")

    def op_expire(self):
        day = self.rnd.randint(1, N_DAYS - 1)
        cutoff = T0 + day * DAY
        self.store.expire_before("minute", cutoff)
        for k in [k for k in self.model if k[2] < cutoff]:
            del self.model[k]
        self.log.append(f"expire_before day{day}")

    def op_compact(self):
        self.store.compact(
            "minute",
            target_files_per_partition=self.rnd.choice([1, 2]),
        )
        self.log.append("compact")

    def op_materialize(self):
        self.store.materialize_deletes("minute")
        self.log.append("materialize_deletes")

    def op_evolve(self):
        n = self.rnd.choice([3, 4, 5])
        if n == self.spec_list[-1]:
            n += 1
        self.store.evolve_buckets("minute", n)
        self.spec_list.append(n)
        self.log.append(f"evolve_buckets {n}")

    def op_rollback(self):
        resolvable = [
            v for v in self.store.versions("minute") if v in self.history
        ]
        if not resolvable:
            return
        v = self.rnd.choice(resolvable)
        self.store.rollback("minute", v)
        self.model = {
            k: (NAN if s == "nan" else s)
            for k, s in self.history[v].items()
        }
        self.log.append(f"rollback v{v}")

    # ------------------------------------------------------------ checks
    def check_full_read(self):
        got = {
            (r.url, r.channel, r.t_us): _norm(r.value)
            for r in self.store.read("minute").collect()
        }
        assert got == _snap(self.model), f"after {self.log[-3:]}"

    def check_pruned_reads(self):
        lo, hi = sorted(self.rnd.sample(SLOTS, 2))
        got = {
            (r.url, r.channel, r.t_us): _norm(r.value)
            for r in self.store.read("minute", start_us=lo, end_us=hi).collect()
        }
        want = {
            k: _norm(v) for k, v in self.model.items() if lo <= k[2] <= hi
        }
        assert got == want, f"range read after {self.log[-3:]}"
        url = self.rnd.choice(URLS)
        got = {
            (r.url, r.channel, r.t_us): _norm(r.value)
            for r in self.store.read("minute", series=url).collect()
        }
        want = {k: _norm(v) for k, v in self.model.items() if k[0] == url}
        assert got == want, f"series read after {self.log[-3:]}"

    def check_time_travel(self):
        for v in self.store.versions("minute"):
            if v not in self.history:
                continue
            got = {
                (r.url, r.channel, r.t_us): _norm(r.value)
                for r in self.store.read(
                    "minute", as_of_version=v
                ).collect()
            }
            assert got == self.history[v], (
                f"as_of v{v} after {self.log[-3:]}"
            )

    def check_changelog(self):
        vs = [
            v for v in self.store.versions("minute") if v in self.history
        ]
        if len(vs) < 2:
            return
        va, vb = sorted(self.rnd.sample(vs, 2))
        ch = self.store.changelog("minute", va, vb).collect()
        got = {
            (r.url, r.channel, r.t_us): (r.op, _norm(r.value)) for r in ch
        }
        a, b = self.history[va], self.history[vb]
        want = {}
        for k, v in b.items():
            if a.get(k) != v:
                want[k] = ("upsert", v)
        for k, v in a.items():
            if k not in b:
                want[k] = ("delete", v)
        assert got == want, f"changelog v{va}->v{vb} after {self.log[-3:]}"


OPS = [
    ("op_upsert", 28),
    ("op_write", 14),
    ("op_delete_rows", 12),
    ("op_delete_series", 7),
    ("op_compact", 8),
    ("op_materialize", 5),
    ("op_evolve", 5),
    ("op_expire", 5),
    ("op_rollback", 8),
]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_store_model_random_program(spark, tmp_path, seed):
    rnd = random.Random(seed)
    store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
    d = Driver(spark, store, rnd)
    # the program starts with a write so every later op has a tier
    d.op_write()
    d._record_version()
    d.check_full_read()
    names = [n for n, w in OPS for _ in range(w)]
    for step in range(24):
        getattr(d, rnd.choice(names))()
        d._record_version()
        d.check_full_read()
        if step % 3 == 1:
            d.check_pruned_reads()
        if step % 4 == 2:
            d.check_time_travel()
        if step % 5 == 3:
            d.check_changelog()
    assert len(d.log) >= 20
