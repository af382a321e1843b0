"""Sequence packing: span arithmetic vs a pure-Python packer, stratum
independence, determinism, boundary-straddling docs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from usgs_geomag_algorithms_spark.operators.packing import pack_sequences


def docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def py_pack(rows, seq_len):
    out = {}
    by_stratum = {}
    for did, text, src in rows:
        by_stratum.setdefault(src, []).append((did, len(text.split(" "))))
    for src, docs in by_stratum.items():
        docs.sort(key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
        cum = 0
        for did, n in docs:
            out[did] = (src, n, cum, cum // seq_len, (cum + n - 1) // seq_len)
            cum += n
    return out


ROWS = [
    (i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 11)),
     "web" if i % 3 else "code")
    for i in range(30)
]


class TestPacking:
    def test_matches_python_reference(self, spark):
        got = {r.doc_id: r for r in pack_sequences(docs_df(spark, ROWS), 16).collect()}
        want = py_pack(ROWS, 16)
        assert set(got) == set(want)
        for did, (src, n, start, fb, lb) in want.items():
            r = got[did]
            assert (r.source, r.n_tokens, r.start_offset, r.first_bin,
                    r.last_bin) == (src, n, start, fb, lb), did

    def test_stream_is_gap_free_per_stratum(self, spark):
        rows = pack_sequences(docs_df(spark, ROWS), 16).collect()
        for src in {"web", "code"}:
            spans = sorted(
                (r.start_offset, r.n_tokens) for r in rows if r.source == src
            )
            pos = 0
            for start, n in spans:
                assert start == pos  # concat: no holes, no overlaps
                pos += n

    def test_boundary_straddle(self, spark):
        rows = [(0, " ".join(["a"] * 10), "s"), (1, " ".join(["b"] * 10), "s")]
        got = {r.doc_id: r for r in pack_sequences(docs_df(spark, rows), 16).collect()}
        # 20 tokens over seq_len 16: exactly one doc crosses the boundary
        straddlers = [r for r in got.values() if r.first_bin != r.last_bin]
        assert len(straddlers) == 1
        assert straddlers[0].last_bin == straddlers[0].first_bin + 1

    def test_deterministic_under_repartition(self, spark):
        df = docs_df(spark, ROWS)
        a = sorted(map(tuple, pack_sequences(df, 16).collect()))
        b = sorted(map(tuple, pack_sequences(df.repartition(7), 16).collect()))
        assert a == b

    def test_bad_seq_len(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(docs_df(spark, ROWS), 0)


class TestSequenceManifest:
    def test_slices_tile_every_sequence_exactly(self, spark):
        from pyspark.sql import functions as F

        from usgs_geomag_algorithms_spark.operators.packing import (
            pack_sequences,
            sequence_manifest,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "source", "text")
        L = 128
        packed = pack_sequences(docs, L)
        m = sequence_manifest(packed, L)
        rows = m.collect()
        # doc-side: per doc, slices cover [0, n_tokens) contiguously
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        tok = {
            r["doc_id"]: r["n_tokens"]
            for r in packed.select("doc_id", "n_tokens").collect()
        }
        for d, slices in by_doc.items():
            slices.sort(key=lambda r: r["doc_from"])
            pos = 0
            for s in slices:
                assert s["doc_from"] == pos
                pos += s["n"]
            assert pos == tok[d]
        # seq-side: per (stratum, seq), slices tile [0, L) except the
        # final partial sequence of each stratum
        by_seq: dict = {}
        for r in rows:
            by_seq.setdefault((r["source"], r["seq_id"]), []).append(r)
        last = {}
        for (src, sid), _s in by_seq.items():
            last[src] = max(last.get(src, -1), sid)
        for (src, sid), slices in by_seq.items():
            slices.sort(key=lambda r: r["seq_from"])
            pos = 0
            for s in slices:
                assert s["seq_from"] == pos
                pos += s["n"]
            if sid < last[src]:
                assert pos == L
            else:
                assert 0 < pos <= L

    def test_validates_seq_len(self, spark):
        import pytest as _pytest

        from usgs_geomag_algorithms_spark.operators.packing import (
            sequence_manifest,
        )

        with _pytest.raises(ValueError):
            sequence_manifest(None, 0)


class TestShuffleShards:
    def _rows(self, n=200):
        return [(i, f"doc {i} text") for i in range(n)]

    def _ref(self, ids, num_shards, salt):
        def h(i):
            return hashlib.md5(f"{salt}:{i}".encode()).hexdigest()

        out = {}
        by_shard = {}
        for i in ids:
            sh = int(h(i)[:8], 16) % num_shards
            by_shard.setdefault(sh, []).append(i)
        for sh, members in by_shard.items():
            members.sort(key=lambda i: (h(i), i))
            for pos, i in enumerate(members):
                out[i] = (sh, pos)
        return out

    def test_matches_reference(self, spark):
        from usgs_geomag_algorithms_spark.operators.packing import (
            shuffle_shards,
        )

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.shard, r.pos)
            for r in shuffle_shards(df, 8, salt="epoch0").collect()
        }
        assert got == self._ref([i for i, _ in rows], 8, "epoch0")

    def test_positions_dense_per_shard(self, spark):
        from usgs_geomag_algorithms_spark.operators.packing import (
            shuffle_shards,
        )

        df = spark.createDataFrame(self._rows(), "doc_id long, text string")
        out = shuffle_shards(df, 5).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert sum(len(v) for v in by_shard.values()) == 200
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))

    def test_salt_reshuffles_deterministically(self, spark):
        from usgs_geomag_algorithms_spark.operators.packing import (
            shuffle_shards,
        )

        df = spark.createDataFrame(self._rows(), "doc_id long, text string")
        a1 = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(df, 8, salt="e0").collect()}
        a2 = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(df, 8, salt="e0").collect()}
        b = {(r.doc_id, r.shard, r.pos) for r in shuffle_shards(df, 8, salt="e1").collect()}
        assert a1 == a2  # reproducible epoch
        assert a1 != b  # new salt = new order
