"""DSIR hashed-bigram importance weights vs a pure-Python reference."""

import hashlib

from usgs_geomag_algorithms_spark.operators.dsir import dsir_bits

B = 256


def bl(x):
    return x.bit_length() - 1


def py_dsir(rows, buckets):
    """rows: (doc_id, text, is_target)."""

    def grams(text):
        w = text.split(" ")
        return [f"{w[i-1]} {w[i]}" for i in range(1, len(w))]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    c_raw, c_tgt = {}, {}
    for _, text, tgt in rows:
        for g in grams(text):
            b = bucket(g)
            c_raw[b] = c_raw.get(b, 0) + 1
            if tgt:
                c_tgt[b] = c_tgt.get(b, 0) + 1
    t_raw = sum(c_raw.values())
    t_tgt = sum(c_tgt.values())
    norm = bl(t_raw + buckets) - bl(t_tgt + buckets)
    out = {}
    for doc_id, text, _ in rows:
        gs = grams(text)
        if not gs:
            continue
        s = sum(
            bl(c_tgt.get(bucket(g), 0) + 1) - bl(c_raw[bucket(g)] + 1)
            for g in gs
        )
        total = s + len(gs) * norm
        out[doc_id] = (len(gs), total, float(total) / len(gs))
    return out


def corpus():
    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["zork", "quux", "blarg", "frotz", "xyzzy"]
    rows = []
    for i in range(30):  # target-flagged docs: vocabulary A
        text = " ".join(a_words[(i + j) % 5] for j in range(12))
        rows.append((i, text, True))
    for i in range(30, 90):  # raw docs: vocabulary B
        text = " ".join(b_words[(i + j) % 5] for j in range(12))
        rows.append((i, text, False))
    # held-out probes, unflagged: one A-like, one B-like
    rows.append((100, " ".join(a_words[j % 5] for j in range(12)), False))
    rows.append((101, " ".join(b_words[j % 5] for j in range(12)), False))
    rows.append((102, "single", False))  # no bigram -> emits nothing
    return rows


class TestDsir:
    def test_matches_reference(self, spark):
        rows = corpus()
        df = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        got = {
            r.doc_id: (r.n_grams, r.dsir_bits, r.avg_bits)
            for r in dsir_bits(df, buckets=B).collect()
        }
        assert got == py_dsir(rows, B)

    def test_target_like_scores_higher(self, spark):
        rows = corpus()
        df = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        got = {r.doc_id: r.dsir_bits for r in dsir_bits(df, buckets=B).collect()}
        assert got[100] > got[101]  # A-vocab probe beats B-vocab probe
        assert 102 not in got  # no-bigram doc emits nothing

    def test_plan_broadcast_no_python(self, spark):
        from tests.test_plan_audit import PY_NODES, phys

        df = spark.createDataFrame(
            corpus(), "doc_id long, text string, is_target boolean"
        )
        out = dsir_bits(df, buckets=B)
        out.collect()
        plan = phys(out).split("== Initial Plan ==")[0]
        assert not any(n in plan for n in PY_NODES)
        assert "BroadcastHashJoin" in plan  # bucket table pinned broadcast
        assert "SortMergeJoin" not in plan
