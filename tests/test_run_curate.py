"""run_curate CLI: gates -> near-dup canonicals -> sampling -> manifest."""

import json


def docs(spark, rows):
    """rows: (doc_id, text, source)"""
    return spark.createDataFrame(
        [(i, t, s, "en", len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, lang string, n_chars long",
    ).select("doc_id", "text", "lang", "source", "n_chars")


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away today "
    "while the other animals watch the field and the sky is quite clear"
)


class TestRunCurate:
    def test_end_to_end(self, spark, tmp_path, capsys):
        from jobs.run_curate import main

        rows = [
            (0, GOOD, "src0"),
            (1, GOOD, "src0"),                       # exact dup -> gated out
            (2, GOOD.replace("today", "tonite"), "src1"),  # near dup of 0
            (3, "zzz " * 40, "src0"),                # fails quality gates
            (4, "the small team plans the work and the group builds a new "
                "engine while the data is loaded into a table and the results "
                "stay clear for all of the readers there", "src1"),
        ]
        d = str(tmp_path / "docs")
        out = str(tmp_path / "curated")
        docs(spark, rows).write.parquet(d)

        rc = main(["--docs", d, "--out", out])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        c = rec["counts"]
        assert c["input"] == 5
        assert c["after_gates"] == 3          # drops exact dup 1 and junk 3
        assert c["after_near_dup"] == 2       # near-dup 2 collapses into 0
        assert c["written"] == 2

        got = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got == {0, 4}

    def test_sampling_and_skip_near_dup(self, spark, tmp_path, capsys):
        from jobs.run_curate import main

        rows = [(i, GOOD + f" tail{i}", f"src{i % 2}") for i in range(20)]
        d = str(tmp_path / "docs2")
        out = str(tmp_path / "curated2")
        docs(spark, rows).write.parquet(d)

        rc = main([
            "--docs", d, "--out", out, "--no-near-dup",
            "--sample-rates", "src0=0.0,src1=1.0",
        ])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        kept = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert kept and all(i % 2 == 1 for i in kept)  # src0 sampled away
        assert rec["counts"]["written"] == len(kept)
