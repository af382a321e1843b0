"""Second scaling-evidence pipeline: the webtext curation path.

The north rule's N-vs-4N criterion is evidenced for the ROLLUP cascade in
tools/bench_scaling.py; this tool applies the identical protocol (same
input, two parallelism levels, warm runs, rest between legs, probe-gated
via tools/bench_when_rested.sh MODE=curate) to the other engine pillar —
the training-data curation pipeline:

    corpus -> quality/lang gates + exact-dedup window (curate)
           -> shingle -> MinHash -> LSH bands -> bucket join
           -> exact-Jaccard verify (near_dup_pairs_verified)

Corpus synthesis is deterministic and 100% JVM-side (hash-indexed
vocabulary lookups — no Python, no RNG state), cached as parquet in /tmp
and NEVER timed: in production the corpus already exists; the engine's
work starts at the scan.  ~58% of docs are members of a planted
near-dup group (one mutated copy two ids apart), so the LSH join and the
verify stage carry realistic candidate volume.

Usage:
    python tools/bench_scaling_curate.py [--leg CORES]   # one leg
    python tools/bench_scaling_curate.py                 # full N vs 4N
Env: SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_SCALE_REST,
     SPARK_GRAFT_CURATE_DOCS (default 400000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_CURATE_DOCS", "40000"))
VOCAB = 65536


def corpus_path() -> str:
    return f"/tmp/spark_graft_bench/curate_corpus_n{N_DOCS}"


def build_corpus(spark) -> None:
    """Deterministic doc table: (doc_id, text, lang).  Word picks are
    xxhash64-indexed into a vocabulary that carries ~6% English marker
    words (so the corpus passes the engine's lang/quality gates) — the
    hash kills the structural cross-doc correlations a linear-congruence
    pick would plant.  Docs with doc_id % 5 == 2 are a near-dup of their
    5-block leader (every 8th word mutated) for the LSH path; every 31st
    doc is an EXACT duplicate of its neighbor for the dedup window."""
    from pyspark.sql import functions as F

    if os.path.exists(corpus_path() + "/_SUCCESS"):
        return
    # 1-in-16 words (6.25%) are English markers: enough that every doc
    # clears the stopword-ratio gate and argmax-predicts 'en'.  Filler
    # words come straight from the hash over a 2^16 effective vocabulary
    # (a literal array that size would explode the plan; and a SMALL
    # vocabulary is a correctness trap — at 4096 fillers the cross-doc
    # Jaccard baseline is high enough that LSH candidate volume grows
    # O(N^2), measured as 7x wall for 2x docs)
    markers = F.array(
        F.lit("the"), F.lit("and"), F.lit("of"), F.lit("is")
    )
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    # near-dup groups: member 2 of each 5-block shares base text with
    # member 0; exact dups copy their left neighbor
    base_id = F.when(
        F.pmod(F.col("doc_id"), 5) == 2, F.col("doc_id") - 2
    ).otherwise(F.col("doc_id"))
    exact_src = F.when(
        F.pmod(F.col("doc_id"), 31) == 30, F.col("doc_id") - 1
    ).otherwise(base_id)
    n_words = (F.pmod(exact_src * 31, 101) + 50).cast("int")
    is_mut = (F.pmod(F.col("doc_id"), 5) == 2) & (
        F.pmod(F.col("doc_id"), 31) != 30
    )
    def word(i):
        h = F.xxhash64(exact_src, i)
        return F.when(
            F.pmod(h, 16) == 0,
            F.element_at(markers, (F.pmod(h, 64) / 16 + 1).cast("int")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(h, F.lit(VOCAB)).cast("string"))
        )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.when(
                is_mut & (F.pmod(i, 8) == 0), F.lit("zmut")
            ).otherwise(word(i)),
        ),
    )
    (
        base.select("doc_id", text.alias("text"), F.lit("en").alias("lang"))
        .repartition(64)
        .write.mode("overwrite")
        .parquet(corpus_path())
    )


def run_leg(cores: int) -> dict:
    from usgs_geomag_algorithms_spark.session import get_spark
    from usgs_geomag_algorithms_spark.operators.curate import curate
    from usgs_geomag_algorithms_spark.operators.dedup import (
        near_dup_pairs_verified,
    )

    spark = get_spark(
        app_name=f"curate_scaling_{cores}", cores=cores,
        shuffle_partitions=max(cores * 2, 8),
    )
    build_corpus(spark)
    docs = spark.read.parquet(corpus_path())

    def one_pass() -> dict:
        t0 = time.monotonic()
        n_curated = curate(docs).count()
        t1 = time.monotonic()
        n_pairs = near_dup_pairs_verified(
            docs, k=16, shingle_n=8, bands=4, threshold=0.5
        ).count()
        t2 = time.monotonic()
        spark.catalog.clearCache()
        return {
            "curate_sec": round(t1 - t0, 3),
            "neardup_sec": round(t2 - t1, 3),
            "wall_sec": round(t2 - t0, 3),
            "n_curated": n_curated,
            "n_pairs": n_pairs,
            "docs_per_sec": round(N_DOCS / (t2 - t0), 1),
        }

    cold = one_pass()
    warm = one_pass()
    return {"cores": cores, "n_docs": N_DOCS, "cold": cold, "warm": warm}


def main() -> int:
    if "--leg" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(cores)))
        return 0

    n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n_hi = 4 * n_lo
    rest = int(os.environ.get("SPARK_GRAFT_SCALE_REST", "0"))

    def leg(cores: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(cores)],
            capture_output=True, text=True, timeout=3000,
            env=dict(os.environ,
                     SPARK_DRIVER_MEMORY=os.environ.get(
                         "SPARK_DRIVER_MEMORY", "48g")),
        )
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    hi = leg(n_hi)
    if rest:
        time.sleep(rest)
    lo = leg(n_lo)
    t_lo, t_hi = lo["warm"]["wall_sec"], hi["warm"]["wall_sec"]
    assert lo["warm"]["n_curated"] == hi["warm"]["n_curated"]
    assert lo["warm"]["n_pairs"] == hi["warm"]["n_pairs"]
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    result = {
        "pipeline": "curate + lsh-neardup-verify",
        "n_docs": N_DOCS,
        "n_curated": lo["warm"]["n_curated"],
        "n_pairs": lo["warm"]["n_pairs"],
        f"local{n_lo}": lo["warm"],
        f"local{n_hi}": hi["warm"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "curate_scaling.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
