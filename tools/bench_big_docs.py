"""32x-scale probe for the webtext/dedup/ANN query suite — the documents
side of ``bench_big.py``'s x100 timeseries probe.

Replication must model corpus GROWTH, not duplication: copying text
verbatim N times would hand every document N-1 spurious exact/near dups
and blow the true pair count up quadratically — the opposite of a bigger
crawl. Instead each replica R>0 deterministically tags every 3rd word
with ``_rR``. Word 3-gram shingles always contain a tagged position, so
cross-replica Jaccard is ~0 (replicas are genuinely new corpus), while
within a replica the tagging is a bijection on shingle space — the
planted dup/near-dup structure of the base corpus is preserved exactly,
so per-replica result cardinality scales linearly like a real crawl.

Embeddings get deterministic hash noise (±0.05 per dim) plus a vec_id
shift: vectors stay near their base cluster (IVF/LSH bucket occupancy
grows realistically) without exact-tie top-k degeneracy.

No external data; no wall-clock in the derivation (replica index is the
only seed). Usage: python tools/bench_big_docs.py [out_json]
Writes the big tables under /tmp/spark_graft_bigdocs (reused if present),
prints one JSON line with per-query seconds at 32x beside sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from usgs_geomag_algorithms_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = "/tmp/spark_graft_bigdocs"
REPLICAS = int(os.environ.get("BIGDOCS_REPLICAS", "32"))

#: the documents/embeddings-heavy subset (timeseries probe covers events)
QUERIES = [
    "dedup_exact",
    "minhash_signature",
    "lsh_pairs",
    "near_dup_verified",
    "simhash",
    "ngram_jaccard_adjacent",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "curate_corpus",
    "novelty_share",
    "containment_pairs",
    "lexical_cosine_topk",
    "bm25_topk",
    "semantic_dedup",
    "knn_cosine",
    "knn_lsh",
    "knn_ivf_bcast",
    "embedding_near_dups_bucketed",
]


def build_big(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(BIG, "documents.parquet", "_SUCCESS")):
        return
    os.makedirs(BIG, exist_ok=True)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    out = None
    for r in range(REPLICAS):
        if r == 0:
            rep = docs
        else:
            tag = F.lit(f"_r{r}")
            rep = docs.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, i: F.when(
                            i % 3 == 0, F.concat(w, tag)
                        ).otherwise(w),
                    ),
                    " ",
                ),
            )
            rep = rep.withColumn("n_chars", F.length("text").cast("long"))
        rep = rep.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * 1_000_000_000)
        )
        out = rep if out is None else out.unionByName(rep)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(BIG, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    out = None
    for r in range(REPLICAS):
        if r == 0:
            rep = emb
        else:
            rep = emb.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: x
                    + (
                        F.hash(F.col("vec_id"), F.lit(r), i) % 1000
                    ).cast("float")
                    / F.lit(20000.0),
                ),
            )
        rep = rep.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * 1_000_000_000)
        )
        out = rep if out is None else out.unionByName(rep)
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(BIG, "embeddings.parquet")
    )

    for name in ("events", "orders", "lineitem", "region", "nation",
                 "customer", "supplier", "part"):
        src = os.path.join(SRC, name + ".parquet")
        dst = os.path.join(BIG, name + ".parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 32 concurrent tasks over x32 string-heavy aggregates need headroom
    # beyond the default 8g local JVM (must be set before JVM start)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="bench-big-docs", cores=cpus, shuffle_partitions=cpus
    )
    build_big(spark)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for sf_dir, tag in ((SRC, "sf01"), (BIG, f"x{REPLICAS}")):
        timings = {}
        for name in QUERIES:
            t = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.perf_counter() - t, 3)
            except Exception as e:  # record, keep probing
                timings[name] = f"error: {type(e).__name__}"
            spark.catalog.clearCache()
        out[tag] = timings
    big_tag = f"x{REPLICAS}"
    # The two quadratic-within-bucket ops document their scale dial
    # (SemDeDup: k ~ sqrt(N); hyperplane buckets: n_planes ~ log2 N).
    # The driver queries pin test-scale dials for oracle determinism, so
    # re-time them here at x32 with corpus-sized dials to show the
    # documented contract restores ~linear growth.
    import math

    from usgs_geomag_algorithms_spark import webtext_queries as W
    from usgs_geomag_algorithms_spark.operators import similarity as S
    from usgs_geomag_algorithms_spark.operators.semdedup import (
        semantic_dropped,
    )

    emb_big = spark.read.parquet(os.path.join(BIG, "embeddings.parquet"))
    scaled = {}
    n_planes = W.NEAR_DUP_PLANES_N + max(1, int(math.log2(REPLICAS)))
    t = time.perf_counter()
    S.embedding_near_dups(
        emb_big,
        threshold=W.NEAR_DUP_THRESHOLD,
        n_planes=n_planes,
        planes=S.md5_sign_planes(n_planes, W.EMB_DIM),
    ).write.format("noop").mode("overwrite").save()
    scaled[f"embedding_near_dups_bucketed@{n_planes}planes"] = round(
        time.perf_counter() - t, 3
    )
    spark.catalog.clearCache()
    k_scaled = max(W.KM_K, int(W.KM_K * math.sqrt(REPLICAS)))
    t = time.perf_counter()
    semantic_dropped(
        emb_big,
        k=k_scaled,
        n_iter=W.KM_ITER,
        tau_num=W.SEMDEDUP_TAU[0],
        tau_den=W.SEMDEDUP_TAU[1],
    ).write.format("noop").mode("overwrite").save()
    scaled[f"semantic_dedup@k{k_scaled}"] = round(time.perf_counter() - t, 3)
    spark.catalog.clearCache()

    ratio = {
        k: round(out[big_tag][k] / out["sf01"][k], 2)
        for k in QUERIES
        if isinstance(out[big_tag][k], float) and isinstance(out["sf01"][k], float)
    }
    line = json.dumps(
        {
            "metric": "bigdocs_probe",
            "replicas": REPLICAS,
            "cores": cpus,
            "sf01": out["sf01"],
            big_tag: out[big_tag],
            f"{big_tag}_over_sf01": ratio,
            f"{big_tag}_scaled_dials": scaled,
        }
    )
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
