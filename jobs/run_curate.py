"""spark-submit entry point for the training-data curation pipeline.

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_curate.py --docs /data/documents --out /data/curated \
        [--lang en] [--min-quality 0.7] [--near-dup-threshold 0.3] \
        [--no-near-dup] [--sample-rates src0=0.5,src1=1.0]

Stages (each optional, composed into as few scans as the plan allows):
  1. exact dedup + language gate + quality gate  (operators/curate.curate)
  2. near-dup clustering: MinHash-LSH -> exact-Jaccard verify ->
     connected components -> keep cluster canonicals  (dedup module)
  3. stratified (domain-mixing) sampling by source  (curate module)

Writes the surviving doc manifest (doc_id + gate columns + cluster id)
as parquet and prints one JSON line of per-stage counts — the lineage
record a 10^12-doc curation run is monitored by.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output manifest path")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--near-dup-threshold", type=float, default=0.3)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument(
        "--sample-rates",
        default=None,
        help="comma list src=rate; omitted = keep everything",
    )
    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.operators import dedup as D
    from usgs_geomag_algorithms_spark.operators.curate import (
        curate,
        stratified_sample,
    )
    from usgs_geomag_algorithms_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark(app_name="run_curate")
    docs = spark.read.parquet(args.docs)
    counts = {"input": docs.count()}

    kept = curate(docs, lang=args.lang, min_quality=args.min_quality)
    counts["after_gates"] = kept.count()

    if not args.no_near_dup:
        surviving = docs.join(kept.select("doc_id"), "doc_id")
        clusters = D.near_dup_clusters(
            surviving, threshold=args.near_dup_threshold
        )
        kept = kept.join(
            clusters.where(F.col("is_canonical")).select(
                "doc_id", "cluster_id"
            ),
            "doc_id",
        )
        counts["after_near_dup"] = kept.count()

    if args.sample_rates:
        rates = {
            k: float(v)
            for k, v in (p.split("=") for p in args.sample_rates.split(","))
        }
        sampled = stratified_sample(docs, rates).select("doc_id")
        kept = kept.join(sampled, "doc_id")
        counts["after_sampling"] = kept.count()

    kept.write.mode("overwrite").parquet(args.out)
    counts["written"] = spark.read.parquet(args.out).count()
    print(json.dumps({"out": args.out, "counts": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
