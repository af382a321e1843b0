"""spark-submit entry point for the COMPLETE pretraining-data build:

    spark-submit --py-files usgs_geomag_algorithms_spark.zip \
        jobs/run_pretrain_build.py --docs /data/documents --out /data/build \
        [--lang en] [--min-quality 0.7] [--near-dup-threshold 0.3] \
        [--holdout-frac 0.25] [--merges 8] [--seq-len 512]

Stages (the order IS the semantics — see operator docstrings):
  1. curation gates: exact dedup + language + quality  (curate.curate)
  2. leakage-safe split: near-dup clusters assigned WHOLE to
     train/holdout, so no near-duplicate of an eval document can sit in
     the training set  (curate.leakage_safe_split)
  3. tokenizer training: distributed BPE over the TRAIN side only —
     fitting the tokenizer on held-out text is itself leakage  (bpe)
  4. tokenization of both sides with the trained merges
     (dictionary encode: each distinct word folded once, joined back)
  5. sequence packing per (split, source-stratum) on the REAL BPE token
     counts — the concat-and-chunk training layout  (packing)

Writes, under --out:
  manifest.parquet   one row per surviving doc: split, cluster, token
                     count + stream hash, packed span (partitioned by
                     split — a loader reads only its side)
  merges.parquet     the trained tokenizer artifact (ordered merge list;
                     written via Spark so it lands on the cluster
                     filesystem when --out is hdfs://... / s3://...)
  merges.json        driver-local convenience copy (skipped when --out
                     is not a local path)
and prints ONE JSON line of per-stage counts — the lineage record a
10^12-doc build is monitored by.

At 100 TB every stage is the scale-shaped plan its module documents:
clustering is banded-LSH (never all-pairs), BPE rounds are vocab-sized,
tokenization is one corpus scan + a dictionary join, packing is one
shuffle on (split, stratum). Nothing here collects corpus-sized data.
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
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--near-dup-threshold", type=float, default=0.3)
    ap.add_argument("--holdout-frac", type=float, default=0.25)
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=512)
    args = ap.parse_args(argv)

    from usgs_geomag_algorithms_spark.operators.bpe import (
        bpe_tokenize,
        bpe_train,
    )
    from usgs_geomag_algorithms_spark.operators.curate import (
        curate,
        leakage_safe_split,
    )
    from usgs_geomag_algorithms_spark.operators.packing import pack_sequences
    from usgs_geomag_algorithms_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark(
        app_name="run_pretrain_build"
    )
    docs = spark.read.parquet(args.docs)
    counts = {"input": docs.count()}

    # 1. gates
    kept_ids = curate(
        docs, lang=args.lang, min_quality=args.min_quality
    ).select("doc_id")
    survivors = docs.join(kept_ids, "doc_id").localCheckpoint()
    counts["after_gates"] = survivors.count()

    # 2. leakage-safe split (clusters computed over the survivor set)
    split = leakage_safe_split(
        survivors,
        holdout_frac=args.holdout_frac,
        threshold=args.near_dup_threshold,
    ).localCheckpoint()
    counts["train_docs"] = split.where("split = 'train'").count()
    counts["holdout_docs"] = split.where("split = 'holdout'").count()

    # 3. tokenizer training on the train side only
    train_docs = survivors.join(
        split.where("split = 'train'").select("doc_id"), "doc_id"
    )
    merges_rows = (
        bpe_train(train_docs, n_merges=args.merges)
        .orderBy("merge_round")
        .collect()
    )
    merges = [(r["lhs"], r["rhs"]) for r in merges_rows]
    counts["bpe_merges"] = len(merges)

    # 4. tokenize BOTH sides with the train-fitted tokenizer. Checkpoint:
    # the manifest plan consumes `tokens` twice (split join + packing
    # lineage) — without it the dominant tokenize pass runs twice.
    tokens = bpe_tokenize(survivors, merges).localCheckpoint()
    # docs with zero whitespace tokens have no tokenize row and no place
    # in the packed stream — drop them EXPLICITLY and record the count
    # instead of letting inner joins hide them from the lineage
    counts["tokenless_dropped"] = counts["after_gates"] - tokens.count()

    # 5. pack per (split, source) stratum on real BPE token counts — the
    # composite stratum keeps each side's token stream independent
    packed = pack_sequences(
        split.select("doc_id", "split")
        .join(tokens, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("stratum", F.concat_ws("/", "split", "source")),
        seq_len=args.seq_len,
        tokens_col="n_tokens",
        stratum_col="stratum",
    )
    manifest = (
        split.join(tokens, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .join(
            packed.select(
                "doc_id", "start_offset", "first_bin", "last_bin"
            ),
            "doc_id",
        )
    )

    (
        manifest.repartition("split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(f"{args.out}/manifest.parquet")
    )
    # tokenizer artifact twice: a merges parquet via Spark (lands on the
    # cluster filesystem next to the manifest when --out is hdfs://...)
    # and a driver-local merges.json convenience copy when --out is a
    # local path
    spark.createDataFrame(
        merges_rows,
        "merge_round int, lhs string, rhs string,"
        " pair_count bigint, token string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{args.out}/merges.parquet")
    try:
        os.makedirs(args.out, exist_ok=True)
        f = open(f"{args.out}/merges.json", "w")
    except OSError:
        f = None
    if f is not None:
        with f:
            json.dump(
                [
                    {
                        "merge_round": r["merge_round"],
                        "lhs": r["lhs"],
                        "rhs": r["rhs"],
                        "pair_count": r["pair_count"],
                        "token": r["token"],
                    }
                    for r in merges_rows
                ],
                f,
                indent=1,
            )
    out = spark.read.parquet(f"{args.out}/manifest.parquet")
    counts["manifest_rows"] = out.count()
    counts["train_tokens"] = (
        out.where("split = 'train'")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()[0]["s"]
    )
    seqs = (
        out.where("split = 'train'")
        .groupBy("source")
        .agg(F.max("last_bin").alias("mb"))
        .agg(F.sum(F.col("mb") + 1).alias("s"))
        .collect()[0]["s"]
    )
    counts["train_sequences"] = int(seqs) if seqs is not None else 0
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
