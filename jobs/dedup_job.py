"""Incremental corpus-dedup job — the spark-submit entry point for the
signature-table ingest pattern:

    spark-submit --py-files dist/document_parser_spark.zip \
        jobs/dedup_job.py \
        --shard /data/shard42.parquet --state /data/dedup_state \
        --shard-id shard42

Maintains ``<state>/signatures`` — the persisted (doc_id, band, sig) MinHash
signature table — across shard ingests.  Per shard it:

  1. computes the shard's band signatures (one explode + one aggregation
     over the SHARD only — the corpus is never re-shingled);
  2. joins them against the accumulated signature table to emit the
     near-dup pairs the shard INTRODUCES (old x old never regenerated;
     exact-Jaccard verify touches only candidate docs' text);
  3. appends the shard's signatures and text to the state tables,
     idempotently: a re-submitted shard-id is detected in the manifest and
     skipped, so crash-rerun never double-ingests (the same contract as
     extract_job's bucket resume).

Prints ONE JSON line: shard size, candidate/verified pair counts, and
whether the shard was a resume no-op.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shard", required=True, help="parquet with (doc_id, text)")
    parser.add_argument("--state", required=True, help="dedup state directory")
    parser.add_argument("--shard-id", required=True)
    parser.add_argument("--shingle-k", type=int, default=5)
    parser.add_argument("--threshold-pct", type=int, default=50)
    args = parser.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName(f"dedup:{args.shard_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from document_parser_spark.operators.dedup import (
        _verify_jaccard,
        minhash_signatures,
    )

    sig_path = os.path.join(args.state, "signatures")
    txt_path = os.path.join(args.state, "texts")
    manifest = os.path.join(args.state, "manifest")

    done = set()
    try:
        done = {
            r["shard_id"] for r in spark.read.parquet(manifest).collect()
        }  # manifest is tiny: one row per ingested shard
    except Exception:
        pass
    if args.shard_id in done:
        print(json.dumps({"shard_id": args.shard_id, "resumed_noop": True,
                          "docs": 0, "pairs": 0}))
        return

    shard = spark.read.parquet(args.shard).select("doc_id", "text")
    n_docs = shard.count()
    sig_new = minhash_signatures(shard, shingle_k=args.shingle_k)

    have_state = True
    try:
        sig_old = spark.read.parquet(sig_path)
        texts_old = spark.read.parquet(txt_path)
    except Exception:
        have_state = False

    left = sig_new.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    if have_state:
        right_sigs = sig_old.unionByName(sig_new)
        all_texts = texts_old.unionByName(shard)
    else:
        right_sigs = sig_new
        all_texts = shard
    cand = (
        left.join(
            right_sigs.select(F.col("doc_id").alias("doc_b"), "band", "sig"),
            on=["band", "sig"],
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    touched = all_texts.join(cand_ids, "doc_id", "left_semi")
    pairs = _verify_jaccard(cand, touched, "text", args.shingle_k, args.threshold_pct)
    n_pairs = pairs.count()
    pairs.write.mode("overwrite").parquet(
        os.path.join(args.state, f"pairs_{args.shard_id}")
    )

    # append state LAST, manifest after data: a crash between the two leaves
    # a re-runnable shard (dup signature rows are impossible because the
    # manifest gate above makes the append at-most-once per shard_id)
    sig_new.write.mode("append").parquet(sig_path)
    shard.write.mode("append").parquet(txt_path)
    spark.createDataFrame([(args.shard_id,)], "shard_id string").write.mode(
        "append"
    ).parquet(manifest)

    print(
        json.dumps(
            {
                "shard_id": args.shard_id,
                "resumed_noop": False,
                "docs": n_docs,
                "pairs": n_pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
