"""Amortization study for the persisted ANN index (plans/ann_index.py).

Question: what does a query batch cost when the corpus side (k-means
assignment + 512-bit sketch) is read from the stored index instead of being
recomputed inline per batch?  The inline paths pay a full-corpus Arrow
sketch pass every batch — and ``ivf_sketch_topk`` additionally re-runs the
integer Lloyd quantizer — while the stored path's per-batch work is only
the hamming scan + exact rerank.

Protocol: one deterministic isotropic corpus (bench's ``escale`` parquet),
one index build (wall reported), then ALTERNATING timed runs of
inline vs from-index in the same window (best-of-N each, the repo's
co-tenant-noise protocol — never back-to-back one-shots).  Results are
materialized with the noop writer like bench.py.

    python scripts/ann_index_study.py [--n 100000] [--cpus 16] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument(
        "--dim", type=int, default=64,
        help="embedding width — dim 64 can't surface the stored-sketch I/O "
        "win (256 B float row vs 128 B sketch row); production dims can",
    )
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import bench
    from pyspark.sql import functions as F

    from document_parser_spark.operators import similarity
    from document_parser_spark.plans.ann_index import (
        load_ann_index,
        run_index_build_checkpointed,
    )
    from document_parser_spark.sources.session import get_spark, load_table

    spark = get_spark(app_name=f"ann-index-study[{args.cpus}]", cpus=args.cpus)
    edir = bench._scaled_embeddings_dir(spark, args.n, dim=args.dim)
    emb = load_table(spark, edir, "embeddings")
    q = emb.filter(F.col("vec_id") < args.n_queries)

    out = os.path.join(REPO, ".bench_data", f"ann_index_{args.n}_d{args.dim}")
    t0 = time.monotonic()
    stats = run_index_build_checkpointed(
        spark, emb, out, run_id="study", num_buckets=64
    )
    build_wall = round(time.monotonic() - t0, 2)
    index, cids, cmat, meta = load_ann_index(spark, out)

    def timed(fn) -> float:
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 2)

    variants = {
        "sketch_inline": lambda: similarity.sketch_topk(emb, q, k=args.k),
        "sketch_from_index": lambda: similarity.sketch_topk_from_index(
            index, emb, q, k=args.k
        ),
        "ivf_sketch_inline": lambda: similarity.ivf_sketch_topk(
            emb, q, k=args.k, nlist=stats["nlist"]
        ),
        "ivf_sketch_from_index": lambda: similarity.ivf_sketch_topk_from_index(
            index, cids, cmat, emb, q, k=args.k
        ),
    }
    walls: dict[str, list[float]] = {name: [] for name in variants}
    for _ in range(args.rounds):  # alternating, never back-to-back one-shots
        for name, fn in variants.items():
            walls[name].append(timed(fn))

    result = {
        "n": args.n,
        "dim": args.dim,
        "n_queries": args.n_queries,
        "cpus": args.cpus,
        "build_wall_sec": build_wall,
        "centroids_reused_on_build": stats["centroids_reused"],
        "nlist": stats["nlist"],
        "walls": walls,
        "best": {name: min(w) for name, w in walls.items()},
    }
    result["sketch_amortization"] = round(
        result["best"]["sketch_inline"] / result["best"]["sketch_from_index"], 2
    )
    result["ivf_sketch_amortization"] = round(
        result["best"]["ivf_sketch_inline"] / result["best"]["ivf_sketch_from_index"],
        2,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
