"""sf1 (10×) bench pass of the join-bearing headline operators (VERDICT r03
item 7): run each at sf0.1-equivalent and 10× corpus sizes and record

  * wall time at both sizes (and the scale factor),
  * the join strategies in the EXECUTED (AQE-final) plan at each size —
    i.e. which no-hint joins AQE upgraded to broadcast, and which flipped
    strategy between sizes.

The corpus is the Zipfian sparse-vocab tier (bench._zipf_documents_dir):
true near-dup pairs stay linear in n there, so a superlinear wall is a JOIN
regression, not an output explosion (the degenerate 20-word corpus cannot
make that distinction — VERDICT r03 item 4).

Usage: python scripts/sf1_study.py [--docs-low 5000] [--docs-high 50000]
Prints one JSON line; paste the summary into BASELINE.md's sf1 section.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_JOIN_KINDS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct")


def _executed_plan(df) -> str:
    """Explain AFTER the action on the same DataFrame → AQE final plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _join_census(plan: str) -> dict:
    counts = {k: len(re.findall(k, plan)) for k in _JOIN_KINDS}
    # BroadcastHashJoin is a substring match only of itself; fine.
    return {k: v for k, v in counts.items() if v}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-low", type=int, default=5_000)
    ap.add_argument("--docs-high", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from bench import _scaled_embeddings_dir, _zipf_documents_dir
    from document_parser_spark.operators import curation, dedup, similarity, text
    from document_parser_spark.sources.session import get_spark, load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name="sf1-study", cpus=args.cpus)

    def doc_ops(d):
        return {
            "minhash_pairs": lambda: dedup.minhash_near_dup_pairs(
                d, shingle_k=5, threshold_pct=50
            ),
            "simhash_near_pairs": lambda: dedup.simhash_near_pairs(
                dedup.simhash_arrow(d), max_hamming=3
            ),
            "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(d, threshold_pct=50),
            "text_stats": lambda: text.text_stats(d),
            "language_id": lambda: text.language_id(d),
            # r04 fifth-session additions: the new join/agg-bearing pipeline
            # ops get the same 10x join-census treatment
            "doc_containment": lambda: dedup.containment_pairs(d),
            "tfidf_topk": lambda: text.tfidf_topk(d),
            "repeated_passages": lambda: curation.repeated_passage_intervals(d),
        }

    def emb_ops(e):
        q = e.filter(F.col("vec_id") < 5)
        return {
            "embedding_near_dup": lambda: similarity.cosine_near_dup_pairs(
                e, threshold=0.45
            ),
            "ann_sketch": lambda: similarity.sketch_topk(e, q, k=10),
        }

    out: dict = {"docs_sizes": [args.docs_low, args.docs_high],
                 "emb_sizes": [args.docs_low // 5 * 2, args.docs_high // 5 * 2],
                 "ops": {}}
    for n in (args.docs_low, args.docs_high):
        d = load_table(spark, _zipf_documents_dir(spark, n), "documents").select(
            "doc_id", "lang", "source", "text"
        )
        n_emb = n // 5 * 2  # keeps the sf0.1 docs:embeddings ratio (5000:2000)
        e = load_table(spark, _scaled_embeddings_dir(spark, n_emb), "embeddings")
        for name, fn in {**doc_ops(d), **emb_ops(e)}.items():
            t0 = time.monotonic()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0, 2)
            plan = _executed_plan(df)
            out["ops"].setdefault(name, {})[str(n)] = {
                "wall_sec": wall,
                "joins": _join_census(plan),
                "rows": df.count(),
            }
    lo, hi = str(args.docs_low), str(args.docs_high)
    for name, rows in out["ops"].items():
        rows["wall_growth"] = round(
            rows[hi]["wall_sec"] / max(rows[lo]["wall_sec"], 1e-9), 1
        )
        rows["join_flips"] = {
            k: (rows[lo]["joins"].get(k, 0), rows[hi]["joins"].get(k, 0))
            for k in _JOIN_KINDS
            if rows[lo]["joins"].get(k, 0) != rows[hi]["joins"].get(k, 0)
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
