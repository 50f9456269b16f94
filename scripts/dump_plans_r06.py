"""Dump explain('formatted') for the r06-touched declared queries.

Usage: python scripts/dump_plans_r06.py <repo_root> <out_dir> <suffix>
Run once from the round-start worktree (suffix=before) and once from HEAD
(suffix=after); the judge checks plan claims against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)
os.makedirs(out_dir, exist_ok=True)

QUERIES = [
    "ngram_jaccard",
    "embedding_near_dup",
    "minhash_family",
    "simhash_near_pairs",
    "simhash_docs",
    "doc_containment",
    "dedup_clusters",
    "cluster_canonical",
    "repeated_spans",
    "repeated_passages",
    "text_stats",
    "language_id",
    "repetition_stats",
    "scrub_fingerprints",
    "quality_signals",
    "decontaminate",
    "tfidf_topk",
    "doc_chunks",
    "curate_corpus",
    "corpus_profile",
    "tpch_q1",
    "key_value_join",
    "semi_join_rows",
    "topk_per_group",
    "sessionize_events",
    "filter_modes",
    "dedup_exact",
    "set_ops",
    "asof_join",
    "window_ops",
    "ann_baselines",
]

from document_parser_spark.sources.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

spark = get_spark("dump_plans", cpus=8)
qs = entry.queries()
for name in QUERIES:
    try:
        df = qs[name](spark, "/root/testdata/sf0.1")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("ok", name, flush=True)
    except Exception as exc:  # noqa: BLE001
        print("ERR", name, exc, flush=True)
spark.stop()
