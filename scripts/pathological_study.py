"""Pathological-document scale proof (VERDICT r03 item 5, SURVEY §7.3):
inject a ~100 MB document into a large extraction run and show the
segmented path keeps the parse stage straggler-free with output equality.

Three sequential runs of the checkpointed extraction job:

  A. baseline        — N synthetic docs, no giant;
  B. giant+segmented — N docs + the 100 MB doc, segment-parallel parse;
  C. giant+monolith  — same input, segmentation OFF (the straggler control).

For each run the Spark REST API (spark.ui enabled just for this study) is
polled before session stop for per-stage task summaries; the reported
``worst_task_ratio`` is max/median executor run time over stages with ≥8
tasks and max ≥ 2 s.  The segmented run must stay < 2; the monolith control
demonstrates the straggler the segmentation removes.  Output equality: the
giant doc's reassembled span stream (run B parquet) must equal the pure
kernel parse of the same text.

Usage: python scripts/pathological_study.py [--docs 200000] [--giant-mb 100]
Prints one JSON line; summary goes into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4047  # fixed, study-local (default 4040 may collide with leftovers)


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}") as r:
        return json.loads(r.read())


def _task_ratios() -> list:
    """(stage, max_s, median_s, ratio) for completed stages with ≥8 tasks."""
    apps = _rest("/applications")
    app_id = apps[0]["id"]
    out = []
    for st in _rest(f"/applications/{app_id}/stages?status=COMPLETE"):
        if st.get("numCompleteTasks", 0) < 8:
            continue
        sid, att = st["stageId"], st["attemptId"]
        try:
            summ = _rest(
                f"/applications/{app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = (v / 1000.0 for v in summ["executorRunTime"])
        if mx >= 0.2:
            out.append(
                {
                    "stage": sid,
                    "name": st.get("name", "")[:60],
                    "tasks": st["numCompleteTasks"],
                    "median_s": round(med, 2),
                    "max_s": round(mx, 2),
                    "ratio": round(mx / max(med, 1e-3), 2),
                }
            )
    return sorted(out, key=lambda r: -r["ratio"])


def _giant_text(target_mb: int) -> str:
    from document_parser_spark.corpus import synthesize_doc

    target = target_mb * (1 << 20)
    parts, size, i = [], 0, 0
    while size < target:
        t = synthesize_doc(i)["text"]
        parts.append(t)
        size += len(t) + 1
        i += 1
    return "\n".join(parts)


def _giant_df(spark, target_mb: int):
    """The giant doc built EXECUTOR-side (one mapInPandas partition):
    embedding a 100 MB string as a driver-side local relation ships it
    through the plan and stalled the GC (measured: 1.5 GB allocation
    retries) — the deterministic generator runs where the data lives."""
    import pandas as pd
    from typing import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {"doc_id": ["giant-000000000"], "text": [_giant_text(target_mb)]}
                )

    return spark.range(0, 1, 1, 1).mapInPandas(gen, schema="doc_id string, text string")


def _materialize_input(n_docs: int, giant_mb: int, cpus: int, out_root: str) -> str:
    """Write the study input ONCE as parquet (docs + giant doc): in
    production the corpus arrives from storage, so per-run synthetic
    generation must not pollute the measured extraction stages (the giant's
    generation chain otherwise collapses into its scan task and reads as a
    phantom straggler)."""
    from document_parser_spark.sources.data import lift_flat_to_input, synthetic_input_df
    from document_parser_spark.sources.session import get_spark

    path = os.path.join(out_root, f"input_{n_docs}_{giant_mb}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(app_name="patho-gen", cpus=cpus)
        df = synthetic_input_df(spark, n_docs).unionByName(
            lift_flat_to_input(_giant_df(spark, giant_mb))
        )
        df.write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def _run(tag: str, input_path: str, with_giant: bool, segment: bool, cpus: int, out_root: str) -> dict:
    from document_parser_spark.plans.resume import run_extraction_checkpointed
    from document_parser_spark.schemas import DOCUMENTS_INPUT
    from document_parser_spark.sources.session import get_spark

    spark = get_spark(
        app_name=f"patho-{tag}",
        cpus=cpus,
        extra={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    df = spark.read.schema(DOCUMENTS_INPUT).parquet(input_path)
    if not with_giant:
        df = df.filter("doc_id <> 'giant-000000000'")
    out_dir = os.path.join(out_root, tag)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    stats = run_extraction_checkpointed(
        spark,
        df,
        out_dir,
        run_id=f"patho-{tag}",
        num_buckets=64,
        segment_threshold_chars=(1 << 21) if segment else None,
    )
    wall = round(time.monotonic() - t0, 1)
    ratios = _task_ratios()
    spark.stop()
    return {
        "wall_sec": wall,
        "docs": stats["docs_processed"],
        "worst_task_ratio": ratios[0]["ratio"] if ratios else None,
        "max_task_s": max((r["max_s"] for r in ratios), default=None),
        "stages": ratios[:4],
        "out_dir": out_dir,
    }


def _giant_equal(out_dir: str, giant: str) -> bool:
    """Reassembled segmented spans == pure-kernel parse of the same text."""
    from document_parser_spark.kernel.pipeline import parse_document
    from document_parser_spark.sources.session import get_spark

    expected = [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in parse_document(giant)["spans"]
    ]
    spark = get_spark(app_name="patho-check", cpus=8)
    rows = (
        spark.read.parquet(os.path.join(out_dir, "document_spans"))
        .filter("doc_id = 'giant-000000000'")
        .select("spans")
        .collect()
    )
    spark.stop()
    if len(rows) != 1:
        return False
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in rows[0]["spans"]]
    return got == expected


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--giant-mb", type=int, default=100)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--skip-monolith", action="store_true")
    args = ap.parse_args()

    out_root = os.path.join(REPO, ".tmp", "patho")
    inp = _materialize_input(args.docs, args.giant_mb, args.cpus, out_root)
    result = {
        "n_docs": args.docs,
        "giant_mb": args.giant_mb,
        "baseline": _run("base", inp, False, True, args.cpus, out_root),
        "segmented": _run("seg", inp, True, True, args.cpus, out_root),
    }
    if not args.skip_monolith:
        result["monolith"] = _run("mono", inp, True, False, args.cpus, out_root)
    # the north-rule criterion: the giant doc, segmented, must not create a
    # straggler relative to the giant-free run
    result["max_task_ratio_seg_vs_base"] = round(
        result["segmented"]["max_task_s"] / max(result["baseline"]["max_task_s"], 1e-3), 2
    ) if result["segmented"]["max_task_s"] and result["baseline"]["max_task_s"] else None
    result["giant_spans_equal_kernel"] = _giant_equal(
        result["segmented"]["out_dir"], _giant_text(args.giant_mb)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
