"""Viral-duplicate skew proof for the curation canonical election
(plans/curate.py): a web corpus's most-copied text (boilerplate pages,
scraped mirrors) forms one giant md5 group.  The r04-original window
election (``Window.partitionBy(md5(text))``) shuffles EVERY copy's full
text into that group's single partition — task time grows with the
largest duplicate group.  The shipped default (ONE aggregate per md5:
min doc_id, first text — exact, the md5 is the equality key — with
map-side partial combine) ships at most one row per (input partition,
distinct text), so no partition ever holds a duplicate group.

Protocol (same discipline as pathological_study.py / the bench scaling
studies): input materialized ONCE to parquet (generation can't pollute
the measured stages), then ALTERNATING runs of the two election methods,
each in a fresh SparkSession with the UI enabled, reporting per-method
best wall + the worst max/median task ratio from the Spark REST API.
Equality of the two methods' outputs is pytest-gated
(tests/test_curate_run.py::test_election_methods_agree); this study is
the wall-clock/straggler evidence.

Usage: python scripts/skew_election_study.py [--docs 200000]
       [--viral 50000] [--cpus 16] [--reps 2]
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

UI_PORT = 4049  # study-local fixed port


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}") as r:
        return json.loads(r.read())


def _task_ratios() -> list:
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
                    "name": st.get("name", "")[:50],
                    "tasks": st["numCompleteTasks"],
                    "median_s": round(med, 2),
                    "max_s": round(mx, 2),
                    "ratio": round(mx / max(med, 1e-3), 2),
                }
            )
    return sorted(out, key=lambda r: -r["ratio"])


def _materialize_input(n_docs: int, viral: int, cpus: int, out_root: str) -> str:
    """(doc_id, text) parquet: doc_ids [0, viral) all carry ONE identical
    text (the planted viral group); the rest come from the deterministic
    synthetic generator (distinct up to its own planted 1-in-10 dups)."""
    from pyspark.sql import functions as F

    from document_parser_spark.plans.curate import synthetic_curation_corpus
    from document_parser_spark.sources.session import get_spark

    path = os.path.join(out_root, f"input_{n_docs}_{viral}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(app_name="skew-gen", cpus=cpus)
        viral_text = (
            "This page uses cookies to improve your experience and by "
            "continuing to browse the site you agree to our use of cookies "
            "as described in the policy below. " * 40
        )
        df = synthetic_curation_corpus(spark, n_docs).withColumn(
            "text",
            F.when(F.col("doc_id") < viral, F.lit(viral_text)).otherwise(
                F.col("text")
            ),
        )
        df.write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def _run_once(method: str, input_path: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from document_parser_spark.plans.curate import election_frames, with_content_bucket
    from document_parser_spark.sources.session import get_spark

    spark = get_spark(
        app_name=f"skew-{method}",
        cpus=cpus,
        extra={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    docs = spark.read.parquet(input_path)
    t0 = time.monotonic()
    canonical, _ = election_frames(with_content_bucket(docs), method=method)
    # consumer forces the full election incl. the text payload (sum of
    # lengths reads every elected text byte, count alone could prune)
    row = canonical.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
    ).collect()[0]
    wall = time.monotonic() - t0
    ratios = _task_ratios()
    spark.stop()
    return {
        "wall_s": round(wall, 2),
        "canonical": int(row["n"]),
        "chars": int(row["chars"]),
        "worst": ratios[0] if ratios else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--viral", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, ".tmp", "skew_study"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    input_path = _materialize_input(args.docs, args.viral, args.cpus, args.out)

    runs: dict[str, list] = {"groupby": [], "window": []}
    for _ in range(args.reps):  # alternating — co-tenant noise discipline
        for method in ("groupby", "window"):
            runs[method].append(_run_once(method, input_path, args.cpus))

    result = {"docs": args.docs, "viral_copies": args.viral, "cpus": args.cpus}
    for method, rs in runs.items():
        best = min(rs, key=lambda r: r["wall_s"])
        result[method] = {
            "best_wall_s": best["wall_s"],
            "walls": [r["wall_s"] for r in rs],
            "max_task_s": [r["worst"]["max_s"] if r["worst"] else None for r in rs],
            "worst_ratio": [r["worst"]["ratio"] if r["worst"] else None for r in rs],
            "worst_stage": best["worst"],
        }
    gs = {(r["canonical"], r["chars"]) for rs in runs.values() for r in rs}
    result["outputs_identical"] = len(gs) == 1
    print(json.dumps(result))
    shutil.rmtree(os.path.join(args.out, "run"), ignore_errors=True)


if __name__ == "__main__":
    main()
