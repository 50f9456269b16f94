"""r06 optimization sidecar bench (guide §1.4): per-query noop-sink isolation
at a DRIVER-LIKE sf1 scale, without touching the frozen ``bench.py``.

The driver's r05 measurement ran at sf=1.0 (its own generated tier: 10× the
sf0.1 row counts).  This harness synthesizes a *statistically matched* sf1
stand-in under ``.bench_data/sf1like/`` — documents drawn from the REAL
sf0.1 corpus vocabulary with the real (lang, source) block structure and
per-doc length distribution, embeddings isotropic unit dim-64 like the
testdata ones — then times individual declared queries exactly the way
``bench.py`` does (noop sink, best/median of N) and can dump
``explain("formatted")`` plans for the plans/r06/ artifacts.

Usage:
  python bench_extra.py --make-sf1 [--docs 50000] [--emb 20000]
  python bench_extra.py --queries embedding_near_dup,ngram_jaccard \
      [--sf-dir .bench_data/sf1like] [--cpus 32] [--repeats 3]
  python bench_extra.py --explain embedding_near_dup --out plans/r06/x.txt
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF1_DIR = os.path.join(REPO, ".bench_data", "sf1like")


def make_sf1(spark, n_docs: int, n_emb: int) -> None:
    """Build the sf1-like tier: documents + embeddings, deterministic."""
    import numpy as np
    import pandas as pd

    os.makedirs(SF1_DIR, exist_ok=True)
    # --- documents: same vocabulary / block / length shape as the real sf0.1
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rows = src.select("text", "lang", "source").limit(50).collect()
    vocab = sorted({w for r in rows for w in r["text"].split()})
    langs = [r["lang"] for r in src.select("lang").distinct().collect()]
    sources = [r["source"] for r in src.select("source").distinct().collect()]
    langs.sort()
    sources.sort()
    doc_path = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        rng = np.random.RandomState(42)
        vocab_arr = np.array(vocab)
        texts = []
        for i in range(n_docs):
            n_words = 17 + rng.randint(0, 44)  # ~17..60, mean ≈ real 38
            texts.append(" ".join(vocab_arr[rng.randint(0, len(vocab_arr), n_words)]))
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(n_docs, dtype=np.int64),
                "text": texts,
                "lang": [langs[i % len(langs)] for i in range(n_docs)],
                "source": [sources[(i // len(langs)) % len(sources)] for i in range(n_docs)],
            }
        )
        pdf["n_chars"] = pdf["text"].str.len().astype("int64")
        spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(doc_path)
        print(f"wrote {n_docs} documents -> {doc_path}", file=sys.stderr)
    # --- embeddings: isotropic unit vectors, dim 64 (like testdata)
    emb_path = os.path.join(SF1_DIR, "embeddings.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        rng = np.random.RandomState(7)
        mat = rng.normal(size=(n_emb, 64))
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n_emb, dtype=np.int64),
                "embedding": list(mat.astype(np.float64)),
                "label": [f"l{i % 10}" for i in range(n_emb)],
            }
        )
        spark.createDataFrame(pdf).repartition(16).write.mode("overwrite").parquet(emb_path)
        print(f"wrote {n_emb} embeddings -> {emb_path}", file=sys.stderr)
    # --- other tables: symlink from the real sf0.1 so every query resolves
    for name in (
        "customer documents_x events lineitem nation orders part region supplier"
    ).split():
        base = name.replace("_x", "")
        tgt = f"/root/testdata/sf0.1/{base}.parquet"
        lnk = os.path.join(SF1_DIR, f"{base}.parquet")
        if os.path.exists(tgt) and not os.path.exists(lnk):
            os.symlink(tgt, lnk)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-sf1", action="store_true")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--emb", type=int, default=20_000)
    ap.add_argument("--queries", default="")
    ap.add_argument("--sf-dir", default=SF1_DIR)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from document_parser_spark.sources.session import get_spark

    spark = get_spark("bench_extra", cpus=args.cpus)
    try:
        if args.make_sf1:
            make_sf1(spark, args.docs, args.emb)
            return
        import __spark_entry__ as entry

        qs = entry.queries()
        if args.explain:
            df = qs[args.explain](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            if args.out:
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    f.write(text)
                print(f"plan -> {args.out}", file=sys.stderr)
            else:
                print(text)
            return
        names = [n for n in args.queries.split(",") if n]
        result = {}
        for name in names:
            runs = []
            for _ in range(max(args.repeats, 1)):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.monotonic() - t0, 3))
            result[name] = {
                "median": round(statistics.median(runs), 3),
                "best": min(runs),
                "runs": runs,
            }
            print(json.dumps({name: result[name]}), file=sys.stderr, flush=True)
        print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus, "queries": result}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
