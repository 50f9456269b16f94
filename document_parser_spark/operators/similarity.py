"""Similarity search over an embedding column (array<float>).

Paths:
  * ``brute_force_topk``       — the float performance baseline: native
    ``F.zip_with`` dot product in double precision, whole-stage codegen,
    per-query top-k.  This is the path bench.py measures.
  * ``brute_force_topk_exact`` — the oracle-comparable twin: components are
    scaled to exact integers (``floor(val * 1e8)``), dot/norm accumulate in
    int64 (order-independent), and only the final cosine divides in double —
    bit-identical to the DuckDB mirror.  Query norms come from the query's
    OWN vector (not looked up in the corpus), so arbitrary query frames work.
  * ``lsh_bucketed_topk``      — banded sign-LSH (bands × rows_per_band
    deterministic hyperplanes) buckets vectors; a pair is a candidate iff it
    shares ≥1 band bucket; exact integer cosine ranks candidates.
  * ``ivf_topk``               — IVF-flat with a k-means-refined quantizer
    (integer-exact Lloyd), nlist ~ √n, nprobe = nlist/8 (≤12.5% probed at
    any corpus size).  The right tool when the corpus actually clusters.
  * ``sketch_topk``            — hamming-sketch scan + exact re-rank: the
    measured winner on THIS corpus (isotropic embeddings, where partition
    membership is nearly independent of cosine neighborhoods — BASELINE.md
    has the sweep: sketch 0.995 recall@10 at 10% scored vs IVF ≤0.63 /
    LSH 0.78 at similar fractions).  At rest the 64 B sketch column is the
    only thing the full-corpus pass reads.
  * ``cosine_near_dup_pairs``  — embedding near-dup for the dedup family:
    banded-LSH candidates + exact integer cosine threshold.  Never all-pairs.

  * ``ivf_sketch_topk``        — the IVF→sketch→exact composition for
    corpora that actually cluster: probe nprobe/nlist of the corpus,
    hamming-rank ONLY the probed lists' sketch words, exact-rerank the top
    slice — sub-linear in BOTH the sketch scan (nprobe/nlist of the corpus)
    and the exact scoring (rerank_frac of the probed set, ~1.3% of the
    corpus at defaults).  On THIS sandbox's isotropic embeddings any
    partition pruning caps recall at ~0.5-0.6 (measured, BASELINE.md), so
    the flat ``sketch_topk`` stays the default; on clustered data (pytest:
    tests/test_similarity.py clustered-corpus case) the hybrid holds
    recall ≥0.9 at an exact-scored fraction below either parent.
  * ``ann_topk``               — the single entry-point facade: routes to
    ``sketch_topk`` by default (the measured winner), with ``method=`` for
    the specialized paths.
  * ``sketch_topk_from_index`` / ``ivf_sketch_topk_from_index`` — the same
    queries against the PERSISTED index table (plans/ann_index.py builds
    it; build-once / query-many): the corpus pass scans only the stored
    64 B sketches and the float column is read exactly once, for the
    rerank join.  Byte-identical to the inline twins; amortization
    measured in BASELINE.md (scripts/ann_index_study.py).

Determinism: hyperplane signs are the parity of the first md5 nibble of
"plane:pos" — reproducible in Python (sign matrix is computed driver-side
with hashlib and inlined as a LITERAL column, zero per-row hashing) and in
SQL (DuckDB mirror in __spark_entry__.py), so every integer projection,
bucket id, and cosine is bit-identical across engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

BANDS = 8           # banded LSH: number of bands
ROWS_PER_BAND = 4   # hyperplanes per band (16 buckets each)
# Recall model for sign-LSH: P(candidate) = 1 - (1 - p^r)^b with
# p = 1 - θ/π.  At the corpus' near-neighbor band (cos≈0.45, p≈0.65):
# b=4 ⇒ ~0.55 measured 0.58;  b=8 ⇒ ~0.80 — doubling bands doubles
# candidate volume but keeps per-band selectivity (2^r buckets) unchanged.
# float → int scaling.  Overflow envelope for the int64 dot products (dim 64):
# dim·(|val|·SCALE)² < 2^63 ⇒ |val| ≤ ~3.7 (64·(3.7e8)² ≈ 8.8e18 < 9.22e18).
# Unit-norm embeddings (components ≪ 1) sit far inside; feeding raw
# unnormalized vectors with larger components would wrap silently in numpy.
SCALE = 1e8
LLOYD_ITERS = 2     # IVF: integer-exact k-means refinement rounds


def ivf_nlist(n: int) -> int:
    """IVF inverted-list count scaled ~√n with the corpus (the standard
    IVF-flat sizing): 500 vecs → 22 lists, 10^6 → 1000, 10^9 → 31623.
    Round 2 fixed nlist=16, so nprobe=6 probed 37.5% of ANY corpus
    (VERDICT r02 What's-wrong #2)."""
    return max(4, int(round(n ** 0.5)))


def ivf_nprobe(nlist: int) -> int:
    """Probe nlist/8 lists → ≤12.5% of the corpus scanned per query at any
    scale; recall is bought back by the k-means-refined quantizer (lists
    follow the data's real clusters, so a query's true neighbors concentrate
    in its nearest few lists)."""
    return max(2, nlist // 8)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Float cosine — the bench/hot path (one pass, codegen-friendly)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# --- exact integer arithmetic (oracle-comparable) ----------------------------

def _int_val(x: Column) -> Column:
    return F.floor(x.cast("double") * F.lit(SCALE)).cast("long")


def _int_dot(a: Column, b: Column) -> Column:
    """Σ floor(aᵢ·1e8)·floor(bᵢ·1e8) in int64 — order-independent, exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _int_val(x) * _int_val(y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_nsq(a: Column) -> Column:
    return F.aggregate(
        a,
        F.lit(0).cast("long"),
        lambda acc, x: acc + _int_val(x) * _int_val(x),
    )


def cosine_exact(a: Column, b: Column) -> Column:
    """Cosine of the integer-scaled vectors: exact int64 dot/norms, one double
    division at the end — bit-identical in any engine (IEEE sqrt/divide are
    correctly rounded).  Pure-Column formulation (interpreted HOFs) — used
    for small pair counts and as the cross-check twin of the Arrow path."""
    return _int_dot(a, b).cast("double") / (
        F.sqrt(_int_nsq(a).cast("double")) * F.sqrt(_int_nsq(b).cast("double"))
    )


@F.pandas_udf(DoubleType())
def cosine_exact_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched twin of ``cosine_exact`` — one int64 numpy pass per
    batch instead of interpreted per-element lambdas per pair (candidate-
    heavy stages score ~100× faster).  Bit-identical: floor/scale matches
    Spark's floor(double)·cast(long), integer sums are order-independent,
    and the final double divide/sqrt are IEEE-exact in both."""
    if not len(a):
        return pd.Series([], dtype="float64")
    ia = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in a]) * SCALE
    ).astype(np.int64)
    ib = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in b]) * SCALE
    ).astype(np.int64)
    dot = (ia * ib).sum(axis=1).astype(np.float64)
    na = np.sqrt((ia * ia).sum(axis=1).astype(np.float64))
    nb = np.sqrt((ib * ib).sum(axis=1).astype(np.float64))
    return pd.Series(dot / (na * nb))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.  Queries are broadcast (a query
    set is small by definition); the corpus side streams — no shuffle until
    the per-query top-k, which TakeOrderedAndProject/window keeps bounded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec")
    ).crossJoin(F.broadcast(q))
    scored = pairs.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        cosine(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk_exact(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-comparable top-k: same plan shape as ``brute_force_topk``
    (broadcast cross join, no explode), but integer-exact arithmetic.  The
    query norm is computed from the query's own vector, so the query frame
    need not be a subset of the corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec")
    ).crossJoin(F.broadcast(q))
    scored = pairs.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        cosine_exact(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- banded sign-LSH ----------------------------------------------------------

def plane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane: parity of the first md5 nibble of
    'plane:pos' — matches the DuckDB mirror
    ``('0x' || substr(md5(plane || ':' || pos), 1, 1))::INT % 2``."""
    return [
        1 if int(hashlib.md5(f"{plane}:{pos}".encode()).hexdigest()[0], 16) % 2 == 1 else -1
        for pos in range(dim)
    ]


def probe_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """One tiny driver-side job to learn the (uniform) embedding dimension;
    the sign matrix is then inlined as literals — zero per-row hashing."""
    row = df.select(
        F.min(F.size(vec_col)).alias("lo"), F.max(F.size(vec_col)).alias("hi")
    ).first()
    if row is None or row.lo != row.hi:
        raise ValueError(f"embedding dimension not uniform: {row}")
    return int(row.hi)


def _band_buckets_col(
    vec: Column, dim: int, bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND
) -> Column:
    """array<struct<band:int, bucket:long>> — one bucket id per band.
    Projection p = Σᵢ floor(vecᵢ·1e8)·signs(p)ᵢ is exact int64; bucket bit j
    of band b is (projection(b·r+j) > 0)."""
    def proj(p: int) -> Column:
        signs = F.array(*[F.lit(s) for s in plane_signs(p, dim)])
        return F.aggregate(
            F.zip_with(vec, signs, lambda x, s: _int_val(x) * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    structs = []
    for b in range(bands):
        bucket = F.lit(0).cast("long")
        for j in range(rows_per_band):
            bucket = bucket + F.when(
                proj(b * rows_per_band + j) > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        structs.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    return F.array(*structs)


def _band_buckets_udf(dim: int, bands: int, rows_per_band: int):
    """Arrow-batched bucket computation: ONE int64 matmul per batch instead
    of bands·rows_per_band interpreted per-element lambdas per row (the
    higher-order-function path is ~30× slower — HOFs don't codegen).

    Exactness is preserved: np.floor(float64(v)·1e8)→int64 matches Spark's
    floor(double)·cast(long) bit-for-bit, and integer matmul is
    order-independent — so buckets equal ``_band_buckets_col`` and the
    DuckDB mirror exactly."""
    planes = bands * rows_per_band
    signs = np.array(
        [plane_signs(p, dim) for p in range(planes)], dtype=np.int64
    ).T  # dim × planes
    weights = np.array([1 << j for j in range(rows_per_band)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        iv = np.floor(x * SCALE).astype(np.int64)
        bits = (iv @ signs) > 0  # n × planes
        per_band = bits.reshape(len(vecs), bands, rows_per_band) @ weights
        return pd.Series(list(per_band))

    return buckets


def lsh_band_buckets(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(id, band, bucket) — exploded band buckets, ready for the bucket join.
    Buckets come from the Arrow/numpy path; ``_band_buckets_col`` is the
    pure-Column twin kept for cross-checking (tests assert equality)."""
    udf = _band_buckets_udf(dim, bands, rows_per_band)
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(udf(F.col(vec_col))).alias("band", "bucket"),
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """ANN: candidates share ≥1 of the query's band buckets; exact integer
    cosine ranks them.  The banded join replaces the cross join — candidate
    count drops ~2^r per band while recall stays 1-(1-p^r)^b."""
    dim = probe_dim(embeddings, vec_col)
    e_b = lsh_band_buckets(embeddings, dim, id_col, vec_col, bands, rows_per_band)
    q_b = lsh_band_buckets(queries, dim, id_col, vec_col, bands, rows_per_band).select(
        F.col("id").alias("query_id"), "band", "bucket"
    )
    cand = (
        e_b.join(F.broadcast(q_b), on=["band", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("vec_id"))
        .distinct()
    )
    e_vec = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        cand.join(e_vec, "vec_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_exact_arrow(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- IVF-flat (inverted-file) ANN ---------------------------------------------

def ivf_centroids(
    embeddings: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic quantizer INIT: the ``nlist`` corpus vectors with the
    smallest md5(vec_id) (a reproducible uniform sample — no RNG state,
    exactly mirrorable in SQL).  ``ivf_centroids_kmeans`` refines these."""
    return (
        embeddings.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec")
        )
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(nlist)
    )


def _ivec(vec: Column) -> Column:
    """array<long> of the integer-scaled components."""
    return F.transform(vec, _int_val)


def _floor_div_expr(s: str, c: str) -> str:
    """Portable exact floor division for Spark SQL and DuckDB: subtract the
    canonical (non-negative) mod first, so truncating and flooring integer
    division agree — robust to either engine's % / division semantics."""
    return f"({s} - ((({s} % {c}) + {c}) % {c})) DIV {c}"


def _probe_udf(cids: np.ndarray, cmat: np.ndarray, nprobe: int):
    """Arrow-batched nearest-centroid probe: ONE int64 matmul per batch
    against the (nlist × dim) centroid matrix, scored by dot/|centroid|
    (the vector's own norm is a positive per-row constant — it cannot change
    the per-vector ranking, and leaving it out keeps the SQL mirror cheap).
    Ties break to the LOWEST cid: stable argsort on the descending score with
    columns pre-ordered by cid — exactly the SQL's
    ``ORDER BY score DESC, cid ASC``."""
    # int64 norm sums (exact, order-independent), THEN one IEEE conversion —
    # matches the SQL mirror's CAST(sum(cval*cval) AS DOUBLE) bit-for-bit
    # (a float64 summation would round differently above 2^53)
    cnsq = (cmat * cmat).sum(axis=1).astype(np.float64)

    @F.pandas_udf("array<long>")
    def probe(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        iv = np.floor(x * SCALE).astype(np.int64)
        score = (iv @ cmat.T).astype(np.float64) / np.sqrt(cnsq)
        order = np.argsort(-score, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([cids[o].tolist() for o in order])

    return probe


def _partial_sums_udf(cids: np.ndarray, cmat: np.ndarray):
    """Fused Lloyd step for one partition: nearest-centroid assignment AND
    per-centroid int64 component partial sums in ONE Arrow pass, emitting at
    most ``nlist`` rows per partition — the shuffle volume is
    O(partitions × nlist × dim), INDEPENDENT of corpus size (the previous
    shape posexploded every vector into ``dim`` rows: an n×dim-row shuffle
    per Lloyd round).  int64 sums are associative, so the merged centroids —
    and the DuckDB oracle that replays the explode+groupBy form — are
    bit-identical.  Scoring/tie-breaking is exactly ``_probe_udf``'s
    (stable argsort on -dot/|centroid|, cids pre-ordered ascending)."""
    cnsq = (cmat * cmat).sum(axis=1).astype(np.float64)

    def part(batches):
        nlist, dim = cmat.shape
        acc_s = np.zeros((nlist, dim), dtype=np.int64)
        acc_c = np.zeros(nlist, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            iv = np.floor(x * SCALE).astype(np.int64)
            score = (iv @ cmat.T).astype(np.float64) / np.sqrt(cnsq)
            a = np.argsort(-score, axis=1, kind="stable")[:, 0]
            for idx in np.unique(a):
                m = a == idx
                acc_s[idx] += iv[m].sum(axis=0, dtype=np.int64)
                acc_c[idx] += int(m.sum())
        hit = acc_c > 0
        if hit.any():
            yield pd.DataFrame(
                {
                    "cid": cids[hit],
                    "s": [row.tolist() for row in acc_s[hit]],
                    "c": acc_c[hit],
                }
            )

    return part


def ivf_centroids_kmeans(
    embeddings: DataFrame,
    nlist: int,
    iters: int = LLOYD_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """K-means-refined coarse quantizer, ALL integer-exact (so the DuckDB
    oracle can replay it bit-for-bit):

      * init = md5-sampled corpus vectors (``ivf_centroids``);
      * assignment = argmax over centroids of dot/|centroid| (int64 dot,
        IEEE double divide; ties → lowest cid);
      * update = per-component FLOOR-mean of the assigned vectors' int64
        components (order-independent integer sums; empty lists keep their
        previous centroid).

    Returns (cids int64[nlist], cmat int64[nlist × dim]) ordered by cid.
    Each round is ONE fused Arrow pass (``_partial_sums_udf``) whose output
    is partitions × nlist partial rows — the per-round merge+collect ships
    only the nlist × dim matrix, tiny relative to the corpus at any scale
    (1000 × dim at 10^6 vectors); measured 6.6 s → ~1 s for 2 rounds at
    sf0.1 vs the posexplode(n×dim) shape."""
    dim = probe_dim(embeddings, vec_col)
    init = ivf_centroids(embeddings, nlist, id_col, vec_col).select(
        "cid", _ivec(F.col("c_vec")).alias("civ")
    )
    rows = sorted(init.collect(), key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cmat = np.array([r["civ"] for r in rows], dtype=np.int64)

    corpus = embeddings.select(F.col(vec_col).alias("_v"))
    for _ in range(iters):
        partials = corpus.mapInPandas(
            _partial_sums_udf(cids, cmat), schema="cid long, s array<long>, c long"
        )
        # merge partials: rows here are O(partitions × nlist), not O(n)
        sums = (
            partials.select("cid", "c", F.posexplode("s").alias("pos", "ps"))
            .groupBy("cid", "pos")
            .agg(F.sum("ps").alias("s"), F.sum("c").alias("c"))
            .withColumn("cval", F.expr(_floor_div_expr("s", "c")))
        )
        got = {}
        for r in sums.collect():
            got.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["cval"])
        new = cmat.copy()
        for i, cid in enumerate(cids):
            comp = got.get(int(cid))
            if comp is not None:  # empty lists keep the previous centroid
                new[i] = [comp[p] for p in range(dim)]
        cmat = new
    return cids, cmat


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int | None = None,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: vectors live in their nearest centroid's inverted list;
    a query probes its ``nprobe`` nearest centroids and brute-forces only
    those lists (candidate fraction ≈ nprobe/nlist ≤ 12.5% by default at ANY
    corpus size — nlist scales ~√n, the quantizer is k-means-refined).  All
    arithmetic integer-exact → full DuckDB oracle; recall and probed
    fraction reported by bench.py."""
    if nlist is None:
        nlist = ivf_nlist(embeddings.count())
    if nprobe is None:
        nprobe = ivf_nprobe(nlist)
    cids, cmat = ivf_centroids_kmeans(embeddings, nlist, LLOYD_ITERS, id_col, vec_col)
    assign_udf = _probe_udf(cids, cmat, 1)
    probe_udf = _probe_udf(cids, cmat, nprobe)
    assign = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(assign_udf(F.col(vec_col)), 1).alias("cid"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_udf(F.col(vec_col))).alias("cid"),
    )
    cand = (
        probes.join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    e_vec = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        cand.join(e_vec, "vec_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_exact_arrow(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- hamming-sketch rerank ANN --------------------------------------------------
#
# The sf embeddings are ISOTROPIC (measured: same-label mean cos 1.8e-5 vs
# diff-label 1.3e-5; top-10 neighbors at cos≈0.35 over a 0.0 bulk).  On such
# data NO space partitioning reaches high recall at a small probed fraction —
# k-means cells and LSH buckets are nearly independent of who the neighbors
# are (measured: IVF ≤0.63, banded LSH ≤0.78, at ~11% probed).  The design
# that DOES work — and the right 100 TB shape — is sketch-scan + re-rank
# (Charikar sign sketches, public literature): a 512-bit sketch is 64 bytes,
# so the full-corpus pass reads ONLY the sketch column (Parquet column
# pruning keeps the 256-byte float vectors unread), ranks by hamming with 8
# XOR+POPCNTs per pair in whole-stage codegen, and fetches floats for the top
# ``rerank_frac`` only.  Measured at sf0.1: recall@10 = 0.995 at 10%.

SKETCH_PLANES = 512  # 16 32-bit words per vector (64 bytes)
SKETCH_WORD_BITS = 32  # 32 bits/word: 1<<31 stays far from signed-64 overflow
RERANK_FRAC_PCT = 10  # % of the corpus exactly re-scored per query


def _sketch_udf(dim: int, planes: int = SKETCH_PLANES):
    """Arrow-batched sketch: ONE int64 matmul per batch against the
    deterministic md5 sign planes (same ``plane_signs`` machinery as the
    banded LSH — bit j of word w is ``projection(32w+j) > 0``), packed into
    ``planes/32`` long words of 32 bits each (a 1<<63 top bit would overflow
    signed int64 in numpy AND DuckDB — 32-bit words sidestep it).  Exact in
    SQL: the projection is an int64 sum, the bit decision a comparison, the
    packing a sum of 1<<j."""
    signs = np.array(
        [plane_signs(p, dim) for p in range(planes)], dtype=np.int64
    ).T  # dim × planes
    weights = np.array([1 << j for j in range(SKETCH_WORD_BITS)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sketch(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        iv = np.floor(x * SCALE).astype(np.int64)
        bits = (iv @ signs) > 0  # n × planes
        words = bits.reshape(len(vecs), planes // SKETCH_WORD_BITS, SKETCH_WORD_BITS) @ weights
        return pd.Series(list(words))

    return sketch


def _hamming_words(words: int) -> Column:
    """XOR+POPCNT hamming distance between the packed sketch columns ``sk``
    and ``qsk`` — ``words`` integer ops per pair, all in whole-stage codegen."""
    return sum(
        F.bit_count(F.col("sk").getItem(i).bitwiseXOR(F.col("qsk").getItem(i)))
        for i in range(words)
    )


def _topm_exact_rerank(
    scored: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    m: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared sketch-ANN tail: keep the ``m`` hamming-nearest candidates per
    query (ties → lowest vec_id), fetch float vectors for ONLY those rows,
    exact integer-cosine re-score, top-k.  ``scored`` is (query_id, vec_id,
    hamming); this is the only stage that touches the float column."""
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= m)
        .select("query_id", "vec_id")
    )
    e_vec = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    rescored = (
        cand.join(e_vec, "vec_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_exact_arrow(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def sketch_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_frac_pct: int = RERANK_FRAC_PCT,
    planes: int = SKETCH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN by hamming-sketch prefilter + exact integer-cosine re-rank: per
    query, the ``rerank_frac_pct``% of the corpus with the smallest sketch
    hamming distance (ties → lowest vec_id) is exactly re-scored; top-k of
    that.  Fully deterministic and integer/bit-exact → full DuckDB oracle.

    Plan shape: the corpus side flows once through the sketch UDF (at rest
    this column would be a precomputed index table), the tiny query sketch
    set broadcasts, hamming is 8 XOR+POPCNTs in codegen, and only candidate
    rows rejoin the float vectors."""
    n = embeddings.count()
    m = max(k, (n * rerank_frac_pct + 99) // 100)
    dim = probe_dim(embeddings, vec_col)
    udf = _sketch_udf(dim, planes)
    words = planes // SKETCH_WORD_BITS
    e_sk = embeddings.select(F.col(id_col).alias("vec_id"), udf(F.col(vec_col)).alias("sk"))
    q_sk = queries.select(F.col(id_col).alias("query_id"), udf(F.col(vec_col)).alias("qsk"))
    scored = (
        e_sk.crossJoin(F.broadcast(q_sk))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _hamming_words(words).alias("hamming"))
    )
    return _topm_exact_rerank(scored, embeddings, queries, k, m, id_col, vec_col)


def sketch_topk_from_index(
    index: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_frac_pct: int = RERANK_FRAC_PCT,
    planes: int = SKETCH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``sketch_topk`` reading its corpus sketches from a PERSISTED index
    table (build-once / query-many — plans/ann_index.py): the full-corpus
    hamming pass scans ONLY the index's (vec_id, sk) columns — at 100 TB of
    256-byte float vectors that is a 64-byte-per-row scan of a separate,
    far smaller table, and the float vectors are read exactly once, for the
    top-m rerank join (plan-gated in tests/test_ann_index.py).  Results are
    byte-identical to ``sketch_topk`` over the same corpus (equality-gated)."""
    n = index.count()
    m = max(k, (n * rerank_frac_pct + 99) // 100)
    dim = probe_dim(queries, vec_col)
    udf = _sketch_udf(dim, planes)
    words = planes // SKETCH_WORD_BITS
    q_sk = queries.select(F.col(id_col).alias("query_id"), udf(F.col(vec_col)).alias("qsk"))
    scored = (
        index.select("vec_id", "sk")
        .crossJoin(F.broadcast(q_sk))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _hamming_words(words).alias("hamming"))
    )
    return _topm_exact_rerank(scored, embeddings, queries, k, m, id_col, vec_col)


def ann_index_frame(
    embeddings: DataFrame,
    cids: np.ndarray,
    cmat: np.ndarray,
    planes: int = SKETCH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The at-rest ANN index row set — (vec_id, cid, sk) — in ONE map-only
    Arrow pass over the embeddings (nearest-list assignment + packed sign
    sketch; no shuffle).  ``ivf_sketch_topk`` builds this frame inline;
    plans/ann_index.py persists it partitioned for the build-once /
    query-many production shape.  Pass ``dim`` explicitly for a STREAMING
    input (probing it would aggregate an unbounded frame)."""
    assign_udf = _probe_udf(cids, cmat, 1)
    if dim is None:
        dim = probe_dim(embeddings, vec_col)
    sk_udf = _sketch_udf(dim, planes)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(assign_udf(F.col(vec_col)), 1).alias("cid"),
        sk_udf(F.col(vec_col)).alias("sk"),
    )


def ivf_sketch_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int | None = None,
    nprobe: int | None = None,
    rerank_frac_pct: int = RERANK_FRAC_PCT,
    planes: int = SKETCH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF→sketch→exact composition (VERDICT r03 item 8): the clustered-
    corpus scale path.

      1. probe: each query picks its ``nprobe`` nearest k-means lists —
         candidates are ONLY the probed lists' members (nprobe/nlist of the
         corpus, ≤12.5% at defaults);
      2. sketch: hamming-rank ONLY those candidates' 512-bit sketches
         (8 XOR+POPCNTs each in codegen — vs ``sketch_topk`` which scans
         every corpus sketch);
      3. exact: integer-cosine re-score only the top ``rerank_frac_pct``%
         of the probed set (~1.25% of the corpus at defaults).

    Recall inherits IVF's probe ceiling (candidates ⊆ probed lists), so this
    only makes sense where the corpus clusters — there it holds the probe
    recall at an exact-scored fraction ~8× below IVF and a sketch-scan
    volume ~8× below the flat sketch scan.  On isotropic data use
    ``sketch_topk`` (see module docstring).  At rest both the assignment
    (cid) and the sketch are precomputed index columns; the only per-query
    work is steps 2-3 over the probed slice."""
    n = embeddings.count()
    if nlist is None:
        nlist = ivf_nlist(n)
    if nprobe is None:
        nprobe = ivf_nprobe(nlist)
    cids, cmat = ivf_centroids_kmeans(embeddings, nlist, LLOYD_ITERS, id_col, vec_col)
    # corpus index side: (vec_id, cid, sketch) — at rest this is a stored
    # index table (plans/ann_index.py persists exactly this frame); the
    # float vectors stay unread until the exact rerank
    e_side = ann_index_frame(embeddings, cids, cmat, planes, id_col, vec_col)
    return _ivf_sketch_from_side(
        e_side, cids, cmat, embeddings, queries, n, k, nprobe,
        rerank_frac_pct, planes, id_col, vec_col,
    )


def ivf_sketch_topk_from_index(
    index: DataFrame,
    cids: np.ndarray,
    cmat: np.ndarray,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    rerank_frac_pct: int = RERANK_FRAC_PCT,
    planes: int = SKETCH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_sketch_topk`` with the (vec_id, cid, sk) side read from a
    PERSISTED index and the quantizer from its stored centroids
    (plans/ann_index.py ``load_ann_index``) — the per-query work is only the
    probe + the probed slice's hamming scan + the exact rerank; nothing
    corpus-sized is recomputed.  Byte-identical to ``ivf_sketch_topk`` built
    with the same centroids (equality-gated in tests/test_ann_index.py)."""
    n = index.count()
    return _ivf_sketch_from_side(
        index.select("vec_id", "cid", "sk"), cids, cmat, embeddings, queries,
        n, k, nprobe, rerank_frac_pct, planes, id_col, vec_col,
    )


def _ivf_sketch_from_side(
    e_side: DataFrame,
    cids: np.ndarray,
    cmat: np.ndarray,
    embeddings: DataFrame,
    queries: DataFrame,
    n: int,
    k: int,
    nprobe: int | None,
    rerank_frac_pct: int,
    planes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF→sketch→exact body over an inline or persisted index side."""
    nlist = len(cids)
    if nprobe is None:
        nprobe = ivf_nprobe(nlist)
    probe_udf = _probe_udf(cids, cmat, nprobe)
    dim = probe_dim(queries, vec_col)
    sk_udf = _sketch_udf(dim, planes)
    words = planes // SKETCH_WORD_BITS
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        sk_udf(F.col(vec_col)).alias("qsk"),
        F.explode(probe_udf(F.col(vec_col))).alias("cid"),
    )
    # rerank budget: rerank_frac of the EXPECTED probed-set size (n·nprobe/
    # nlist) — deterministic, so the scored fraction is a design dial, not a
    # data-dependent surprise.  Floored at 4·k: with m == k the sketch
    # ordering would need to be PERFECT (measured: recall 0.74 at m=k vs
    # 0.98 at m≈2.5k on the clustered fixture) — 4·k is the slack that lets
    # hamming misrankings wash out in the exact rerank.
    expected_probed = max(1, (n * nprobe) // nlist)
    m = max(4 * k, (expected_probed * rerank_frac_pct + 99) // 100)
    scored = (
        e_side.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _hamming_words(words).alias("hamming"))
    )
    return _topm_exact_rerank(scored, embeddings, queries, k, m, id_col, vec_col)


#: ``ann_topk`` dispatch table — public so callers can enumerate methods.
ANN_METHODS = {
    "sketch": sketch_topk,
    "ivf": ivf_topk,
    "lsh": lsh_bucketed_topk,
    "brute": brute_force_topk,
    "ivf_sketch": ivf_sketch_topk,
}


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    method: str = "sketch",
    **kwargs,
) -> DataFrame:
    """Single ANN entry point (VERDICT r03 item 2).  Default routes to
    ``sketch_topk`` — the measured winner on this corpus and the honest
    100 TB design (sketch-column-only scan, recall@10 0.995 at a 10%
    exactly-scored fraction; BASELINE.md sweep).  Opt-in methods:

      * ``ivf`` / ``lsh``    — space-partitioning paths for corpora that
        actually cluster (on isotropic data they cap at recall ~0.5-0.78;
        measured dead end — do not retune probe dials);
      * ``ivf_sketch``       — the composed sub-linear pipeline for
        clustered corpora (probe, then sketch-rank only probed lists);
      * ``brute``            — exact linear-scan baseline.

    All methods return the same (query_id, vec_id, cos_sim, rank) schema.
    """
    try:
        fn = ANN_METHODS[method]
    except KeyError:
        raise ValueError(
            f"unknown ANN method {method!r}; one of {sorted(ANN_METHODS)}"
        ) from None
    return fn(embeddings, queries, k=k, **kwargs)


def sketch_near_dup_max_hamming(
    threshold: float, planes: int = SKETCH_PLANES
) -> int:
    """Hamming cutoff for sketch-candidate near-dup generation: the MIDPOINT
    between the expected sketch hamming of a pair exactly AT the cosine
    threshold (planes·acos(t)/π — the hyperplane collision probability) and
    the isotropic-bulk mean (planes/2).  No tuned constants: for t=0.45 and
    512 planes this is 217, sitting >2σ above every measured true pair
    (max 194 at sf0.01) while admitting ~5% of the bulk (vs the banded-LSH
    candidate fraction of ~40% this replaced — VERDICT r04 item 4).  The
    same integer is baked into the DuckDB oracle, so the cutoff can never
    drift between engines."""
    import math

    f = math.acos(threshold) / math.pi
    return int(planes * (f + 0.5) / 2)


def _verify_pairs_exact(
    cand: DataFrame,
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared near-dup tail: fetch float vectors for CANDIDATE rows only,
    exact integer-cosine score, keep pairs ≥ threshold."""
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_exact_arrow(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def near_dup_blocks(parallelism: int) -> int:
    """Block count for the cogrouped pair pass: the smallest B whose
    B(B+1)/2 equal-sized block-pair groups are ≥ 8× the session parallelism,
    so the groups pack evenly over the cores (hash placement of G groups
    into the partitions leaves a max-loaded partition ~2× the mean once
    G/partitions ≥ 4 — the balls-in-bins tail).  Scale-adaptive, never a
    constant tuned to one box; the pair SET is provably invariant to B
    (tests/test_similarity.py)."""
    b = 2
    while b * (b + 1) // 2 < 8 * max(parallelism, 1):
        b += 1
    return b


def _near_dup_pairs_grouped_arrow(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    blocks: int | None,
    planes: int,
    max_hamming: int,
) -> DataFrame:
    """Block-pair near-dup in ONE cogrouped Arrow pass (guide §4.2/§8): the
    shuffle moves each (id, vec) row B times (~0.5 KB·n·B total) and ALL
    pair work — sketching, the n²/2 hamming evaluations, the exact integer
    cosine verify — happens in numpy inside ``applyInPandas``, so no pair
    row is ever materialized in the JVM and no candidate pair ever crosses
    the Python boundary (the r05 join twin materialized every pair in the
    SMJ and shipped ~5% of n²/2 candidate rows with BOTH float vectors
    through Arrow for the verify — measured 74.7 s at n=20k vs 4-6 s for
    this pass, OPTIMIZATION_r06.md).

    Hamming via GEMM: h(a,b) = |a| + |b| − 2·(bits_a · bits_b) with the
    512 sketch bits unpacked to float32 — dot products ≤ 512 are exact in
    float32, so the cutoff comparison is integer-exact, identical to the
    XOR+POPCNT twin (equality-gated in tests/test_similarity.py).  The
    exact verify reuses the ``cosine_exact_arrow`` arithmetic verbatim:
    int64 floor-scaled dot/norms, one IEEE double divide.

    Each row lands in block ``xxhash64(id) % B``; the lo side is replicated
    to block-pairs (b, b..B-1), the hi side to (0..b, b) — every unordered
    pair meets in exactly one group (same enumeration as the join twin).
    An explicit ``repartition(n, pk)`` pins the exchange width: without it
    AQE coalesces the small-byte/huge-compute shuffle to ~2 partitions
    (64 MB advisory) and the pair pass runs nearly serial — the single
    biggest contributor to the r05 sf1 regression."""
    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    if blocks is None:
        blocks = near_dup_blocks(par)
    npart = max(2 * par, 8)
    dim = probe_dim(embeddings, vec_col)
    signs = np.array(
        [plane_signs(p, dim) for p in range(planes)], dtype=np.int64
    ).T  # dim × planes
    B, mh, thr = int(blocks), int(max_hamming), float(threshold)
    id_dt = embeddings.schema[id_col].dataType.simpleString()

    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("blk"),
    )
    lo = base.select(
        "id",
        "vec",
        F.explode(
            F.transform(
                F.sequence(F.col("blk"), F.lit(B - 1)),
                lambda j: F.col("blk") * B + j,
            )
        ).alias("pk"),
    ).repartition(npart, "pk")
    hi = base.select(
        "id",
        "vec",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("blk")),
                lambda i: i * B + F.col("blk"),
            )
        ).alias("pk"),
    ).repartition(npart, "pk")

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )

    def pairs_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return _empty()
        pk = int(key[0])
        same_block = (pk // B) == (pk % B)
        ida = left["id"].to_numpy()
        idb = right["id"].to_numpy()
        iva = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in left["vec"]]) * SCALE
        ).astype(np.int64)
        ivb = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in right["vec"]]) * SCALE
        ).astype(np.int64)
        ba = ((iva @ signs) > 0).astype(np.float32)
        bb = ((ivb @ signs) > 0).astype(np.float32)
        ca = ba.sum(axis=1)
        cb = bb.sum(axis=1)
        na = np.sqrt((iva * iva).sum(axis=1).astype(np.float64))
        nb = np.sqrt((ivb * ivb).sum(axis=1).astype(np.float64))
        out_a, out_b, out_c = [], [], []
        # chunk the lo rows so the (chunk × nb) hamming plane stays ~32 MB
        step = max(1, 4_000_000 // max(len(idb), 1))
        for s in range(0, len(ida), step):
            e = s + step
            h = ca[s:e, None] + cb[None, :] - 2.0 * (ba[s:e] @ bb.T)
            m = h <= mh
            if same_block:
                m &= ida[s:e, None] < idb[None, :]
            ii, jj = np.nonzero(m)
            # sub-chunk the verify gather so the (pairs × dim) int64
            # temporaries stay bounded on candidate-dense groups
            for v0 in range(0, len(ii), 1 << 16):
                vi = ii[v0 : v0 + (1 << 16)]
                vj = jj[v0 : v0 + (1 << 16)]
                dot = (iva[s + vi] * ivb[vj]).sum(axis=1).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dot / (na[s + vi] * nb[vj])
                # Spark/DuckDB order NaN above every value, so a NaN cosine
                # (zero-norm vector) passes the >= filter in both engines
                keep = (cos >= thr) | np.isnan(cos)
                if keep.any():
                    pa = ida[s + vi[keep]]
                    pb = idb[vj[keep]]
                    flip = pb < pa
                    out_a.append(np.where(flip, pb, pa))
                    out_b.append(np.where(flip, pa, pb))
                    out_c.append(cos[keep])
        if not out_a:
            return _empty()
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    # No terminal orderBy: the driver canonicalizes (rows sorted) before
    # hashing, and a range sort here SAMPLES its child — re-executing the
    # whole GEMM pair pass a second time (guide §2.4; measured ~2× at n=20k,
    # OPTIMIZATION_r06.md).
    return (
        lo.groupBy("pk")
        .cogroup(hi.groupBy("pk"))
        .applyInPandas(pairs_fn, f"id_a {id_dt}, id_b {id_dt}, cos_sim double")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "sketch",
    blocks: int | None = None,
    planes: int = SKETCH_PLANES,
    max_hamming: int | None = None,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    impl: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sketch-hamming candidates
    (default) or banded-LSH candidates, exact integer cosine verify.

    ``method="sketch"`` (VERDICT r04 item 4): candidates are pairs whose
    512-bit sign-sketch hamming distance ≤ ``max_hamming`` (derived from the
    cosine threshold by ``sketch_near_dup_max_hamming`` unless given).
    ``impl`` picks the execution of the SAME pair definition:

      * ``"arrow"`` (default, r06): one cogrouped numpy pass over block-pair
        groups — sketching, hamming (GEMM) and the exact verify all happen
        in-place; no pair row is materialized JVM-side and no candidate
        crosses the Python boundary.  See ``_near_dup_pairs_grouped_arrow``.
        ``blocks=None`` derives the block count from the session parallelism
        (``near_dup_blocks``).
      * ``"join"`` — the r05 twin kept for cross-checking: BLOCK-PAIR
        equi-join in whole-stage codegen (n·B sketch rows of ~72 B through
        the shuffle, n²/2 XOR+POPCNT ops over B(B+1)/2 join groups), then
        float vectors re-joined for candidates only.  Equality-gated to the
        arrow path in tests/test_similarity.py.

    ``method="lsh"`` keeps the banded-LSH candidate generator as a second
    cross-checking twin (b=8/r=4 → ~40% candidate fraction on isotropic
    data; candidates bounded by bucket population per band)."""
    if method == "lsh":
        dim = probe_dim(embeddings, vec_col)
        bb = lsh_band_buckets(embeddings, dim, id_col, vec_col, bands, rows_per_band)
        a = bb.select(F.col("id").alias("id_a"), "band", "bucket")
        b = bb.select(F.col("id").alias("id_b"), "band", "bucket")
        cand = (
            a.join(b, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return _verify_pairs_exact(cand, embeddings, threshold, id_col, vec_col)
    if method != "sketch":
        raise ValueError(f"unknown near-dup method {method!r}; 'sketch' or 'lsh'")
    if max_hamming is None:
        max_hamming = sketch_near_dup_max_hamming(threshold, planes)
    if impl == "arrow":
        return _near_dup_pairs_grouped_arrow(
            embeddings, threshold, id_col, vec_col, blocks, planes, max_hamming
        )
    if impl != "join":
        raise ValueError(f"unknown near-dup impl {impl!r}; 'arrow' or 'join'")
    cand = sketch_near_dup_candidates(
        embeddings, threshold, id_col, vec_col, blocks or 8, planes, max_hamming
    )
    return _verify_pairs_exact(cand, embeddings, threshold, id_col, vec_col)


def sketch_near_dup_candidates(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int = 8,
    planes: int = SKETCH_PLANES,
    max_hamming: int | None = None,
) -> DataFrame:
    """The sketch-hamming candidate pairs (id_a, id_b) that
    ``cosine_near_dup_pairs`` exactly verifies — public so the growth study
    can count the verify bill from the executed join."""
    if max_hamming is None:
        max_hamming = sketch_near_dup_max_hamming(threshold, planes)
    dim = probe_dim(embeddings, vec_col)
    udf = _sketch_udf(dim, planes)
    words = planes // SKETCH_WORD_BITS
    sk = embeddings.select(
        F.col(id_col).alias("id"),
        udf(F.col(vec_col)).alias("sk"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("blk"),
    )
    # lo side owns block-pairs (blk, j) for j ≥ blk; hi side (i, blk) for
    # i ≤ blk — an unordered pair of rows in blocks (p, q), p ≤ q, meets in
    # exactly one join group: pk = p·B + q.
    lo = sk.select(
        F.col("id").alias("id_a"),
        F.col("sk").alias("sk_a"),
        F.col("blk").alias("blk_a"),
        F.explode(
            F.transform(
                F.sequence(F.col("blk"), F.lit(blocks - 1)),
                lambda j: F.col("blk") * blocks + j,
            )
        ).alias("pk"),
    )
    hi = sk.select(
        F.col("id").alias("id_b"),
        F.col("sk").alias("sk_b"),
        F.col("blk").alias("blk_b"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("blk")),
                lambda i: i * blocks + F.col("blk"),
            )
        ).alias("pk"),
    )
    hamming = sum(
        F.bit_count(F.col("sk_a").getItem(i).bitwiseXOR(F.col("sk_b").getItem(i)))
        for i in range(words)
    )
    return (
        lo.join(hi, "pk")
        # same-block group (pk = (b,b)) holds every ordered pair — halve it;
        # cross-block groups already see each unordered pair exactly once
        .filter((F.col("blk_a") != F.col("blk_b")) | (F.col("id_a") < F.col("id_b")))
        .filter(hamming <= F.lit(max_hamming))
        # cross-block pairs carry block order, not id order — normalize
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
