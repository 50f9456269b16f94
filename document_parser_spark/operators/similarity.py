"""Similarity search over an embedding column (array<float>).

Two paths:
  * ``brute_force_topk``      — the performance baseline: native
    ``F.zip_with`` dot product in double precision, whole-stage codegen,
    TakeOrderedAndProject per query.  This is the path bench.py measures.
  * ``brute_force_topk_exact`` — the oracle-comparable twin: the dot product
    is accumulated in DECIMAL via posexplode+join, which is bit-identical to
    the DuckDB SQL oracle (float sums are order-dependent; decimal sums are
    exact, so cross-engine comparison is sound).
  * ``lsh_bucketed_topk``     — the scale path: deterministic sign-random
    hyperplanes (md5-seeded ±1 components) bucket vectors; per-bucket
    brute force; probing the query's bucket only.  Recall<1 by design.

Embedding near-dup for the dedup family: ``cosine_near_dup_pairs`` —
LSH-bucketed candidate pairs + exact cosine filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


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
        .orderBy("query_id", "rank")
    )


def brute_force_topk_exact(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-comparable top-k: components are scaled to exact integers
    (``floor(val * 1e8)`` — float→double promotion and floor round
    identically in every engine; float→decimal casts do NOT), dot/norm
    accumulate in int64, and only the final cosine divides in double —
    bit-identical to the DuckDB mirror.  Bound: |val| ≤ 90 keeps
    64·(9e9)² < 2^63."""
    def expand(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{name}_id"),
            F.posexplode(vec_col).alias("pos", "val"),
        ).select(
            f"{name}_id",
            "pos",
            F.floor(F.col("val").cast("double") * F.lit(1e8)).alias(f"{name}_val"),
        )

    ev = expand(embeddings, "vec")
    qv = expand(queries, "query")
    dots = (
        ev.join(qv, on="pos")
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("vec_val") * F.col("query_val")).alias("dot"))
    )
    norms = (
        ev.groupBy("vec_id").agg(F.sum(F.col("vec_val") * F.col("vec_val")).alias("nsq"))
    )
    qnorms = norms.select(
        F.col("vec_id").alias("query_id"), F.col("nsq").alias("q_nsq")
    )
    scored = (
        dots.filter(F.col("vec_id") != F.col("query_id"))
        .join(norms, "vec_id")
        .join(qnorms, "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nsq").cast("double")) * F.sqrt(F.col("q_nsq").cast("double")))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _plane_sign(plane: int, pos: Column) -> Column:
    """Deterministic ±1 hyperplane component: parity of the first md5 nibble
    of 'plane:pos' — reproducible anywhere, no RNG state."""
    nibble = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(plane)), pos.cast("string"))), 1, 1),
        16,
        10,
    ).cast("int")
    return F.when(nibble % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec_col: Column, planes: int = PLANES) -> Column:
    """Sign-LSH bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.size(vec_col) - 1), lambda i: _plane_sign(p, i)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe only the query's LSH bucket, brute-force inside it.  The
    bucket join replaces the cross join — candidate count drops ~2^planes×."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("q_vec"), F.col("v_vec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-LSH-bucket candidates,
    exact cosine verify.  Never all-pairs."""
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
