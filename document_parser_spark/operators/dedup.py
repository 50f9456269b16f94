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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_shingles, words

DEFAULT_BANDS = 8
SIMHASH_BITS = 16


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
        .orderBy("text_md5")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", num_bands: int = DEFAULT_BANDS, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, band, sig): per band, the lexicographic min of
    md5(band || ':' || shingle) over the doc's word shingles — a string-min
    MinHash that is bit-identical in any engine with md5.  Docs with no
    shingles produce no signatures."""
    sh = word_shingles(F.col(text_col), shingle_k)
    exploded = df.select("doc_id", F.explode(sh).alias("shingle"))
    bands = exploded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_bands - 1))).alias("band"),
        "shingle",
    )
    return bands.groupBy("doc_id", "band").agg(
        F.min(
            F.md5(F.concat_ws(":", F.col("band").cast("string"), F.col("shingle")))
        ).alias("sig")
    )


def minhash_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing ANY band signature → near-dup candidate pair
    (doc_a < doc_b, distinct).  The join key is (band, sig) — bucket join,
    never all-pairs."""
    left = signatures.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    right = signatures.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        left.join(right, on=["band", "sig"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _word_hash16(word: Column) -> Column:
    """First 16 bits of md5 as a long — same in DuckDB via
    ``('0x' || substr(md5(w),1,4))::BIGINT``."""
    return F.conv(F.substring(F.md5(word), 1, 4), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Frequency-weighted SimHash over word hashes: bit i of the fingerprint
    is 1 iff the count-weighted ±1 sum over words at bit i is positive.
    Everything is integer arithmetic → exact SQL oracle."""
    word_counts = (
        df.select("doc_id", F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", _word_hash16(F.col("w")))
    )
    per_bit = (
        word_counts.select(
            "doc_id",
            "cnt",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                # shiftright() needs a literal shift; a column shift is SQL-only.
                F.when(F.expr("shiftright(h, bit) & 1") == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias("s")
        )
    )
    return (
        per_bit.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 2, bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, found via the
    bit-mask-bucket trick (split the fingerprint into k+1 chunks; any pair
    within distance k agrees on ≥1 chunk → bucket join, never all-pairs)."""
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
    cand = (
        a.join(b, on=["chunk", "chunk_val"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    block_cols: tuple = ("lang", "source"),
    threshold_pct: int = 80,
) -> DataFrame:
    """Blocked n-gram (distinct-word) Jaccard: candidate pairs share a block
    key; similarity is exact integer set arithmetic:
    ``jaccard ≥ t/100  ⇔  100·|A∩B| ≥ t·|A∪B|``."""
    dw = df.select("doc_id", *block_cols, F.explode(words(F.col(text_col))).alias("w")).distinct()
    sizes = dw.groupBy("doc_id").agg(F.count("*").alias("n_words"))

    a = dw.select(F.col("doc_id").alias("doc_a"), *block_cols, "w")
    b = dw.select(F.col("doc_id").alias("doc_b"), *block_cols, "w")
    inter = (
        a.join(b, on=[*block_cols, "w"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
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
