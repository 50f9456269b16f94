"""End-to-end corpus curation: the composed training-data pipeline a 100 TB
pretraining job runs — exact dedup → quality gate → language gate — as one
DataFrame chain (each stage is an operator from dedup.py / text.py; the
composition shuffles once for the dedup grouping and once for the final
window, everything else is codegen'd filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import language_id, quality_scores


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    keep_langs: tuple = ("en",),
) -> DataFrame:
    """(doc_id, text, …) → surviving docs with their curation signals.

    Keep a document iff it is (a) the canonical (min doc_id) copy of its
    exact-content group, (b) passes the quality gate, (c) language-IDs into
    ``keep_langs``."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    canonical = df.withColumn("_canon", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("_canon")
    ).drop("_canon")

    quality = quality_scores(canonical, text_col).filter(F.col("quality_ok"))
    lang = language_id(canonical, text_col).filter(F.col("lang_pred").isin(*keep_langs))

    return (
        canonical.select("doc_id")
        .join(quality.select("doc_id", "n_words"), "doc_id")
        .join(lang.select("doc_id", "lang_pred"), "doc_id")
        .orderBy("doc_id")
    )
