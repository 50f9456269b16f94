"""The extraction pipeline: interleaved documents → parsed spans + tables.

Spark-first design (SURVEY.md §3.1 "Spark shape"):

    documents(doc_id, spans)                      -- input_hint shape
      │  assemble_document_text()                 -- native exprs only
      ▼
    (doc_id, text, n_chars, media_refs)
      │  salted_repartition()                     -- plans/partitioning.py
      ▼
    withColumn("parsed", PARSE_RESULT struct)     -- ONE iterator pandas UDF
      ▼
    spans_table / tables_table / cells_table      -- native explode/select

The single Arrow UDF wraps the pure kernel (document_parser_spark.kernel),
so distributed output is span-sequence-equal to the golden oracle by
construction.  Everything before and after the UDF is whole-stage-codegen'd
Column algebra; the UDF is kept last-before-write per SURVEY.md §4.3 so
Catalyst can prune/push around it.

Reference lifecycle being re-expressed: use_marker_converter.py:600-648.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel import parse_document
from ..schemas import PARSE_RESULT


def assemble_document_text(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Concatenate the raw ``text`` spans in offset order into one markdown
    string per document; keep sidecar media refs.  Pure Column algebra —
    no Python executes per row."""
    spans = F.col(spans_col)
    text_spans = F.array_sort(
        F.filter(spans, lambda s: s.kind == F.lit("text")),
        lambda a, b: F.when(a.offset < b.offset, -1).when(a.offset > b.offset, 1).otherwise(0),
    )
    media_spans = F.filter(spans, lambda s: s.kind == F.lit("media"))
    return df.select(
        "doc_id",
        F.array_join(F.transform(text_spans, lambda s: s.text), "\n").alias("text"),
        F.transform(media_spans, lambda s: s.media_ref).alias("media_refs"),
    ).withColumn("n_chars", F.length("text"))


@F.pandas_udf(PARSE_RESULT)
def parse_document_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """text → {spans, tables, error}; iterator form amortizes setup across
    Arrow batches (a struct result is one pandas DataFrame per batch, one
    column per field).  Errors are captured per document, never thrown
    (north_rule lineage; SURVEY.md §4.3)."""
    for texts in batches:
        spans_col, tables_col, error_col = [], [], []
        for text in texts:
            try:
                parsed = parse_document(text if text is not None else "")
                spans_col.append(parsed["spans"])
                tables_col.append(parsed["tables"])
                error_col.append(None)
            except Exception as exc:  # pragma: no cover - defensive
                message = f"{type(exc).__name__}: {exc}"
                spans_col.append(
                    [{"kind": "error", "text": message, "media_ref": None, "offset": 0}]
                )
                tables_col.append([])
                error_col.append(message)
        yield pd.DataFrame({"spans": spans_col, "tables": tables_col, "error": error_col})


def parse_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the parsed struct.  Input: (doc_id, text, …); output adds
    ``spans``, ``tables``, ``error`` columns."""
    parsed = df.withColumn("_parsed", parse_document_udf(F.col(text_col)))
    return parsed.select(
        *[c for c in df.columns if c not in ("spans", "tables", "error")],
        F.col("_parsed.spans").alias("spans"),
        F.col("_parsed.tables").alias("tables"),
        F.col("_parsed.error").alias("error"),
    )


def spans_output(parsed: DataFrame) -> DataFrame:
    """The document_spans output table (doc_id, spans) — the north-rule
    correctness surface."""
    return parsed.select("doc_id", "spans")


def tables_output(parsed: DataFrame) -> DataFrame:
    """One row per (doc_id, table): the structured-table side table."""
    t = parsed.select("doc_id", F.explode("tables").alias("t"))
    return t.select(
        "doc_id",
        F.col("t.index").alias("table_index"),
        F.col("t.source").alias("source"),
        F.col("t.title").alias("title"),
        F.col("t.table_type").alias("table_type"),
        F.col("t.num_columns").alias("num_columns"),
        F.col("t.num_rows").alias("num_rows"),
        F.col("t.header_row_count").alias("header_row_count"),
        F.col("t.headers").alias("headers"),
        F.col("t.column_headers").alias("column_headers"),
        F.col("t.column_groups").alias("column_groups"),
        F.col("t.header_cells").alias("header_cells"),
        F.col("t.cells").alias("cells"),
        F.col("t.line_start").alias("line_start"),
        F.col("t.line_end").alias("line_end"),
    )


def cells_output(tables: DataFrame) -> DataFrame:
    """The denormalized cell index — the reference's ``_build_index``
    (table_search.py:51-98) as one explode+project; table metadata is
    denormalized into every cell exactly as the reference does, which
    removes its per-cell header lookup join (J3 anti-pattern,
    SURVEY.md §4.1)."""
    c = tables.select(
        "doc_id",
        "table_index",
        F.col("source").alias("table_source"),
        F.col("title").alias("table_title"),
        "table_type",
        F.explode("cells").alias("c"),
    )
    return c.select(
        "doc_id",
        "table_index",
        "table_source",
        "table_title",
        "table_type",
        F.col("c.row").alias("row"),
        F.col("c.col").alias("col"),
        F.col("c.header").alias("header"),
        F.col("c.header_levels").alias("header_levels"),
        F.col("c.text").alias("text"),
        F.col("c.is_numeric").alias("is_numeric"),
    )


def media_refs_output(df_input: DataFrame) -> DataFrame:
    """Side table (doc_id, media_ref) from the raw stream — J4's join key
    (use_marker_converter.py:614-623)."""
    return df_input.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter("spans", lambda s: s.kind == F.lit("media")),
                lambda s: s.media_ref,
            )
        ).alias("media_ref"),
    )


def resolve_media(spans_df: DataFrame, media_df: DataFrame) -> DataFrame:
    """J4: re-thread media bytes/metadata onto media spans by
    (doc_id, media_ref) left join; broadcast when the media side is small.
    Parity: use_marker_converter.py:614-623."""
    exploded = spans_df.select("doc_id", F.explode("spans").alias("span"))
    return exploded.join(
        media_df,
        on=[
            exploded.doc_id == media_df.doc_id,
            exploded.span.media_ref == media_df.media_ref,
        ],
        how="left",
    ).select(exploded.doc_id, "span", *[c for c in media_df.columns if c not in ("doc_id", "media_ref")])
