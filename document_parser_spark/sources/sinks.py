"""Sinks K1–K7 (SURVEY.md §2.2) re-expressed Spark-first.

Engine-side sinks write DataFrames (distributed, partitioned); the two
rich-document exporters (DOCX/PDF) are EDGE-side by design — the reference
renders one table per file on one machine (convert_table.py,
convert_table_pdf.py), so the engine's job is to deliver a per-table pandas
frame plus styled runs / merge spans, not to distribute reportlab.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TABLE


def write_tables_json(tables: DataFrame, path: str) -> None:
    """K1: structured tables → JSON lines (the reference's
    all_tables_output.json, use_marker_converter.py:704-708, but partitioned
    and appendable)."""
    tables.write.mode("overwrite").json(path)


def read_tables_json(spark: SparkSession, path: str) -> DataFrame:
    """S6: the query engine's JSON input (table_search.py:530-532) with the
    declared schema — no inference."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType(), False)]
        + [
            # tables_output flattens TABLE with index→table_index
            T.StructField("table_index" if f.name == "index" else f.name, f.dataType, True)
            for f in TABLE.fields
        ]
    )
    return spark.read.schema(schema).json(path)


def write_cells_csv(cells: DataFrame, path: str) -> None:
    """K2: the flat cell index as CSV, partitioned by doc so one document's
    tables land together (main.py:324-327 writes one CSV per table; at
    corpus scale per-file-per-table is pathological — partition dirs give
    the same addressability)."""
    (
        cells.withColumn("header_levels", F.to_json("header_levels"))
        .write.mode("overwrite")
        .partitionBy("doc_id")
        .option("header", True)
        .csv(path)
    )


def html_table_column(tables: DataFrame) -> DataFrame:
    """K3: an HTML rendering column built with pure string expressions
    (main.py:329-333 uses docling's export; here it's engine-native)."""
    row_html = F.array_join(
        F.transform(
            F.col("cells"),
            lambda c: F.concat(F.lit("<td>"), F.coalesce(c.text, F.lit("")), F.lit("</td>")),
        ),
        "",
    )
    return tables.withColumn(
        "html",
        F.concat(
            F.lit("<table><caption>"),
            F.coalesce(F.col("title"), F.lit("")),
            F.lit("</caption><tr>"),
            row_html,
            F.lit("</tr></table>"),
        ),
    )


def write_markdown(parsed: DataFrame, path: str) -> None:
    """K4: the normalized markdown per document — reassembled from the span
    stream (use_marker_converter.py:711-717 writes rendered markdown; the
    span stream is our canonical form, so the sink is a projection)."""
    md = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s.kind != F.lit("media")),
            lambda s: s.text,
        ),
        "\n",
    )
    parsed.select("doc_id", md.alias("markdown")).write.mode("overwrite").json(path)


def write_media(media: DataFrame, path: str) -> None:
    """K5: the media side-table (doc_id, media_ref, bytes) as parquet —
    binary-safe, partition-pruned by doc bucket
    (use_marker_converter.py:613-623 writes loose files)."""
    media.write.mode("overwrite").parquet(path)


def to_pandas_tables(tables: DataFrame, doc_id: str):
    """K6/K7 edge feed + A5: one pandas DataFrame per table of one document
    (the reference's tables_to_dataframes_from_markdown, main.py:160-179).
    Collects ONE document — the only intentional driver-side materialization
    in the engine."""
    import pandas as pd

    out = []
    rows = (
        tables.filter(F.col("doc_id") == doc_id)
        .orderBy("table_index")
        .collect()
    )
    for t in rows:
        headers = list(t["headers"])
        grid: dict = {}
        for c in t["cells"]:
            grid.setdefault(c["row"], {h: "" for h in headers})
            if c["col"] < len(headers):
                grid[c["row"]][headers[c["col"]]] = c["text"]
        frame = pd.DataFrame([grid[r] for r in sorted(grid)], columns=headers)
        out.append({"index": t["table_index"], "title": t["title"], "df": frame})
    return out
