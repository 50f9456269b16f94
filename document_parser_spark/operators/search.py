"""The table-query surface Q1–Q7 (SURVEY.md §2.12) as pure DataFrame algebra
over the denormalized cells table — no UDFs anywhere.

Reference: /root/reference/table_search.py.  The reference's full-scan +
nested-rescan shape (O(matches × cells), table_search.py:222-228, 363-367)
becomes hash joins here; its ``seen_rows`` dedup becomes dropDuplicates;
its sort-then-slice becomes TakeOrderedAndProject (SURVEY.md §4.1).

Every function takes the cells/tables DataFrames produced by
operators.extract — callers should ``.cache()`` them once per session, which
is the Spark twin of the reference's ``_build_index`` (table_search.py:51-98).

All results carry ``doc_id``: the reference is single-document, the engine is
corpus-wide; within one doc the semantics match the reference exactly
(golden tests in tests/test_search_spark.py exec the reference engine as the
oracle)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import match_score, title_filter
from ..kernel import SearchMode

#: Stable result ordering: corpus extension of table_search.py:445 /
#: cell-index insertion order.
_POSITION = ("doc_id", "table_index", "row", "col")


def search_by_key_value(
    cells: DataFrame,
    key_query: str,
    table_title: Optional[str] = None,
    mode: SearchMode = SearchMode.CONTAINS,
    case_sensitive: bool = False,
) -> DataFrame:
    """Q2: match keys in col 0 of VERTICAL tables, emit each same-row value
    cell with {key, key_column, value_column} context.

    Parity: table_search.py:173-252.  The nested per-match rescan becomes one
    equi self-join on (doc_id, table_index, row); the matched-key side is
    small after filtering, so Catalyst/AQE picks broadcast-hash."""
    matched, score = match_score(F.col("text"), key_query, mode, case_sensitive)
    keys = (
        cells.filter(F.col("table_type") == "vertical")
        .filter(title_filter(F.col("table_title"), table_title))
        .filter(F.col("col") == 0)
        .filter(matched)
        .select(
            "doc_id",
            "table_index",
            "row",
            F.col("text").alias("key"),
            F.col("header").alias("key_column"),
            score.alias("match_score"),
        )
    )
    values = cells.filter(F.col("col") > 0).select(
        "doc_id", "table_index", "table_source", "table_title", "table_type",
        "row", "col", "header", "header_levels", F.col("text").alias("cell_text"),
    )
    return (
        F.broadcast(keys)
        .join(values, on=["doc_id", "table_index", "row"], how="inner")
        .select(
            "doc_id", "table_index", "table_source", "table_title",
            F.lit("vertical").alias("table_type"),
            "row", "col", "header", "header_levels", "cell_text",
            "match_score",
            F.lit("key_value").alias("match_type"),
            F.struct("key", "key_column", F.col("header").alias("value_column")).alias("context"),
        )
        .orderBy(*_POSITION)
    )


def _column_match(column_name: str):
    """F6: header equality OR name ∈ header_levels OR case-insensitive
    substring against any level.  Parity: table_search.py:286-296."""
    lowered = column_name.lower()
    return (
        (F.col("header") == column_name)
        | F.exists("header_levels", lambda lvl: lvl == F.lit(column_name))
        | F.exists("header_levels", lambda lvl: F.lower(lvl).contains(lowered))
    )


def search_by_column(
    cells: DataFrame,
    column_name: str,
    value_query: Optional[str] = None,
    table_title: Optional[str] = None,
    mode: SearchMode = SearchMode.CONTAINS,
    case_sensitive: bool = False,
) -> DataFrame:
    """Q3: values of a named column in HORIZONTAL tables, optionally filtered
    by a value match.  Parity: table_search.py:254-323."""
    out = (
        cells.filter(F.col("table_type") == "horizontal")
        .filter(title_filter(F.col("table_title"), table_title))
        .filter(_column_match(column_name))
    )
    if value_query is not None:
        matched, score = match_score(F.col("text"), value_query, mode, case_sensitive)
        out = out.filter(matched).withColumn("match_score", score)
    else:
        out = out.withColumn("match_score", F.lit(1.0))
    return out.select(
        "doc_id", "table_index", "table_source", "table_title", "table_type",
        "row", "col", "header", "header_levels",
        F.col("text").alias("cell_text"), "match_score",
        F.lit("column_search").alias("match_type"),
    ).orderBy(*_POSITION)


def get_row_by_column_value(
    cells: DataFrame,
    column_name: str,
    value_query: str,
    table_title: Optional[str] = None,
    mode: SearchMode = SearchMode.CONTAINS,
    case_sensitive: bool = False,
) -> DataFrame:
    """Q4: Q3, deduped to one hit per row (first matching cell by col order —
    the reference's ``seen_rows`` insertion semantics), then the whole row
    assembled as an ordered header→text map.

    Parity: table_search.py:325-388.  dedup = row_number window; row fetch =
    semi-join back to cells; assembly = map_from_entries(sort by col)."""
    hits = search_by_column(cells, column_name, value_query, table_title, mode, case_sensitive)
    first_per_row = Window.partitionBy("doc_id", "table_index", "row").orderBy("col")
    matched_rows = (
        hits.withColumn("_rn", F.row_number().over(first_per_row))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id", "table_index", "table_title", "table_type", "row",
            F.col("header").alias("matched_column"),
            F.col("cell_text").alias("matched_value"),
            "match_score",
        )
    )
    # Semi-join FIRST so only matched rows are ever aggregated (the reference
    # rescans all cells per match, table_search.py:363-367 — J2 anti-pattern).
    row_keys = matched_rows.select("doc_id", "table_index", "row")
    row_maps = (
        cells.join(F.broadcast(row_keys), on=["doc_id", "table_index", "row"], how="left_semi")
        .groupBy("doc_id", "table_index", "row")
        .agg(
            F.map_from_entries(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("col", "header", "text"))),
                    lambda s: F.struct(s.header.alias("key"), s.text.alias("value")),
                )
            ).alias("row_data")
        )
    )
    return (
        F.broadcast(matched_rows)
        .join(row_maps, on=["doc_id", "table_index", "row"], how="inner")
        .orderBy(*("doc_id", "table_index", "row"))
    )


def search_anywhere(
    cells: DataFrame,
    query: str,
    table_title: Optional[str] = None,
    table_type: Optional[str] = None,
    mode: SearchMode = SearchMode.CONTAINS,
    case_sensitive: bool = False,
    max_results: Optional[int] = None,
) -> DataFrame:
    """Q5: full cell scan, score sort, top-k.  Parity: table_search.py:390-450
    (the full-sort-then-slice upgrades to TakeOrderedAndProject for free)."""
    matched, score = match_score(F.col("text"), query, mode, case_sensitive)
    out = cells.filter(title_filter(F.col("table_title"), table_title))
    if table_type is not None:
        out = out.filter(F.col("table_type") == table_type)
    out = (
        out.filter(matched)
        .select(
            "doc_id", "table_index", "table_source", "table_title", "table_type",
            "row", "col", "header", "header_levels",
            F.col("text").alias("cell_text"),
            score.alias("match_score"),
            F.lit("cell").alias("match_type"),
        )
        .orderBy(F.desc("match_score"), *_POSITION)
    )
    if max_results:
        out = out.limit(max_results)
    return out


def list_all_tables(tables: DataFrame) -> DataFrame:
    """Q6/F9: metadata projection with the "RxC" size string.
    Parity: table_search.py:452-463."""
    return tables.select(
        "doc_id",
        F.col("table_index").alias("index"),
        F.col("title"),
        F.col("table_type").alias("type"),
        F.col("source"),
        F.format_string("%dx%d", "num_rows", "num_columns").alias("size"),
    ).orderBy("doc_id", "index")


def get_table_by_title(
    tables: DataFrame, title_query: str, mode: SearchMode = SearchMode.CONTAINS
) -> DataFrame:
    """Q7/O5: first table matching the title, in insertion order — parity
    requires orderBy before limit(1) (table_search.py:465-476; SURVEY.md O5)."""
    matched, _ = match_score(F.col("title"), title_query, mode, case_sensitive=False)
    return tables.filter(matched).orderBy("doc_id", "table_index").limit(1)
