"""Q2–Q7 parity: the Spark search operators vs the reference's own
UnifiedTableSearchEngine (AST-exec'd), run per fixture document over
identical extracted tables."""

import pytest

from document_parser_spark import kernel
from document_parser_spark.corpus import fixture_documents
from document_parser_spark.operators import search as S
from document_parser_spark.operators.extract import (
    assemble_document_text,
    cells_output,
    parse_documents,
    tables_output,
)
from document_parser_spark.sources.data import fixture_input_df
from tests.conftest import load_reference_functions


@pytest.fixture(scope="module")
def ref():
    ns = load_reference_functions(
        "table_search.py", ["SearchMode", "SearchResult", "UnifiedTableSearchEngine"]
    )
    return ns


@pytest.fixture(scope="module")
def engines(ref):
    """One reference engine per fixture doc, fed kernel-extracted tables
    (already proven byte-equal to reference extraction)."""
    return {
        d["doc_id"]: ref["UnifiedTableSearchEngine"](
            kernel.parse_document(d["text"])["tables"]
        )
        for d in fixture_documents()
    }


@pytest.fixture(scope="module")
def frames(spark):
    parsed = parse_documents(assemble_document_text(fixture_input_df(spark)))
    tables = tables_output(parsed).cache()
    cells = cells_output(tables).cache()
    cells.count()
    return tables, cells


def _by_doc(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out


def _ref_mode(ref, mode: kernel.SearchMode):
    return {m.value: m for m in ref["SearchMode"]}[mode.value]


KEY_VALUE_CASES = [
    dict(key_query="Pathology", table_title="CONTRIBUTING SCIENTISTS"),
    dict(key_query="Pathology"),
    dict(key_query="path", mode=kernel.SearchMode.STARTS_WITH),
    dict(key_query="Review", mode=kernel.SearchMode.CONTAINS, case_sensitive=True),
    dict(key_query="pathology", mode=kernel.SearchMode.EXACT),
    dict(key_query="Patholoy", mode=kernel.SearchMode.FUZZY),
    dict(key_query=r"path.*gy$", mode=kernel.SearchMode.REGEX),
]


@pytest.mark.parametrize("case", KEY_VALUE_CASES, ids=lambda c: repr(c)[:40])
def test_search_by_key_value_parity(spark, ref, engines, frames, case):
    _, cells = frames
    got = _by_doc(S.search_by_key_value(cells, **case).collect())
    for doc_id, engine in engines.items():
        kwargs = dict(case)
        if "mode" in kwargs:
            kwargs["mode"] = _ref_mode(ref, kwargs["mode"])
        expected = engine.search_by_key_value(**kwargs)
        mine = got.get(doc_id, [])
        assert len(mine) == len(expected), doc_id
        for g, e in zip(mine, expected):
            assert (
                g["table_index"], g["row"], g["col"], g["header"], g["cell_text"]
            ) == (e.table_index, e.row, e.col, e.header, e.cell_text), doc_id
            assert g["match_score"] == pytest.approx(e.match_score)
            assert g["context"].asDict() == e.context, doc_id


COLUMN_CASES = [
    dict(column_name="Group Number"),
    dict(column_name="Group Number", value_query="2"),
    dict(column_name="Dose", value_query="50", table_title="Experimental"),
    dict(column_name="(mg/kg)"),
    dict(column_name="Week 1"),
]


@pytest.mark.parametrize("case", COLUMN_CASES, ids=lambda c: repr(c)[:40])
def test_search_by_column_parity(spark, ref, engines, frames, case):
    _, cells = frames
    got = _by_doc(S.search_by_column(cells, **case).collect())
    for doc_id, engine in engines.items():
        expected = engine.search_by_column(**case)
        mine = got.get(doc_id, [])
        assert len(mine) == len(expected), doc_id
        for g, e in zip(mine, expected):
            assert (
                g["table_index"], g["row"], g["col"], g["header"],
                list(g["header_levels"]), g["cell_text"],
            ) == (e.table_index, e.row, e.col, e.header, e.header_levels, e.cell_text), doc_id


def test_get_row_by_column_value_parity(spark, ref, engines, frames):
    _, cells = frames
    case = dict(column_name="Group Number", value_query="2", table_title="Experimental Design")
    got = _by_doc(S.get_row_by_column_value(cells, **case).collect())
    total = 0
    for doc_id, engine in engines.items():
        expected = engine.get_row_by_column_value(**case)
        mine = got.get(doc_id, [])
        assert len(mine) == len(expected), doc_id
        for g, e in zip(mine, expected):
            assert g["row"] == e["row"] and g["matched_column"] == e["matched_column"]
            assert g["matched_value"] == e["matched_value"]
            assert dict(g["row_data"]) == e["row_data"], doc_id
        total += len(expected)
    assert total >= 2  # present in both the standalone doc and the composite


ANYWHERE_CASES = [
    dict(query="mg/kg", max_results=10),
    dict(query="mg/kg"),
    dict(query="Normal", table_type="horizontal"),
    dict(query="[", mode=kernel.SearchMode.REGEX),   # invalid regex → empty
    dict(query="Reduced activty", mode=kernel.SearchMode.FUZZY),
    dict(query=r"\d+%", mode=kernel.SearchMode.REGEX),
]


@pytest.mark.parametrize("case", ANYWHERE_CASES, ids=lambda c: repr(c)[:40])
def test_search_anywhere_parity(spark, ref, engines, frames, case):
    _, cells = frames
    for doc_id, engine in engines.items():
        kwargs = dict(case)
        if "mode" in kwargs:
            kwargs["mode"] = _ref_mode(ref, kwargs["mode"])
        expected = engine.search_anywhere(**kwargs)
        doc_cells = cells.filter(cells.doc_id == doc_id)
        mine = S.search_anywhere(doc_cells, **case).collect()
        assert len(mine) == len(expected), (doc_id, case)
        for g, e in zip(mine, expected):
            assert (
                g["table_index"], g["row"], g["col"], g["cell_text"]
            ) == (e.table_index, e.row, e.col, e.cell_text), doc_id
            assert g["match_score"] == pytest.approx(e.match_score)


def test_list_all_tables_parity(spark, ref, engines, frames):
    tables, _ = frames
    got = _by_doc(S.list_all_tables(tables).collect())
    for doc_id, engine in engines.items():
        expected = engine.list_all_tables()
        mine = got.get(doc_id, [])
        assert [
            (g["index"], g["title"], g["type"], g["source"], g["size"]) for g in mine
        ] == [
            (e["index"], e["title"], e["type"], e["source"], e["size"]) for e in expected
        ], doc_id


def test_get_table_by_title_parity(spark, ref, engines, frames):
    tables, _ = frames
    for doc_id, engine in engines.items():
        expected = engine.get_table_by_title("Experimental")
        mine = S.get_table_by_title(
            tables.filter(tables.doc_id == doc_id), "Experimental"
        ).collect()
        if expected is None:
            assert mine == []
        else:
            assert len(mine) == 1
            assert mine[0]["table_index"] == expected["index"]
            assert mine[0]["title"] == expected["title"]
