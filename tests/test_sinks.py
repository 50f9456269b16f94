"""Sinks K1–K7, source S5/S6, C7 styled runs — round-trips and parity."""

import shutil
import uuid

import pytest

from document_parser_spark.corpus import fixture_documents
from document_parser_spark.kernel.normalize import split_script_runs
from document_parser_spark.operators.extract import (
    assemble_document_text,
    cells_output,
    parse_documents,
    tables_output,
)
from document_parser_spark.sources.data import fixture_input_df, markdown_files_df
from document_parser_spark.sources import sinks

TMP = "/root/repo/.tmp"


@pytest.fixture(scope="module")
def workdir():
    path = f"{TMP}/sinks-{uuid.uuid4().hex[:8]}"
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def frames(spark):
    parsed = parse_documents(assemble_document_text(fixture_input_df(spark))).persist()
    tables = tables_output(parsed).persist()
    return parsed, tables


def test_tables_json_roundtrip(spark, frames, workdir):
    _, tables = frames
    sinks.write_tables_json(tables, f"{workdir}/tables_json")
    back = sinks.read_tables_json(spark, f"{workdir}/tables_json")
    assert back.count() == tables.count()
    a = {(r["doc_id"], r["table_index"]): r["title"] for r in back.collect()}
    b = {(r["doc_id"], r["table_index"]): r["title"] for r in tables.collect()}
    assert a == b


def test_cells_csv(spark, frames, workdir):
    _, tables = frames
    cells = cells_output(tables.filter(tables.doc_id == "fx-md-basic-table"))
    sinks.write_cells_csv(cells, f"{workdir}/cells_csv")
    # cell text legitimately contains newlines (<br> → \n, C2) → multiLine
    back = spark.read.option("header", True).option("multiLine", True).csv(
        f"{workdir}/cells_csv"
    )
    assert back.count() == cells.count()


def test_markdown_sink_and_s5_source(spark, frames, workdir):
    parsed, _ = frames
    sinks.write_markdown(parsed.select("doc_id", "spans"), f"{workdir}/md")
    back = spark.read.json(f"{workdir}/md")
    row = back.filter(back.doc_id == "fx-plain-text").first()
    assert "no tables and no media" in row["markdown"]

    # S5: whole-file markdown source
    import os

    os.makedirs(f"{workdir}/mdfiles", exist_ok=True)
    for d in fixture_documents()[:3]:
        with open(f"{workdir}/mdfiles/{d['doc_id']}.md", "w") as f:
            f.write(d["text"])
    src = markdown_files_df(spark, f"{workdir}/mdfiles")
    rows = {r["doc_id"]: r["text"] for r in src.collect()}
    assert len(rows) == 3
    assert any(v for v in rows.values())


def test_html_column(frames):
    _, tables = frames
    html = sinks.html_table_column(tables.filter(tables.doc_id == "fx-md-basic-table"))
    row = html.first()
    assert row["html"].startswith("<table><caption>")
    assert "<td>" in row["html"]


def test_to_pandas_tables_a5(frames):
    _, tables = frames
    out = sinks.to_pandas_tables(tables, "fx-md-basic-table")
    assert len(out) == 1
    df = out[0]["df"]
    assert df.shape[0] == 4  # four data rows (groups 1-4)
    assert any("Group Number" in c for c in df.columns)
    assert list(df[[c for c in df.columns if "Group" in c][0]]) == ["1", "2", "3", "4"]


def test_split_script_runs_c7():
    # parity with convert_table.py:73-99 semantics
    assert split_script_runs("x^2 plus_3y") == [
        ("plain", "x"), ("superscript", "2"), ("plain", " plus"),
        ("subscript", "3y"),
    ]
    assert split_script_runs("a<br>b") == [("plain", "a"), ("break", ""), ("plain", "b")]
    assert split_script_runs("") == []
    assert split_script_runs("^a") == [("superscript", "a")]
