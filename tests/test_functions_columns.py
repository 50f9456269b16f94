"""Native Column-expression twins vs the kernel (F1/F2/F7/F8): same verdicts
on an adversarial sample set — no UDF may drift from the oracle."""

import pytest
from pyspark.sql import functions as F

from document_parser_spark import kernel
from document_parser_spark.functions.columns import (
    contains_units_expr,
    fuzzy_score,
    is_numeric_cell_expr,
    match_score,
)

SAMPLES = [
    "1,234", "$5.0", "12%", "3 mg/kg", "AB12CD34", "", "  ", "abc", "1.5e3",
    "-42", "100", "a1b2c3", "12 34", "N/A", "$ 1,000.00 %", "nan", "inf",
    "0.5 mL", "x", "1", "½", "Dr. Smith", "Group Number", "(mg/kg)",
    "5 kg", "mL/kg", "kilometer", "°C", "(3 M)", "+3", "1e", "e1", "..",
    "Day 1\nDay 8", "12.5%", "-", "—", "0", "00", "  7  ",
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(s,) for s in SAMPLES], ["t"])


def test_numeric_expr_matches_kernel(spark, sample_df):
    rows = sample_df.select("t", is_numeric_cell_expr(F.col("t")).alias("v")).collect()
    for r in rows:
        assert r["v"] == kernel.is_numeric_cell(r["t"]), repr(r["t"])


def test_units_expr_matches_kernel(spark, sample_df):
    rows = sample_df.select("t", contains_units_expr(F.col("t")).alias("v")).collect()
    for r in rows:
        assert r["v"] == kernel.contains_units(r["t"]), repr(r["t"])


def test_fuzzy_score_matches_kernel(spark, sample_df):
    rows = sample_df.select(
        "t", fuzzy_score(F.lit("group number"), F.lower("t")).alias("v")
    ).collect()
    for r in rows:
        expected = kernel.levenshtein_similarity("group number", r["t"].lower())
        assert r["v"] == pytest.approx(expected), repr(r["t"])


@pytest.mark.parametrize("mode", list(kernel.SearchMode))
@pytest.mark.parametrize("query", ["mg/kg", "GROUP", r"\d+", "[", "abc"])
def test_match_score_matches_kernel(spark, sample_df, mode, query):
    if mode == kernel.SearchMode.REGEX and query not in (r"\d+", "["):
        pytest.skip("regex dialect parity asserted on regex-shaped queries")
    matched, score = match_score(F.col("t"), query, mode, case_sensitive=False)
    rows = sample_df.select("t", matched.alias("m"), score.alias("s")).collect()
    for r in rows:
        em, es = kernel.match_text(query, r["t"], mode, case_sensitive=False)
        assert r["m"] == em, (query, mode, repr(r["t"]))
        assert r["s"] == pytest.approx(es), (query, mode, repr(r["t"]))
