"""Unit tests on the kernel's own behavior: the span-stream spec (SURVEY.md
§7.0), reference edge cases (§5.2 item 2), and property-based round-trips."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from document_parser_spark import kernel
from document_parser_spark.corpus import fixture_documents, synthesize_corpus, to_input_rows
from document_parser_spark.kernel.pipeline import parse_table_sink_dialect


def spans_of(text):
    return kernel.parse_document(text)["spans"]


class TestSpanStream:
    def test_media_span_in_order(self):
        doc = next(d for d in fixture_documents() if d["doc_id"] == "fx-md-media-interleaved")
        spans = spans_of(doc["text"])
        kinds = [s["kind"] for s in spans]
        # the intro paragraph is selected as the table's title (lookback steps
        # over the media line, use_marker_converter.py:126) → kind=caption
        assert kinds == ["heading", "caption", "media", "table", "media", "text"]
        media_refs = [s["media_ref"] for s in spans if s["kind"] == "media"]
        assert media_refs == ["fig_1.png", "fig_2.jpeg"]
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)

    def test_caption_rekind(self):
        doc = next(d for d in fixture_documents() if d["doc_id"] == "fx-md-titles")
        spans = spans_of(doc["text"])
        captions = [s["text"] for s in spans if s["kind"] == "caption"]
        # "Table 3: …" and the numbered-section and plain-prose candidates are
        # prose lines re-kinded; the "## Heading" stays kind=heading.
        assert "Table 3: Labeled Caption" in captions
        assert "4.2 Numbered Section Title" in captions
        assert any(s["kind"] == "heading" for s in spans)

    def test_boilerplate_flags(self):
        doc = next(d for d in fixture_documents() if d["doc_id"] == "fx-md-boilerplate")
        spans = spans_of(doc["text"])
        bp = [s["text"] for s in spans if s["kind"] == "boilerplate"]
        assert "[Home](/home)" in bp          # nav link line
        assert "---" in bp                     # horizontal rule
        assert bp.count("Navigation footer line") == 3  # repeated ≥3×
        assert any(s["kind"] == "table" for s in spans)
        texts = [s["text"] for s in spans if s["kind"] in ("text", "caption")]
        assert any("Actual study content" in t for t in texts)

    def test_text_density_boilerplate(self):
        spans = spans_of("Real prose line here.\n\n::: ::: :::\n\n> > >\n\nMore prose.")
        kinds = [(s["kind"], s["text"]) for s in spans]
        assert ("boilerplate", "::: ::: :::") in kinds
        assert ("boilerplate", "> > >") in kinds
        assert ("text", "Real prose line here.") in kinds

    def test_table_span_is_canonical_block(self):
        spans = spans_of("| A | B |\n|---|---|\n| 1 | 2 |\n")
        assert [s["kind"] for s in spans] == ["table"]
        assert spans[0]["text"] == "| A | B |\n|---|---|\n| 1 | 2 |"
        assert spans[0]["offset"] == 0

    def test_empty_table_not_structured_but_span_emitted(self):
        doc = next(d for d in fixture_documents() if d["doc_id"] == "fx-md-empty-table")
        parsed = kernel.parse_document(doc["text"])
        assert parsed["tables"] == []  # rows-guard: use_marker_converter.py:101
        assert sum(1 for s in parsed["spans"] if s["kind"] == "table") == 1

    def test_plain_text_doc(self):
        doc = next(d for d in fixture_documents() if d["doc_id"] == "fx-plain-text")
        spans = spans_of(doc["text"])
        assert all(s["kind"] == "text" for s in spans)
        assert len(spans) == 3

    def test_offsets_are_line_numbers(self):
        text = "first\n\nsecond\n| A | B |\n|---|---|\n| 1 | 2 |"
        spans = spans_of(text)
        assert [(s["kind"], s["offset"]) for s in spans] == [
            ("text", 0), ("caption", 2), ("table", 3),
        ]


class TestReferenceEdgeCases:
    def test_row_pad_truncate(self):
        # main.py:96-100
        t = kernel.parse_table_block(["| a | b | c |", "|---|---|---|", "| 1 |", "| 1 | 2 | 3 | 4 |"])
        assert t["rows"] == [["1", "", ""], ["1", "2", "3"]]

    def test_three_line_guard(self):
        # use_marker_converter.py:195-196
        assert kernel.parse_table_block(["| a |", "|---|"]) is None

    def test_vertical_synthetic_headers(self):
        raw = {"headers": ["Pathology", "Dr. X"], "rows": [["Review Scientist", "Dr. Y"]]}
        out = kernel.extract_vertical(raw, 0)
        assert out["headers"] == ["Key", "Value"]
        assert out["header_row_count"] == 0
        assert out["cells"][0] == {
            "row": 0, "col": 0, "header": "Key", "header_levels": ["Key"],
            "text": "Pathology", "is_numeric": False,
        }
        raw3 = {"headers": ["a", "b", "c"], "rows": [["d", "e", "f"]]}
        assert kernel.extract_vertical(raw3, 0)["headers"] == ["Column 0", "Column 1", "Column 2"]

    def test_multirow_header_stop_condition(self):
        # numeric-majority row ends the header scan (use_marker_converter.py:339-346)
        rows = [["Group", "Dose"], ["Number", "(mg/kg)"], ["1", "50"], ["2", "150"]]
        assert kernel.detect_header_rows(rows) == 2

    def test_trailing_empty_level_trim_and_fallback(self):
        rows = [["A", "", ""], ["B", "", ""]]
        hier = kernel.build_header_hierarchy(rows, 2)
        assert hier[0]["levels"] == ["A", "B"]
        assert hier[1]["levels"] == ["Column_1"]
        assert hier[2]["full_path"] == "Column_2"

    def test_grouped_columns_requires_multilevel_and_adjacency(self):
        hier = kernel.build_header_hierarchy(
            [["W1", "W1", "W2", "W2"], ["M", "F", "M", "F"]], 2
        )
        groups = kernel.detect_column_groups(hier)
        assert [(g["parent"], g["start_col"], g["end_col"]) for g in groups] == [
            ("W1", 0, 1), ("W2", 2, 3),
        ]
        # single-level headers → no groups (use_marker_converter.py:483-485)
        flat = kernel.build_header_hierarchy([["X", "X", "Y"]], 1)
        assert kernel.detect_column_groups(flat) == []

    def test_merged_cell_owner_row0_merges_left(self):
        # convert_table_pdf.py:66-73 — the elif: row 0 empty cells merge left
        matrix = [["Phase", "", "Obs"], ["", "2", "Normal"]]
        spans = kernel.infer_merged_spans(matrix)
        by_owner = {(s["owner_row"], s["owner_col"]): s for s in spans}
        assert by_owner[(0, 0)]["max_col"] == 1  # (0,1) merged left into (0,0)
        assert by_owner[(0, 0)]["max_row"] == 1  # (1,0) merged up into (0,0)

    def test_sink_dialect_multi_header(self):
        out = parse_table_sink_dialect("| A | B |\n| A2 | B2 |\n|---|---|\n| 1 | 2 |")
        assert len(out["header_rows"]) == 2
        assert out["data_rows"] == [["1", "2"]]

    def test_title_allcaps_beats_table_label(self):
        # "TABLE 3: X" scores 8 via the caps rule — check order preservation
        lines = ["TABLE 3: SUMMARY OF RESULTS", "| a | b |"]
        title, idx = kernel.find_table_title(lines, 1)
        assert title == "TABLE 3: SUMMARY OF RESULTS" and idx == 0

    def test_invalid_regex_is_no_match(self):
        matched, score = kernel.match_text("[", "bracket", kernel.SearchMode.REGEX)
        assert (matched, score) == (False, 0.0)

    def test_fuzzy_threshold_boundary(self):
        matched, score = kernel.match_text("abc", "abd", kernel.SearchMode.FUZZY)
        assert matched and score == pytest.approx(2 / 3)
        matched, _ = kernel.match_text("abc", "xyd", kernel.SearchMode.FUZZY)
        assert not matched


class TestCorpus:
    def test_fixture_corpus_deterministic(self):
        a = fixture_documents()
        b = fixture_documents()
        assert a == b
        assert len({d["doc_id"] for d in a}) == len(a)

    def test_synthesized_corpus_deterministic_and_skewed(self):
        docs = list(synthesize_corpus(300, seed=42))
        again = list(synthesize_corpus(300, seed=42))
        assert docs == again
        sizes = sorted(len(d["text"]) for d in docs)
        assert sizes[-1] > 10 * sizes[len(sizes) // 2]  # heavy tail vs median

    def test_input_rows_shape(self):
        rows = to_input_rows(fixture_documents())
        media_doc = next(r for r in rows if r["doc_id"] == "fx-md-media-interleaved")
        kinds = [s["kind"] for s in media_doc["spans"]]
        assert kinds == ["text", "media", "media"]


# --- property-based (SURVEY.md §5.2 item 4) ---------------------------------

# NB: \x1c-\x1e /   etc. are line separators for str.splitlines() (the
# reference splits the same way), and a 1-cell row "| x |" has no interior
# pipe so it legitimately ends a table block — the strategy reflects both.
cell_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs"), blacklist_characters="|"),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    headers=st.lists(cell_text, min_size=2, max_size=5),
    rows=st.lists(st.lists(cell_text, min_size=2, max_size=7), min_size=1, max_size=6),
)
def test_render_parse_roundtrip_shape(headers, rows):
    md = "\n".join(
        ["| " + " | ".join(headers) + " |", "|" + "---|" * len(headers)]
        + ["| " + " | ".join(r) + " |" for r in rows]
    )
    _, tables = kernel.scan_markdown(kernel.normalize_scripts(md))
    assert len(tables) == 1
    t = tables[0]
    assert len(t["headers"]) == len(headers)
    assert all(len(r) == len(headers) for r in t["rows"])
    assert len(t["rows"]) == len(rows)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_normalize_idempotent(s):
    once = kernel.normalize_scripts(s)
    assert kernel.normalize_scripts(once) == once
