"""HTML/DOM kernel: frozen golden span sequences for the HTML fixture
classes (the north rule's HTML main-content extraction — these tests ARE the
spec), dispatch sniffing, and structure-heuristic reuse."""

from document_parser_spark.corpus import FIXTURE_CLASSES
from document_parser_spark.kernel import looks_like_html, parse_document


def _seq(doc):
    return [(s["kind"], s["text"], s["media_ref"]) for s in doc["spans"]]


def test_sniff_dispatch():
    for name, text in FIXTURE_CLASSES.items():
        expect_html = name in (
            "html-basic", "html-vertical-kv", "html-deep-boiler", "html-messy",
            "html-void-heavy",
        )
        assert looks_like_html(text) is expect_html, name
    assert not looks_like_html("plain prose with <br> inline")
    assert not looks_like_html("| a | b |\n|---|---|")
    assert looks_like_html("  <html><body><p>x</p></body></html>")


def test_html_void_heavy_golden():
    """Void elements (<br>/<hr>/<img>) must not accumulate tag depth: real
    prose after 14 of them stays main content (ADVICE r02, kernel/html.py)."""
    doc = parse_document(FIXTURE_CLASSES["html-void-heavy"])
    assert _seq(doc) == [
        ("text",
         "poem line one line two line three line four line five line six "
         "line seven line eight line nine line ten", None),
        ("media", "", "fig_void_1.png"),
        ("media", "", "fig_void_2.png"),
        ("text", "Real prose after many void tags must remain main content.", None),
        ("text", "And a second real paragraph closes the page.", None),
    ]
    assert [s["offset"] for s in doc["spans"]] == list(range(5))


def test_html_basic_golden():
    doc = parse_document(FIXTURE_CLASSES["html-basic"])
    assert _seq(doc) == [
        ("boilerplate", "Home | Studies", None),          # <nav> ancestry
        ("heading", "Quarterly Study Report", None),
        ("text", "Primary findings paragraph with substantive content about dosing.", None),
        ("media", "", "fig_html_1.png"),
        ("table", "| Group | Dose (mg/kg) |\n|---|---|\n| 1 | 0 |\n| 2 | 50 |", None),
        ("boilerplate", "related one related two", None),  # link density ≥ 0.8
        ("boilerplate", "Copyright line in the footer", None),  # <footer>
    ]
    assert [s["offset"] for s in doc["spans"]] == list(range(7))
    (table,) = doc["tables"]
    assert table["table_type"] == "horizontal"
    assert table["title"] == "Table 9: Dose Summary"  # <caption> wins
    assert [c["text"] for c in table["cells"]] == ["1", "0", "2", "50"]
    assert table["headers"] == ["Group", "Dose (mg/kg)"]


def test_html_vertical_golden():
    doc = parse_document(FIXTURE_CLASSES["html-vertical-kv"])
    kinds = [s["kind"] for s in doc["spans"]]
    assert kinds == ["heading", "table", "text"]
    (table,) = doc["tables"]
    assert table["table_type"] == "vertical"            # H1 on DOM rows
    assert table["title"] == "STUDY CONTACTS"           # heading fallback
    texts = [c["text"] for c in table["cells"]]
    assert "Pathology" in texts and "Dr. Maria Chen" in texts


def test_html_tag_depth_and_density_boilerplate():
    doc = parse_document(FIXTURE_CLASSES["html-deep-boiler"])
    by_text = {s["text"]: s["kind"] for s in doc["spans"]}
    assert by_text["Real content at sane depth stays text."] == "text"
    assert by_text["decoration wrapped far too deep to be content"] == "boilerplate"
    assert by_text["=== ---- ===="] == "boilerplate"    # text density < 0.35
    assert by_text["Final real paragraph closes the page."] == "text"


def test_html_entities_and_scripts_normalized():
    doc = parse_document(
        "<html><body><p>R&amp;D uses H₂O &lt;daily&gt;</p>"
        "<script>var x = 1;</script></body></html>"
    )
    assert _seq(doc) == [("text", "R&D uses H_2O <daily>", None)]


def test_html_search_surface_end_to_end(spark):
    """HTML fixtures flow through the distributed pipeline into Q2 search."""
    from pyspark.sql import functions as F

    from document_parser_spark.operators.extract import (
        assemble_document_text,
        cells_output,
        parse_documents,
        tables_output,
    )
    from document_parser_spark.operators.search import search_by_key_value
    from document_parser_spark.sources.data import fixture_input_df

    inp = fixture_input_df(spark).filter(F.col("doc_id").startswith("fx-html"))
    cells = cells_output(tables_output(parse_documents(assemble_document_text(inp))))
    hits = search_by_key_value(cells, "Pathology").collect()
    assert [(h["doc_id"], h["cell_text"]) for h in hits] == [
        ("fx-html-vertical-kv", "Dr. Maria Chen")
    ]


def test_html_nested_and_malformed():
    """Nested tables flatten into the outer grid (frozen rule); unclosed
    tags and stray closers never crash or lose trailing content."""
    doc = parse_document(
        "<html><body><table>"
        "<tr><th>K</th><th>V</th></tr>"
        "<tr><td>outer</td><td><table><tr><td>9</td><td>8</td></tr></table></td></tr>"
        "<tr><td>last</td><td>7</td></tr>"
        "</table></body></html>"
    )
    (table,) = doc["tables"]
    data_texts = [c["text"] for c in table["cells"]]
    header_texts = [c["text"] for c in table["header_cells"]]
    # nothing is lost: the partial outer row flattens in (H2's multi-row
    # header scan absorbs the all-text ['outer',''] row — reference-faithful)
    assert "outer" in data_texts + header_texts
    assert "last" in data_texts and "9" in data_texts and "7" in data_texts

    messy = parse_document(
        "<html><body><p>first<div>second</p></div></span>"
        "<table><tr><td>a</td><td>b</table>"
        "<p>trailing content survives</p>"
    )
    all_text = " ".join(s["text"] for s in messy["spans"])
    assert "first" in all_text and "trailing content survives" in all_text


def test_self_closing_drop_and_boiler_tags_do_not_leak():
    """XHTML-style self-closing <script/> / <nav/> must undo the drop/boiler
    counters: content after them is neither dropped nor boilerplate."""
    from document_parser_spark.kernel.html import parse_html_document

    r = parse_html_document('<p>before</p><script src="x.js"/><p>after text</p>')
    assert [s["text"] for s in r["spans"]] == ["before", "after text"]
    r2 = parse_html_document("<nav/><p>real content here after nav</p>")
    spans = [s for s in r2["spans"] if s["text"]]
    assert spans and spans[0]["kind"] == "text"
    assert spans[0]["text"] == "real content here after nav"
