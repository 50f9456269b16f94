"""Event-parity gate for the fast HTML tokenizer (kernel/html.py _fast_feed).

The fast path must either (a) produce the EXACT handler-event stream the
stdlib HTMLParser produces — same calls, same order, same data chunking
(chunk boundaries matter: _DomScanner strips link chars per chunk) — or
(b) bail, in which case scan_html reruns the stdlib parser on a fresh
scanner.  This suite compares event streams on every corpus we ship plus an
adversarial fragment pool, and pins that the fast path actually engages on
the corpora (no silent always-bail)."""

import random

from html.parser import HTMLParser

from document_parser_spark.corpus import fixture_documents, synthesize_html_doc
from document_parser_spark.kernel.html import (
    _fast_feed,
    looks_like_html,
    parse_html_document,
    scan_html,
)


class _FastRecorder:
    """Duck-typed stand-in for _DomScanner: records handler calls."""

    def __init__(self):
        self.events = []

    def handle_data(self, data):
        self.events.append(("data", data))

    def handle_starttag(self, tag, attrs):
        # attrs are only materialized for <img> on the fast path (the one
        # tag whose attrs the scanner reads) — normalize both sides to that
        self.events.append(("start", tag, attrs if tag == "img" else []))

    def handle_startendtag(self, tag, attrs):
        self.events.append(("startend", tag, attrs if tag == "img" else []))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))


class _StdlibRecorder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.events = []

    def handle_data(self, data):
        self.events.append(("data", data))

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag, attrs if tag == "img" else []))

    def handle_startendtag(self, tag, attrs):
        self.events.append(("startend", tag, attrs if tag == "img" else []))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))


def _events_match(text):
    """True if the fast path completed; always asserts stream equality when
    it did."""
    fast = _FastRecorder()
    done = _fast_feed(fast, text)
    if not done:
        return False
    std = _StdlibRecorder()
    std.feed(text)
    std.close()
    assert fast.events == std.events, f"event streams diverge on: {text!r}"
    return True


def test_fast_path_covers_synthetic_corpus():
    texts = [synthesize_html_doc(i)["text"] for i in range(300)]
    completed = sum(_events_match(t) for t in texts)
    assert completed == len(texts), "fast path bailed on well-formed synthetic HTML"


def test_fast_path_on_html_fixtures():
    html_fx = [
        d["text"] if isinstance(d, dict) else d
        for d in fixture_documents()
        if looks_like_html(d["text"] if isinstance(d, dict) else d)
    ]
    assert html_fx, "no HTML fixtures found"
    completed = sum(_events_match(t) for t in html_fx)
    # the shipped HTML fixtures are well-formed: the fast path must engage
    # on all of them (bailing would silently demote the bench win to theater)
    assert completed == len(html_fx)


# Constructs with nontrivial stdlib recovery: the fast path may bail (then
# scan_html's fallback guarantees identical output), but whenever it claims
# completion the event stream must match stdlib exactly.
_FRAGMENTS = [
    "<p>plain</p>",
    "<P>UPPER</P>",
    "<p>a &amp; b &lt;c&gt; &#65; &#x42; &notareal; &amp</p>",
    "<div class='x' id=\"y\" data-k=v>q</div>",
    "<div title='a>b'>quoted gt</div>",
    "<img src='pic.png'>",
    "<img src=\"a&amp;b.png\" alt='x'>",
    "<img src=''>",
    "<img alt='no src'>",
    "<IMG SRC='CASE.PNG'/>",
    "<br>", "<br/>", "<br />",
    "<span/>text after",
    "<script>var a = '<div>not a tag</div>';</script><p>after</p>",
    "<script>unterminated...",
    "<script>x</scriptx></script><p>tail</p>",
    "<script>y</script ><p>tail</p>",
    "<STYLE>b{}</STYLE><p>z</p>",
    "<!-- comment --><p>c</p>",
    "<!--->odd comment<p>d</p>",
    "<!-- unterminated",
    "<!DOCTYPE html><p>e</p>",
    "<!doctype html PUBLIC 'x'><p>f</p>",
    "<!bogus declaration><p>g</p>",
    "<![CDATA[raw]]><p>h</p>",
    "<?php echo 1 ?><p>i</p>",
    "<?unterminated",
    "a < b and c > d",
    "tail lone <",
    "tail slash </",
    "</>empty end</p>",
    "</ p>spaced end",
    "</div junk>recovery",
    "<div", "<div attr='unterminated",
    "<1notatag>",
    "<émile>unicode tagish",
    "<my-widget>custom element</my-widget>",
    "<td a==b>double eq</td>",
    "<p>&#9731; snowman &#X263A;</p>",
    "text &amp; more & less &lt",
    "<a href='u'>link text</a> outside",
    "<table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>",
    "<div\nclass='m'>multiline\ntag</div>",
    "<div foo='bar'baz>adjacent attr</div>",
    "",
]


def test_fast_path_on_adversarial_fragments():
    for frag in _FRAGMENTS:
        _events_match(frag)


def test_fast_path_on_seeded_fuzz_combos():
    rng = random.Random(20260817)
    for _ in range(400):
        doc = "".join(rng.choice(_FRAGMENTS) for _ in range(rng.randint(1, 12)))
        _events_match(doc)


def test_scan_html_output_identical_to_stdlib_scan():
    """End-to-end: scan_html (fast+fallback) vs a forced-stdlib scan must
    produce identical spans and raw tables on every corpus doc."""
    from document_parser_spark.kernel.html import _DomScanner

    texts = [synthesize_html_doc(i)["text"] for i in range(200)] + [
        d["text"] if isinstance(d, dict) else d
        for d in fixture_documents()
        if looks_like_html(d["text"] if isinstance(d, dict) else d)
    ]
    for t in texts:
        got = scan_html(t)
        ref = _DomScanner()
        ref.feed(t)
        ref.close()
        assert got == (ref.spans, ref.raw_tables)


def test_parse_html_document_still_green():
    doc = parse_html_document(
        "<html><body><h1>T</h1><p>body text here</p>"
        "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr></table></body></html>"
    )
    kinds = [s["kind"] for s in doc["spans"]]
    assert "heading" in kinds and "table" in kinds
    assert doc["tables"] and doc["tables"][0]["num_rows"] == 2


def test_fast_path_hypothesis_fuzz():
    """Property fuzz over arbitrary unicode text mixed with markup-ish
    fragments: whenever the fast path claims completion its event stream
    must equal stdlib's, on input far outside the well-formed corpus."""
    from hypothesis import given, settings, strategies as st

    markup_bits = st.sampled_from(
        ["<", ">", "</", "<!", "<!--", "-->", "&amp;", "&#65;", "&", "<div>",
         "</div>", "<img src='x'>", "<script>", "</script>", "'", '"', "=",
         "<p class=", "/>", "<br/>", " ", "\n", "\t"]
    )
    chunk = st.one_of(st.text(max_size=12), markup_bits)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(chunk, max_size=20))
    def run(parts):
        _events_match("".join(parts))

    run()
