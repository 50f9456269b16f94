"""Pure-Python reference-faithful kernel.

No Spark imports here: these functions are (a) the golden oracle for the
fixture corpus and (b) the bodies of the vectorized Arrow UDFs in
``document_parser_spark.operators`` — one shared implementation, so the
distributed pipeline matches the oracle by construction.
"""

from .html import looks_like_html, parse_html_document, scan_html
from .normalize import clean_cell, clean_cell_basic, normalize_scripts, split_script_runs
from .pipeline import infer_merged_spans, parse_document, parse_table_sink_dialect
from .predicates import (
    FUZZY_THRESHOLD,
    SearchMode,
    contains_units,
    is_numeric_cell,
    levenshtein_similarity,
    match_text,
)
from .scanner import (
    find_table_title,
    is_separator_row,
    is_table_row,
    parse_table_block,
    scan_markdown,
    split_row,
)
from .structure import (
    HEADER_KEYWORDS,
    LABEL_KEYWORDS,
    build_header_hierarchy,
    detect_column_groups,
    detect_header_rows,
    detect_table_structure,
    extract_horizontal,
    extract_table_auto,
    extract_vertical,
)

__all__ = [
    "FUZZY_THRESHOLD",
    "HEADER_KEYWORDS",
    "LABEL_KEYWORDS",
    "SearchMode",
    "build_header_hierarchy",
    "clean_cell",
    "clean_cell_basic",
    "contains_units",
    "detect_column_groups",
    "detect_header_rows",
    "detect_table_structure",
    "extract_horizontal",
    "extract_table_auto",
    "extract_vertical",
    "find_table_title",
    "infer_merged_spans",
    "is_numeric_cell",
    "is_separator_row",
    "is_table_row",
    "levenshtein_similarity",
    "looks_like_html",
    "match_text",
    "normalize_scripts",
    "parse_document",
    "parse_html_document",
    "parse_table_block",
    "parse_table_sink_dialect",
    "scan_html",
    "scan_markdown",
    "split_script_runs",
    "split_row",
]
