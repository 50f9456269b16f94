"""Table-structure heuristics (pure Python, no Spark).

Reference-parity semantics (/root/reference/use_marker_converter.py):
  * vertical-vs-horizontal detection (H1) — :265-323
  * multi-row header detection (H2/W2)    — :326-365
  * column header hierarchy (H3)          — :434-472
  * adjacent-column grouping (H4/W3)      — :475-513
  * vertical extraction (H5)              — :368-431
  * horizontal extraction (H6)            — :516-580
  * auto dispatch (H8)                    — :583-597

Each function is a pure function of one raw table, so the whole chain runs
inside the per-document Arrow UDF — one Python call per *batch of documents*,
never per row.
"""

from __future__ import annotations

from typing import Any, Dict, List

from .normalize import clean_cell
from .predicates import contains_units, is_numeric_cell

# Keyword lists are order/case-frozen shared constants (SURVEY.md §7.3 item 4).
LABEL_KEYWORDS = (
    "name", "role", "type", "category", "description", "title",
    "director", "assessment", "pathology", "review", "scientist",
)  # use_marker_converter.py:302-303

HEADER_KEYWORDS = (
    "group", "number", "name", "id", "type", "description",
    "date", "time", "status", "dose", "concentration", "volume", "animal",
)  # use_marker_converter.py:350-351


def detect_table_structure(headers: List[str], rows: List[List[str]]) -> str:
    """``"vertical"`` (key-value) or ``"horizontal"``.

    Decision parity with use_marker_converter.py:265-323: first-column
    numeric ratio ≤ 0.5, uniqueness > 0.7 plus a label keyword ⇒ vertical;
    a header cell that looks like data (len>50 / ``@`` / ``Phone:``) ⇒
    vertical; otherwise horizontal.
    """
    if not rows or len(headers) < 2:
        return "horizontal"

    first_col = [row[0] for row in rows if row]
    non_empty = sum(1 for v in first_col if v.strip())
    if non_empty == 0:
        return "horizontal"
    if sum(1 for v in first_col if is_numeric_cell(v)) / non_empty > 0.5:
        return "horizontal"

    unique_ratio = len(set(first_col)) / len(first_col) if first_col else 0.0
    has_labels = any(
        kw in v.lower() for v in first_col if v for kw in LABEL_KEYWORDS
    )
    if unique_ratio > 0.7 and has_labels:
        return "vertical"

    if any(len(h) > 50 or "@" in h or "Phone:" in h for h in headers):
        return "vertical"
    return "horizontal"


def detect_header_rows(all_rows: List[List[str]]) -> int:
    """Count leading header rows of a horizontal table (max 5).

    Parity: use_marker_converter.py:326-365 — a row stays a header row while
    it has units / header keywords / zero numerics / ``^``/``_`` markers;
    the first numeric-majority row ends the scan; all-empty rows are skipped
    without extending the count.
    """
    if not all_rows:
        return 0
    count = 1
    for i in range(min(5, len(all_rows))):
        row = all_rows[i]
        numeric = sum(1 for c in row if is_numeric_cell(c))
        non_empty = sum(1 for c in row if c.strip())
        if non_empty == 0:
            continue
        if numeric / non_empty > 0.5:
            break
        row_lower = [c.lower() for c in row]
        header_like = (
            any(contains_units(c) for c in row)
            or any(kw in c for c in row_lower for kw in HEADER_KEYWORDS)
            or numeric == 0
            or any("^" in c or "_" in c for c in row)
        )
        if header_like:
            count = i + 1
        else:
            break
    return count


def build_header_hierarchy(all_rows: List[List[str]], header_row_count: int) -> List[Dict[str, Any]]:
    """Per-column stack of cleaned header cells, trailing blanks trimmed,
    ``Column_{i}`` fallback, newline-joined full path.

    Parity: use_marker_converter.py:434-472.
    """
    if header_row_count == 0 or not all_rows:
        return []
    out = []
    for col in range(len(all_rows[0])):
        levels = [
            clean_cell(all_rows[r][col]) if r < len(all_rows) and col < len(all_rows[r]) else ""
            for r in range(header_row_count)
        ]
        while levels and not levels[-1]:
            levels.pop()
        if not levels:
            levels = [f"Column_{col}"]
        filled = [lvl for lvl in levels if lvl]
        out.append(
            {
                "col": col,
                "levels": levels,
                "full_path": "\n".join(filled) if filled else f"Column_{col}",
            }
        )
    return out


def detect_column_groups(column_headers: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Adjacent columns sharing a parent (levels[0]) form a group; singleton
    groups are dropped; no grouping unless some column has >1 level.

    Parity: use_marker_converter.py:475-513 (classic sessionization — the
    pure-Spark twin is lag+cumsum, SURVEY.md §2.7 W3).
    """
    if not column_headers:
        return []
    if max(len(ch["levels"]) for ch in column_headers) <= 1:
        return []
    groups: List[Dict[str, Any]] = []
    cur: Dict[str, Any] | None = None
    for ch in column_headers:
        if not ch["levels"]:
            continue
        parent = ch["levels"][0]
        if cur is None or cur["parent"] != parent:
            if cur is not None:
                groups.append(cur)
            cur = {"parent": parent, "start_col": ch["col"], "end_col": ch["col"], "columns": [ch["col"]]}
        else:
            cur["end_col"] = ch["col"]
            cur["columns"].append(ch["col"])
    if cur is not None:
        groups.append(cur)
    return [g for g in groups if len(g["columns"]) > 1]


def extract_vertical(raw: Dict[str, Any], table_index: int, source: str = "markdown", title: str = "") -> Dict[str, Any]:
    """Key-value table: the header row is demoted to data; synthetic column
    names ``Key``/``Value`` (2 cols) or ``Column {i}``.

    Parity: use_marker_converter.py:368-431.
    """
    data = [raw["headers"]] + raw["rows"]
    ncols = len(raw["headers"])
    names = ["Key", "Value"] if ncols == 2 else [f"Column {i}" for i in range(ncols)]

    cells = [
        {
            "row": r,
            "col": c,
            "header": names[c] if c < len(names) else f"Column {c}",
            "header_levels": [names[c] if c < len(names) else f"Column {c}"],
            "text": clean_cell(cell),
            "is_numeric": is_numeric_cell(cell),
        }
        for r, row in enumerate(data)
        for c, cell in enumerate(row)
    ]
    return {
        "index": table_index,
        "source": source,
        "title": title,
        "table_type": "vertical",
        "num_columns": ncols,
        "num_rows": len(data),
        "header_row_count": 0,
        "headers": names,
        "column_headers": [
            {"col": i, "levels": [nm], "full_path": nm} for i, nm in enumerate(names)
        ],
        "column_groups": [],
        "header_cells": [],
        "cells": cells,
    }


def extract_horizontal(raw: Dict[str, Any], table_index: int, source: str = "markdown", title: str = "") -> Dict[str, Any]:
    """Standard table: multi-row header detection, hierarchy, groups, data
    cells tagged with full_path/levels/is_numeric, separate header_cells.

    Parity: use_marker_converter.py:516-580.
    """
    all_rows = [raw["headers"]] + raw["rows"]
    hrc = detect_header_rows(all_rows)
    column_headers = build_header_hierarchy(all_rows, hrc)
    groups = detect_column_groups(column_headers)
    data_rows = all_rows[hrc:]

    # hot loop: hoist the per-column dict chains and the len() out of the
    # per-cell comprehension (~20% of whole-document parse time was spent
    # re-indexing column_headers[c][...] per cell; output byte-identical)
    ncol = len(column_headers)
    col_paths = [ch["full_path"] for ch in column_headers]
    col_levels = [ch["levels"] for ch in column_headers]
    cells = [
        {
            "row": r,
            "col": c,
            "header": col_paths[c],
            "header_levels": col_levels[c],
            "text": clean_cell(cell),
            "is_numeric": is_numeric_cell(cell),
        }
        for r, row in enumerate(data_rows)
        for c, cell in enumerate(row)
        if c < ncol
    ]
    header_cells = [
        {"header_row": r, "col": c, "text": clean_cell(cell), "is_header": True}
        for r in range(min(hrc, len(all_rows)))
        for c, cell in enumerate(all_rows[r])
        if c < ncol
    ]
    return {
        "index": table_index,
        "source": source,
        "title": title,
        "table_type": "horizontal",
        "num_columns": len(column_headers),
        "num_rows": len(data_rows),
        "header_row_count": hrc,
        "headers": list(col_paths),
        "column_headers": column_headers,
        "column_groups": groups,
        "header_cells": header_cells,
        "cells": cells,
    }


def extract_table_auto(raw: Dict[str, Any], table_index: int, source: str = "markdown", title: str = "") -> Dict[str, Any]:
    """Dispatch H1 → H5 or H6.  Parity: use_marker_converter.py:583-597."""
    if detect_table_structure(raw["headers"], raw["rows"]) == "vertical":
        return extract_vertical(raw, table_index, source, title)
    return extract_horizontal(raw, table_index, source, title)
