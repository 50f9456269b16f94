"""Result-display formatters — byte-parity with the reference CLI output.

Parity: /root/reference/table_search.py:479-524 (``print_search_results`` /
``print_row_results``).  The reference prints to stdout; these return the
identical string (including its quirks: the doubled "Full Row Data:" line at
table_search.py:516-517, dict-repr context, ``.2f`` scores, newline
flattening) so the presentation edge of a migration is drop-in.

Engine rows are Spark ``Row`` objects or plain dicts; both are accepted.
These run on COLLECTED results only (presentation edge, O4 display
truncation) — never inside a plan.
"""

from __future__ import annotations

from typing import Any, Iterable, List, Mapping


def _get(row: Any, name: str, default: Any = None) -> Any:
    if isinstance(row, Mapping):
        return row.get(name, default)
    try:
        value = row[name] if hasattr(row, "__getitem__") else getattr(row, name)
    except (KeyError, AttributeError, TypeError, ValueError):
        return default
    return value


def _plain(value: Any) -> Any:
    """Spark Row → dict (recursively) so reprs match the reference's dicts."""
    if hasattr(value, "asDict"):
        return {k: _plain(v) for k, v in value.asDict().items()}
    if isinstance(value, Mapping):
        return {k: _plain(v) for k, v in value.items()}
    return value


def format_search_results(results: Iterable[Any], max_display: int = 20) -> str:
    """table_search.py:479-499, returned instead of printed."""
    results = list(results)
    out: List[str] = []
    p = lambda s="": out.append(f"{s}\n")
    p(f"\n{'=' * 80}")
    p(f"Found {len(results)} results")
    p("=" * 80)
    for i, r in enumerate(results[:max_display]):
        p(f"\n[{i + 1}] Table {_get(r, 'table_index')} ({_get(r, 'table_type').upper()})")
        if _get(r, "table_title"):
            p(f"    Title: {_get(r, 'table_title')}")
        p(f"    Position: Row {_get(r, 'row')}, Col {_get(r, 'col')}")
        p(f"    Column: {_get(r, 'header').replace(chr(10), ' ')}")
        p(f"    Value: {_get(r, 'cell_text').replace(chr(10), ' ')}")
        p(f"    Match Type: {_get(r, 'match_type')}")
        p(f"    Match Score: {_get(r, 'match_score'):.2f}")
        context = _plain(_get(r, "context"))
        if context:
            p(f"    Context: {context}")
    if len(results) > max_display:
        p(f"\n... and {len(results) - max_display} more results")
    return "".join(out)


def format_row_results(results: Iterable[Any], max_display: int = 20) -> str:
    """table_search.py:503-524, returned instead of printed — including the
    reference's doubled 'Full Row Data:' header (:516-517), kept verbatim
    for parity."""
    results = list(results)
    out: List[str] = []
    p = lambda s="": out.append(f"{s}\n")
    p(f"\n{'=' * 80}")
    p(f"Found {len(results)} matching rows")
    p("=" * 80)
    for i, r in enumerate(results[:max_display]):
        p(f"\n[{i + 1}] Table {_get(r, 'table_index')} ({_get(r, 'table_type').upper()})")
        if _get(r, "table_title"):
            p(f"    Title: {_get(r, 'table_title')}")
        p(f"    Row: {_get(r, 'row')}")
        p(f"    Matched: {_get(r, 'matched_column')} = '{_get(r, 'matched_value')}'")
        p(f"    Match Score: {_get(r, 'match_score'):.2f}")
        p("\n    Full Row Data:")
        p("\n    Full Row Data:")
        for header, value in _plain(_get(r, "row_data")).items():
            header_str = header.replace("\n", " ")
            value_str = str(value).replace("\n", "\n" + " " * (len(header_str) + 8))
            p(f"      {header_str}: {value_str}")
    if len(results) > max_display:
        p(f"\n... and {len(results) - max_display} more results")
    return "".join(out)
