"""Native Column-expression twins of the kernel predicates — zero UDFs, so
every filter below runs inside whole-stage codegen and can be pushed by
Catalyst (SURVEY.md §2.4 mappings).

Parity targets (/root/reference):
  * match modes F1      — table_search.py:100-141
  * fuzzy score F2      — table_search.py:143-171
  * numeric predicate F7 — use_marker_converter.py:229-248
  * units predicate F8   — use_marker_converter.py:251-262
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernel import FUZZY_THRESHOLD, SearchMode


def fuzzy_score(query: Column, text: Column) -> Column:
    """``1 - levenshtein/max_len``; 0.0 when either side is empty.
    Built-in ``F.levenshtein`` — no UDF (SURVEY.md F2)."""
    max_len = F.greatest(F.length(query), F.length(text))
    return F.when(
        (F.length(query) == 0) | (F.length(text) == 0), F.lit(0.0)
    ).otherwise(1.0 - F.levenshtein(query, text) / max_len)


def match_score(
    text: Column, query: str, mode: SearchMode, case_sensitive: bool = False
) -> Tuple[Column, Column]:
    """Return ``(matched, score)`` Columns for a literal query against a text
    column — the Spark twin of kernel.match_text.

    The reference folds BOTH sides to lowercase before any mode (including
    regex, which additionally compiles with IGNORECASE) — reproduced here.
    An invalid regex is guarded at plan-build time (the reference guards at
    run time, table_search.py:128-131 — same observable result: no match).
    """
    q = query if case_sensitive else query.lower()
    t = text if case_sensitive else F.lower(text)

    if mode == SearchMode.EXACT:
        matched = t == F.lit(q)
    elif mode == SearchMode.CONTAINS:
        matched = t.contains(q)
    elif mode == SearchMode.STARTS_WITH:
        matched = t.startswith(q)
    elif mode == SearchMode.ENDS_WITH:
        matched = t.endswith(q)
    elif mode == SearchMode.REGEX:
        try:
            re.compile(q)
            matched = t.rlike(f"(?i){q}" if not case_sensitive else q)
        except re.error:
            matched = F.lit(False)
    elif mode == SearchMode.FUZZY:
        score = fuzzy_score(F.lit(q), t)
        return score > FUZZY_THRESHOLD, score
    else:
        matched = F.lit(False)
    return matched, F.when(matched, F.lit(1.0)).otherwise(F.lit(0.0))


def is_numeric_cell_expr(col: Column) -> Column:
    """F7: strips ``,$%``, try-casts to double, else digit-ratio > 0.5.
    Parity: use_marker_converter.py:229-248 — including the detail that the
    digit ratio is computed on the ORIGINAL text (only spaces removed)."""
    bare = F.trim(F.translate(col, ",$%", ""))
    parses = bare.try_cast("double").isNotNull() | F.lower(bare).isin(
        "nan", "inf", "-inf", "+inf", "infinity", "-infinity", "+infinity"
    )
    no_space = F.regexp_replace(col, " ", "")
    digits = F.length(F.regexp_replace(no_space, r"[^0-9]", ""))
    # F.when keeps the division unevaluated when the guard fails (ANSI mode
    # would otherwise raise divide-by-zero on empty strings).
    ratio_ok = F.when(
        F.length(no_space) > 0, digits / F.length(no_space) > 0.5
    ).otherwise(F.lit(False))
    return F.when(F.trim(col) == "", F.lit(False)).otherwise(parses | ratio_ok)


def contains_units_expr(col: Column) -> Column:
    """F8: the two unit regexes, case-insensitive.  Java regex accepts these
    patterns unchanged.  Parity: use_marker_converter.py:251-262."""
    paren = r"(?i)\([^)]*(?:mg|kg|mL|g|L|m|cm|mm|°C|°F|%|ppm|ppb|mol|M)\)"
    bare = r"(?i)\b(?:mg|kg|mL|g|L|m|cm|mm)(?:/(?:mg|kg|mL|g|L|m|cm|mm))?\b"
    return col.rlike(paren) | col.rlike(bare)


def title_filter(col: Column, table_title: Optional[str]) -> Column:
    """F3: case-insensitive substring on the table title."""
    if table_title is None:
        return F.lit(True)
    return F.lower(F.coalesce(col, F.lit(""))).contains(table_title.lower())
