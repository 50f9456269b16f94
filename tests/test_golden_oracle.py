"""Golden-parquet staleness guard: the committed golden tables under
``golden/`` must equal what the current kernel produces over the current
corpus — otherwise every parse-surface oracle in __spark_entry__.py would be
comparing Spark against an outdated oracle.

Regenerate with ``python scripts/build_golden.py`` after any kernel or
corpus change.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import build_golden  # noqa: E402

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_golden_matches_kernel(sf_dir):
    tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(REPO, "golden", tag)
    assert os.path.isdir(out_dir), "run scripts/build_golden.py"

    spans, tables, cells, merged, media = build_golden.build_rows(
        build_golden.extraction_corpus(sf_dir)
    )
    fresh = {
        "spans.parquet": (spans, build_golden.SPANS_SCHEMA),
        "tables.parquet": (tables, build_golden.TABLES_SCHEMA),
        "cells.parquet": (cells, build_golden.CELLS_SCHEMA),
        "merged_spans.parquet": (merged, build_golden.MERGED_SCHEMA),
        "media.parquet": (media, build_golden.MEDIA_SCHEMA),
    }
    import pyarrow as pa

    for fname, (rows, schema) in fresh.items():
        committed = pq.read_table(os.path.join(out_dir, fname))
        rebuilt = pa.Table.from_pylist(rows, schema=schema)
        assert committed.schema.equals(rebuilt.schema), f"{tag}/{fname} schema stale"
        assert committed.equals(rebuilt), f"{tag}/{fname} stale — rerun scripts/build_golden.py"
