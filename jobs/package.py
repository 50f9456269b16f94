"""Build the --py-files zip for spark-submit: `python jobs/package.py`
writes dist/document_parser_spark.zip containing the package."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(REPO, "dist", "document_parser_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    pkg_root = os.path.join(REPO, "document_parser_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in base:
                continue
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(base, fname)
                    zf.write(full, os.path.relpath(full, REPO))
    return dest


if __name__ == "__main__":
    print(build())
