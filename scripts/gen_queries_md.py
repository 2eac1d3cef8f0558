"""Regenerate QUERIES.md from the catalog REGISTRY.

Usage: python scripts/gen_queries_md.py   (from the repo root)

One row per registered query: name, SURVEY-§2 tags, oracle flag, and the
first sentence-ish of the entry docstring (whitespace-collapsed,
truncated). Run after adding catalog entries so the index never goes
stale relative to the registry.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gramene_mongodb_spark.catalog import REGISTRY  # noqa: E402

HEADER = """# QUERIES — the catalog, indexed

Auto-generated from `gramene_mongodb_spark/catalog.py` (REGISTRY) by
`scripts/gen_queries_md.py`. **Oracle** = DuckDB hash-checked by the
driver at sf0.01. All {n} queries are oracle-backed (the
approximate-sketch entry is differentially gated: exact counts + a
computed within-5% flag the oracle pins to TRUE). Tags reference
SURVEY.md §2 operator ids.

| query | tags | oracle | what it is |
|---|---|---|---|
"""


def main() -> None:
    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        doc = re.sub(r"\s+", " ", (spec.fn.__doc__ or "").strip())
        if len(doc) > 160:
            doc = doc[:157].rstrip() + "..."
        doc = doc.replace("|", "\\|")
        tags = " ".join(spec.tags) or "—"
        oracle = "✓" if spec.oracle else "rows-only"
        rows.append(f"| `{name}` | {tags} | {oracle} | {doc} |")
    out = HEADER.format(n=len(REGISTRY)) + "\n".join(rows) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
