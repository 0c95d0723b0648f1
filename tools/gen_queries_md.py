"""Regenerate QUERIES.md from the live query registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from files_kraken_spark.queries import REGISTRY


def main() -> None:
    lines = [
        "# QUERIES — the t2 registry catalog",
        "",
        "Auto-generated from `files_kraken_spark/queries/` "
        "(`python tools/gen_queries_md.py`). "
        f"{len(REGISTRY)} queries: "
        f"{sum(1 for s in REGISTRY.values() if s.oracle)} DuckDB-oracle-checked, "
        f"{sum(1 for s in REGISTRY.values() if not s.oracle)} rows-only "
        "(non-SQL-expressible).",
        "",
        "| query | oracle | description |",
        "|---|---|---|",
    ]
    for name, spec in sorted(REGISTRY.items()):
        doc = " ".join(spec.doc.split())
        lines.append(f"| `{name}` | {'✓' if spec.oracle else 'rows-only'} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(REGISTRY)} entries to {out}")


if __name__ == "__main__":
    main()
