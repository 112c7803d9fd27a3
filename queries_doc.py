#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run at round close).

One row per registered query: name, oracle presence, and the first
docstring paragraph (the operator's contract, maintained at the code)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))


def first_paragraph(doc: str | None) -> str:
    if not doc:
        return ""
    para = doc.strip().split("\n\n", 1)[0]
    return re.sub(r"\s+", " ", para).strip().replace("|", "\\|")


def main() -> None:
    from anglerfish_spark.registry import all_queries

    qs = all_queries()
    groups: dict[str, list[str]] = {}
    for name, qd in sorted(qs.items()):
        groups.setdefault(qd.group, []).append(name)

    lines = [
        "# QUERIES — registered operator inventory",
        "",
        f"{len(qs)} registered queries, each a `queries()` entry in the driver",
        "contract; **oracle** = has a DuckDB `oracle_sql()` entry (value-hash",
        "checked at sf0.01).  Generated from `anglerfish_spark.registry`",
        "docstrings — regenerate with `python queries_doc.py`.",
    ]
    for group in sorted(groups):
        names = groups[group]
        lines += ["", f"## {group} ({len(names)})", "", "| query | oracle | what it does |", "|---|---|---|"]
        for name in names:
            qd = qs[name]
            mark = "✓" if qd.oracle is not None else "—"
            lines.append(f"| `{name}` | {mark} | {first_paragraph(qd.fn.__doc__)} |")
    lines += [""]
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"QUERIES.md: {len(qs)} queries, {len(groups)} groups")


if __name__ == "__main__":
    main()
