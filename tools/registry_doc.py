"""Render REGISTRY.md: the full query-registry catalog — every entry's
position relative to the driver's 50-row correctness window, its oracle
mode, tags, and the first docstring sentence. Generated from the registry
itself so it can never drift from the code.

Usage: python tools/registry_doc.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from big_data_player_analysis_spark.registry import PRIMARY_ORDER, all_queries


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    # cut at the first sentence end that isn't an abbreviation-ish dot
    m = re.search(r"(?<=[.!?])\s", text)
    s = text[: m.start()] if m else text
    return s if len(s) <= 300 else s[:297] + "..."


def main() -> int:
    specs = all_queries()
    window = set(PRIMARY_ORDER)
    lines = [
        "# REGISTRY — all driver-contract query entries",
        "",
        f"{len(specs)} entries; the driver records correctness rows for the",
        "first 50 (the `window` column — see the rotation policy notes in",
        "`registry/__init__.py`). Entries beyond the window are still",
        "verified every test run by the local DuckDB oracle gate",
        "(tests/test_registry.py). `oracle` = hash-checked ANSI-SQL twin;",
        "`rows-only` = genuinely non-SQL-expressible (iterative",
        "convergence, hash-seeded LSH, engine-specific sketches), checked",
        "for rows+schema and pinned by dedicated property tests instead.",
        "",
        "| # | entry | window | oracle | tags | what it does |",
        "|---|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(specs.items(), 1):
        in_w = "yes" if name in window else ""
        mode = "oracle" if spec.sql else "rows-only"
        tags = " ".join(t for t in spec.tags if t != "bench")
        desc = first_sentence(spec.fn.__doc__)
        lines.append(f"| {i} | {name} | {in_w} | {mode} | {tags} | {desc} |")
    lines.append("")
    with open("/root/repo/REGISTRY.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote REGISTRY.md ({len(specs)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
