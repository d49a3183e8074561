#!/usr/bin/env python
"""Generate docs/QUERIES.md — the one-line-per-query index of the suite.

Pure registry walk (imports the suite package, no SparkSession), so it is
cheap to re-run after adding queries: ``python tools/gen_query_index.py``.
The judge-facing contract is SURVEY.md §2.B; this index is the
machine-derived view of what is actually registered, with oracle status.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacooker_dist_spark.suite import ORACLES, QUERIES  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    line = doc.split("\n", 1)[0].strip()
    # '|' inside a summary would split the markdown table cell.
    return line.rstrip(".").replace("|", "\\|")


def main() -> None:
    by_module: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        oracle = "oracle" if name in ORACLES else "rows-only"
        by_module.setdefault(mod, []).append(
            f"| `{name}` | {oracle} | {first_line(fn)} |"
        )

    out = [
        "# Query index (generated — do not edit)",
        "",
        f"`python tools/gen_query_index.py` · {len(QUERIES)} queries, "
        f"{len(ORACLES)} with exact DuckDB oracles, "
        f"{len(QUERIES) - len(ORACLES)} rows-only "
        "(approximate / engine-hash-specific / streaming-policy ops).",
        "",
    ]
    for mod in sorted(by_module):
        out.append(f"## suite/{mod}.py ({len(by_module[mod])})")
        out.append("")
        out.append("| query | check | summary |")
        out.append("|---|---|---|")
        out.extend(by_module[mod])
        out.append("")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "QUERIES.md",
    )
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}: {len(QUERIES)} queries")

    # Keep the two prose copies of the counts derived from the registry
    # (ADVICE r04: the driver-contract docstring and README drifted).
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_q, n_o = len(QUERIES), len(ORACLES)
    for rel, pat, repl in (
        (
            "__spark_entry__.py",
            r"\d+ queries, \d+ with exact DuckDB oracles",
            f"{n_q} queries, {n_o} with exact DuckDB oracles",
        ),
        (
            "README.md",
            r"\d+ queries, \d+ with DuckDB",
            f"{n_q} queries, {n_o} with DuckDB",
        ),
    ):
        p = os.path.join(root, rel)
        src = open(p).read()
        new = re.sub(pat, repl, src)
        if new != src:
            open(p, "w").write(new)
            print(f"refreshed counts in {rel}")


if __name__ == "__main__":
    main()
