#!/usr/bin/env python
"""Regenerate CATALOG.md: the full query inventory, one line per
catalog entry (name, oracle kind, first docstring line), generated from
``catalog.QUERIES`` itself so it cannot drift from the code.

Usage: python scripts/dump_catalog.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ayeaye_spark.catalog import ORACLES, QUERIES, _WINDOW_ORDER  # noqa: E402

NO_ORACLE_KIND = {
    "events_approx_distinct_users": "sketch (exact twin: events_distinct_users_exact)",
    "lineitem_price_quantiles": "sketch (exact twin: lineitem_price_quartiles_exact)",
    "events_heavy_users_approx": "sketch (exact twin: events_heavy_users_exact)",
    "events_stream_hourly_counts": "streaming drain (batch twin pinned in tests)",
    "events_stream_sessions": "streaming drain (batch twin pinned in tests)",
    "events_stream_exactly_once_dedup": "streaming drain (batch twin pinned in tests)",
    "events_stream_trending": "streaming drain (batch twin pinned in tests)",
}


def first_doc_line(fn) -> str:
    doc = (fn.__doc__ or "").strip().split("\n")
    line = doc[0].strip()
    # shared_sql closures carry no docstring — derive from the name
    return line or "(shared ANSI SQL — one text, both engines)"


def main() -> None:
    window = set(_WINDOW_ORDER)
    lines = [
        "# Query catalog",
        "",
        f"{len(QUERIES)} queries; {len(ORACLES)} carry a value-exact DuckDB",
        "oracle, the rest are approximate-by-design or streaming drains with",
        "pinned exact/batch twins (noted per row).  The first 50 insertion-",
        "order entries (marked ▣) are the driver's hard-check window",
        "(`catalog._WINDOW_ORDER`).  Regenerate with",
        "`python scripts/dump_catalog.py`.",
        "",
        "| # | query | oracle | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        mark = "▣ " if name in window else ""
        kind = "exact" if name in ORACLES else NO_ORACLE_KIND.get(name, "rows-only")
        lines.append(f"| {i} | {mark}`{name}` | {kind} | {first_doc_line(fn)} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "CATALOG.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
