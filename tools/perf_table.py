"""Regenerate the PERF.md per-query min table from bench JSON files.

    python tools/perf_table.py /tmp/bench3.json /tmp/bench4.json ...

Prints the two-column markdown table (per-query minimum across the given
runs, sorted descending) plus the total and single-run range — paste into
PERF.md's "Complete per-query table" section.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        raise SystemExit("usage: perf_table.py bench1.json [bench2.json ...]")
    mins: dict[str, float] = {}
    for r in runs:
        for q, s in r["queries"].items():
            # bench.py writes -1.0 for a query that raised; a sentinel
            # must never poison the min or shrink the total
            if isinstance(s, (int, float)) and s > 0:
                mins[q] = min(mins.get(q, float("inf")), s)
    items = sorted(mins.items(), key=lambda kv: -kv[1])
    total = sum(mins.values())
    singles = [r["value"] for r in runs]
    print(
        f"{len(mins)} queries, total of per-query minimums **{total:.1f} s** "
        f"(single full runs {min(singles):.1f}-{max(singles):.1f} s)."
    )
    print()
    print("| query | s | query | s |")
    print("|---|---|---|---|")
    half = (len(items) + 1) // 2
    for i in range(half):
        l = items[i]
        cells = [f"`{l[0]}` | {l[1]:.2f}"]
        if i + half < len(items):
            r = items[i + half]
            cells.append(f"`{r[0]}` | {r[1]:.2f}")
        else:
            cells.append(" | ")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
