"""Rewrite __spark_entry__._DRIVER_PRIORITY from the driver's own
correctness artifacts: names with NO row in any CORRECTNESS_r*.json
lead (they have never been driver-checked), then every checked name
ordered oldest-latest-green first — so the driver's 50-slot window
always covers the never-checked set plus the stalest rows, and no row
ages past ~2 rounds (round-5 verdict bookkeeping items #1/#3).

``--lead name1,name2,...`` puts the given queries FIRST (before the
never-checked set): an optimization round must land its CHANGED
queries inside the driver's 50-slot correctness window, or the round's
rewrites ship driver-unchecked (round-10 verdict item #2).

Usage (repo root, start of each round):
    PYTHONPATH=. python tools/rotate_driver_priority.py [--dry-run] \
        [--lead q_a,q_b,...]
"""

from __future__ import annotations

import argparse
import glob
import json
import re

ENTRY = "__spark_entry__.py"
BEGIN = "_DRIVER_PRIORITY = ["
END = "]"


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            d = json.load(fh)
        rows = d if isinstance(d, list) else d.get(
            "results", d.get("queries", d)
        )
        items = (
            rows.items()
            if isinstance(rows, dict)
            else [(r.get("name") or r.get("query"), r) for r in rows]
        )
        for name, _ in items:
            if name:
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--lead", default="", help="comma-separated names to place first")
    args = ap.parse_args()

    from open_energy_data_server_spark.queries import QUERIES

    lead = [q for q in args.lead.split(",") if q]
    unknown = [q for q in lead if q not in QUERIES]
    if unknown:
        raise SystemExit(f"--lead names not registered: {unknown}")
    latest = latest_rounds()
    never = [q for q in QUERIES if q not in latest and q not in lead]
    reg_idx = {q: i for i, q in enumerate(QUERIES)}
    checked = sorted(
        (q for q in QUERIES if q in latest and q not in lead),
        key=lambda q: (latest[q], reg_idx[q]),
    )
    ordered = lead + never + checked
    cur_round = max(latest.values(), default=0)

    lines = [BEGIN]
    if lead:
        lines.append("    # changed this round (--lead): driver must re-check")
        lines += [f'    "{q}",' for q in lead]
    if never:
        lines.append("    # never driver-checked (no CORRECTNESS_r* row)")
        lines += [f'    "{q}",' for q in never]
    lines.append(
        f"    # checked names, stalest latest-green first (as of r{cur_round:02d})"
    )
    lines += [f'    "{q}",  # r{latest[q]}' for q in checked]
    lines.append(END)
    block = "\n".join(lines)

    src = open(ENTRY).read()
    start = src.index(BEGIN)
    end = src.index("\n]", start) + 2
    new = src[:start] + block + src[end:]
    n_window = min(50, len(ordered))
    print(
        f"{len(never)} never-checked lead; window of 50 then covers "
        f"{max(0, n_window - len(never))} stalest rows "
        f"(oldest latest-green: r{latest[checked[0]] if checked else '-'})"
    )
    if args.dry_run:
        print(block[:800])
        return
    with open(ENTRY, "w") as fh:
        fh.write(new)
    print(f"rewrote {ENTRY}")


if __name__ == "__main__":
    main()
