"""Generate PLAN_REPORT.md: one row per conformance query with the
mechanical plan-quality facts (exchanges, scans, Python stages,
broadcast joins) extracted from the final AQE physical plan at
sf0.001 — each query is actually executed (noop-format write) before
the plan is read, so runtime re-plans (broadcast conversions,
coalesced exchanges, skew splits) are reflected.

This is the at-a-glance evidence behind PLANS.md's prose: a query
whose exchange count silently grows in a refactor shows up as a diff
in a committed artifact, not just a slower bench line.

Usage: PYTHONPATH=. python tools/plan_report.py > PLAN_REPORT.md
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

PY_MARKERS = (
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "PythonMapInArrow",
)


def main() -> None:
    import __spark_entry__ as e
    from open_energy_data_server_spark.session import get_spark

    spark = get_spark(app_name="plan-report")
    rows = []
    for name, fn in sorted(e.queries().items()):
        df = fn(spark, SF_DIR)
        # run the query so AQE finalizes the plan (runtime broadcast
        # conversions / coalesced exchanges show up, initial-plan
        # guesses don't); noop format = full execution, nothing written
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # count per-line so a ReusedExchange reference (which repeats
        # the reused subtree header in some renderings) is not counted
        # as a second physical shuffle; dedupe identical lines because
        # a persisted InMemoryRelation prints its cached child plan
        # under EVERY InMemoryTableScan that references it (same
        # expression ids → identical lines) while executing it once
        seen: set[str] = set()
        lines = []
        for ln in plan.splitlines():
            key = ln.strip()
            if "ReusedExchange" in ln or key in seen:
                continue
            seen.add(key)
            lines.append(ln)
        n_ex = sum(
            1
            for ln in lines
            if "Exchange hashpartitioning" in ln
            or "Exchange rangepartitioning" in ln
            or "Exchange SinglePartition" in ln
        )
        rows.append(
            (
                name,
                n_ex,
                sum(1 for ln in lines if "BroadcastExchange" in ln),
                sum(1 for ln in lines if "FileScan" in ln),
                sum(1 for ln in lines for m in PY_MARKERS if m in ln),
                "yes" if "WindowGroupLimit" in plan else "",
            )
        )
    print("# PLAN REPORT — mechanical plan-quality facts per query")
    print()
    print("Extracted from the final AQE physical plan after executing")
    print("each query at sf0.001")
    print("(`tools/plan_report.py`). `shuffles` counts hash/range/single-")
    print("partition exchanges (broadcasts listed separately — they ship")
    print("dims/scalars, not data); `py` counts Arrow/Python stages (only")
    print("the two documented seams may be non-zero); `wgl` marks top-k")
    print("plans where WindowGroupLimit prunes below the exchange.")
    print()
    print("| query | shuffles | broadcasts | scans | py | wgl |")
    print("|---|---|---|---|---|---|")
    for name, ex, bc, sc, py, wgl in rows:
        print(f"| `{name}` | {ex} | {bc} | {sc} | {py} | {wgl} |")
    tot_py = sum(r[4] for r in rows)
    print()
    print(
        f"{len(rows)} queries; {sum(1 for r in rows if r[1] == 0)} plan with "
        f"ZERO shuffles; {tot_py} Python stages total (the documented "
        "multimodal-decode and cubic-spline seams, plus the round-10 "
        "exact-arithmetic Arrow kernels of operators/vecexact.py and "
        "operators/textkernel.py — each pinned bit-identical to its "
        "relational form by tests/test_vecexact.py / "
        "tests/test_textkernel.py)."
    )


if __name__ == "__main__":
    main()
