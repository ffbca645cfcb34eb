"""Physical-plan audit over every registered query.

For each `queries()` entry, inspects the executed plan and reports:

  * scans        — number of parquet scans, and whether each prunes
                   columns (ReadSchema narrower than the table) and/or
                   pushes filters (`PushedFilters: [...]` non-empty when
                   the query filters on scan columns)
  * exchanges    — shuffle count (Exchange hashpartitioning / rangepartitioning /
                   SinglePartition), excluding broadcast exchanges
  * python       — Arrow/batch Python operator count (the slow path;
                   should be exactly the set SURVEY.md declares
                   irreducible)

Output: markdown table on stdout — redirect into PLAN_AUDIT_r{N}.md.
This is the mechanized version of `.explain("formatted")` review: a
query whose plan regresses (new shuffle, Python creeping in, scan
reading all columns) shows up as a diff in the audit table.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

REPO = "/root/repo"
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from cdk_dynamodb_cdc_spark.session import engine_env, get_spark  # noqa: E402


def audit(plan: str) -> dict[str, object]:
    scans = plan.count("FileScan parquet")
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    shuffles = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
        + plan.count("Exchange RoundRobinPartitioning")
    )
    broadcasts = plan.count("BroadcastExchange")
    python = len(
        re.findall(
            r"ArrowEvalPython|BatchEvalPython|MapInPandas"
            r"|FlatMapGroupsInPandas|ArrowAggregatePython"
            r"|AggregateInPandas|PythonUDTF",
            plan,
        )
    )
    read_cols = [
        len(s.split(","))
        for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    return {
        "scans": scans,
        "pushed_filter_scans": pushed,
        "shuffles": shuffles,
        "broadcasts": broadcasts,
        "python_ops": python,
        "scan_cols": read_cols,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    print(f"Environment: {engine_env(spark)}\n")
    rows = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit(plan)
            rows.append((name, a))
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((name, {"error": f"{type(exc).__name__}: {exc}"}))
    print("| query | scans | pushed | shuffles | bcast | python | scan cols |")
    print("|---|---|---|---|---|---|---|")
    for name, a in rows:
        if "error" in a:
            print(f"| {name} | ERROR: {a['error']} ||||||")
            continue
        cols = ",".join(str(c) for c in a["scan_cols"])
        print(
            f"| {name} | {a['scans']} | {a['pushed_filter_scans']} "
            f"| {a['shuffles']} | {a['broadcasts']} | {a['python_ops']} "
            f"| {cols} |"
        )
    total_python = sum(
        a.get("python_ops", 0) for _, a in rows if "error" not in a
    )
    print(f"\nTotal Python operators across all plans: {total_python}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
