"""Physical-plan audit over the whole query registry.

For every ``queries()`` entry, builds the DataFrame at a small scale factor
and inspects ``explain("formatted")`` output for the plan features that
decide 100 TB behavior:

- ``exchanges``    — shuffle count (every one is a full-data network pass)
- ``bhj``/``smj``  — broadcast-hash vs sort-merge join counts
- ``bnlj``/``cart``— BroadcastNestedLoopJoin / CartesianProduct (red flags
                     unless one side is provably tiny, e.g. a broadcast
                     query vector)
- ``python``       — Arrow-batched Python nodes (mapInPandas /
                     applyInPandas / pandas_udf); row-at-a-time
                     BatchEvalPython is reported separately as a red flag
- ``pushed``       — parquet scans carrying PushedFilters
- ``wsc``          — WholeStageCodegen span count

Output: a markdown table to stdout (redirect to PLANS.md). Queries whose
builders execute side-effect work (streaming demos) still return a final
DataFrame — the audit explains that frame; the builder's internal runs are
already plan-pinned by tests/test_plans.py et al.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

DEFAULT_SF = "/root/testdata/sf0.001"


def count(pat: str, s: str) -> int:
    return len(re.findall(pat, s))


def audit_one(name, fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return {
        "exchanges": count(r"\bExchange\b", plan),
        "bhj": count(r"BroadcastHashJoin", plan),
        "smj": count(r"SortMergeJoin", plan),
        "bnlj": count(r"BroadcastNestedLoopJoin", plan),
        "cart": count(r"CartesianProduct", plan),
        "arrow_py": count(
            r"MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|"
            r"ArrowEvalPython|MapInArrow|PythonMapInArrow", plan
        ),
        "row_py": count(r"BatchEvalPython", plan),
        "pushed": count(r"PushedFilters: \[[^\]]", plan),
        "wsc": count(r"WholeStageCodegen", plan),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and not args[0].startswith("q") else DEFAULT_SF
    only = {a for a in args if a.startswith("q")}

    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.session import (
        get_spark,
    )

    spark = get_spark("plan_audit", shuffle_partitions=8)
    rows, errors = [], []
    for name, fn in sorted(se.queries().items()):
        if only and name not in only:
            continue
        try:
            rows.append((name, audit_one(name, fn, spark, sf_dir)))
        except Exception as e:  # noqa: BLE001 — audit must survive one bad query
            errors.append((name, repr(e)[:120]))

    print(f"# Physical-plan audit ({sf_dir}, {len(rows)} queries)")
    print()
    print("Red flags: `row_py` (row-at-a-time Python), `cart` (cartesian),")
    print("`bnlj` (nested-loop join — acceptable only vs a tiny broadcast")
    print("side such as a single query vector or a bound-range frame).")
    print()
    print("| query | exchanges | bhj | smj | bnlj | cart | arrow_py | row_py | pushed scans | wsc |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name, a in rows:
        print(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | "
            f"{a['bnlj']} | {a['cart']} | {a['arrow_py']} | {a['row_py']} | "
            f"{a['pushed']} | {a['wsc']} |"
        )
    flag = [
        (n, a) for n, a in rows if a["row_py"] or a["cart"] or a["bnlj"]
    ]
    print()
    print(f"## Flagged ({len(flag)})")
    for n, a in flag:
        kinds = [k for k in ("row_py", "cart", "bnlj") if a[k]]
        print(f"- {n}: {', '.join(kinds)}")
    if errors:
        print()
        print("## Builder errors")
        for n, e in errors:
            print(f"- {n}: {e}")


if __name__ == "__main__":
    main()
