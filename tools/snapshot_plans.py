"""Archive every registered query's physical plan for plan-diff review.

Writes ``plans_snapshot/<query>.txt`` (explain mode=formatted, scan paths
normalized so snapshots are SF-independent). Re-run after a refactor and
`git diff plans_snapshot/` shows exactly which physical plans moved —
catching regressions subtler than the assertions in test_plan_shape.py
(a lost broadcast, a new exchange, a widened ReadSchema).

Usage:  python tools/snapshot_plans.py [sf_dir] [out_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing_final_project_spark.plan_text import plan_text  # noqa: E402
from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans_snapshot"
    only = set(sys.argv[3:])  # optional query-name subset
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan_text(df))
            print(f"ok    {name}")
        except Exception as e:
            print(f"ERROR {name}: {e}")


if __name__ == "__main__":
    main()
