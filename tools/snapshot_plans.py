"""Archive every registered query's physical plan for plan-diff review.

Writes ``plans_snapshot/<query>.txt`` (explain mode=formatted, scan paths
normalized so snapshots are SF-independent). Re-run after a refactor and
`git diff plans_snapshot/` shows exactly which physical plans moved —
catching regressions subtler than the assertions in test_plan_shape.py
(a lost broadcast, a new exchange, a widened ReadSchema).

Usage:  python tools/snapshot_plans.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402


def normalize(plan: str) -> str:
    plan = re.sub(r"/root/testdata/sf[0-9.]+", "<SF_DIR>", plan)
    plan = re.sub(r"#\d+L?", "#N", plan)  # expression ids differ run-to-run
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"RDD\[\d+\]", "RDD[N]", plan)  # RDD ids depend on job history
    plan = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", plan)  # session-global counter
    plan = re.sub(r" at \S+:\d+", " at <SITE>:0", plan)  # call-site string is JIT-dependent
    # collected-state literals (e.g. bloom bitmap word arrays) are data-dependent
    plan = re.sub(r"\[[0-9,\- ]{500,}\]", "<LIT_ARRAY>", plan)
    return plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans_snapshot"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(normalize(buf.getvalue()))
            print(f"ok    {name}")
        except Exception as e:
            print(f"ERROR {name}: {e}")


if __name__ == "__main__":
    main()
