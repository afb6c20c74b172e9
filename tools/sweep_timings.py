"""Timing sweep across ALL registered queries (not just bench.py's
headline set) — the profiling loop behind perf work. Prints one line per
query (warm best-of-2, noop sink) sorted slowest-first, plus the total.

Usage:  python tools/sweep_timings.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # warmup

    timings: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            timings[name] = best
        except Exception as e:  # keep sweeping; surface the break
            print(f"ERROR {name}: {e}")
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.2f}s  {name}")
    print(f"{sum(timings.values()):8.2f}s  TOTAL ({len(timings)} queries)")


if __name__ == "__main__":
    main()
