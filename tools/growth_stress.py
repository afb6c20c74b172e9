"""Two-point scaling record for the heaviest query families (VERDICT r6
item 9): run each at a 10x and a 30x replica of sf0.1 and record the
wall-clock growth factor together with the OUTPUT growth factor.

Raw time ratios alone mislead here: the replica construction turns every
document into a near-dup group of size = copies, so the ANSWER of the
dedup families grows ~quadratically in copies by design —
C(30,2)/C(10,2) = 9.67x more true pairs for 3x more docs. The honest
scaling statistic is the log-log slope of time vs INPUT when the output
is input-proportional (graph queries), and time vs OUTPUT when the
output itself is super-linear (pair-emitting dedup): an engine is
scale-safe when time grows no faster than max(input, output).

Emits one JSON object per query:
  t10/t30        wall seconds at each tier (same session, warm JVM)
  rows10/rows30  output row counts
  time_factor    t30/t10             (ideal 3.0 for linear-in-input)
  out_factor     rows30/rows10       (1.0 when output is tier-invariant)
  slope_input    ln(time_factor)/ln(3)   — <~1.2 = sub-quadratic in input
  slope_work     ln(time_factor)/ln(max(3, out_factor))
                 — time vs the irreducible work floor; <=1 means the
                 engine tracks output size, the best possible shape

Usage: python tools/growth_stress.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402
from sf1x_stress import DST as DST10  # noqa: E402
from sf1x_stress import ensure_data  # noqa: E402

DST30 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    "sf3x",
)

# the five heaviest by the r6 10x stress, per the verdict's list
QUERIES = [
    "q122_prefix_jaccard",
    "q36_minhash_lsh_dedup",
    "q174_pagerank",
    "q175_triangle_census",
    "q68_dedup_clusters",
    # round-7 families whose work could grow with pairs or groups
    "q206_referential_integrity",
    "q208_near_dup_source_matrix",
    "q209_grouped_percentiles",
]


def _run(queries, name: str, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    df = queries[name](spark, sf_dir)
    n = df.count()
    return round(time.time() - t0, 3), n


if __name__ == "__main__":
    spark = get_spark("growth-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_data(spark, DST10, 10)
    ensure_data(spark, DST30, 30)
    queries = all_queries()
    spark.range(1000).count()  # warmup
    out: dict[str, dict] = {}
    for name in QUERIES:
        t10, r10 = _run(queries, name, DST10)
        t30, r30 = _run(queries, name, DST30)
        tf = t30 / t10
        of = r30 / max(1, r10)
        out[name] = {
            "t10": t10,
            "t30": t30,
            "rows10": r10,
            "rows30": r30,
            "time_factor": round(tf, 3),
            "out_factor": round(of, 3),
            "slope_input": round(math.log(tf) / math.log(3.0), 3),
            "slope_work": round(math.log(tf) / math.log(max(3.0, of)), 3),
        }
        print(name, json.dumps(out[name]))
    line = json.dumps(
        {"metric": "growth_stress_10x_vs_30x", "tiers": [10, 30], "queries": out}
    )
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    print(line)
