"""Core-scaling evidence at a tier where core count can actually show
(VERDICT r11 item 7 / "Next round" 7).

At sf0.1 under the bench's warmup+min-of-2 timing, every query is
fixed-overhead-bound (job scheduling, codegen, cached re-reads): the
driver's 8-core record ran as fast as the 32-core one for nearly every
query (PERF_r11 scaling 0.50-1.44), so "is any operator serial?" is
unanswerable from that block. This tool times a documented
scan/compute-bound subset COLD (one run each, no warmup pass beyond JVM
start) on the synthetic 10x replica the stress harness already builds
(tools/sf1x_stress.ensure_data — ~170 MB of facts), where task work
dominates overheads. Run it at two core counts and compare:

    SPARK_GRAFT_CPUS=32 python tools/scaling_heavy.py tools/scaling_heavy_r12_c32.json
    SPARK_GRAFT_CPUS=8  python tools/scaling_heavy.py tools/scaling_heavy_r12_c8.json

Embarrassingly-parallel queries (scan+agg, per-row compute) should show
time(8) / time(32) well above 1 and approaching min(4, data-parallelism);
a ratio ~1 at THIS tier would flag a genuinely serial operator.

The subset (one per parallel-work family, deliberately small — this is a
scaling probe, not a bench):
  q01_pricing_summary   scan + filter + partial agg (scan/latency-bound —
                        the honest control: expected ratio ~1 at this tier)
  q36_minhash_lsh_dedup  tokenize + minhash banding (CPU + shuffle)
  q122_prefix_jaccard   PPJoin prefix-filter + verify (facts-driven CPU —
                        the embarrassingly-parallel probe)
  q131_int8_cosine_topk  quantized vector math (CPU, small data)
  q209_grouped_percentiles  per-group prefix scans (shuffle + window)

(q93 was in the first cut and measured flat at any core count — its
pair work is driven by the supplier/customer DIMS, which the replica
deliberately does not grow; replaced by q122, whose verify work grows
with the replicated fact.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402
from sf1x_stress import DST, ensure_data  # noqa: E402

QUERIES = [
    "q01_pricing_summary",
    "q36_minhash_lsh_dedup",
    "q122_prefix_jaccard",
    "q131_int8_cosine_topk",
    "q209_grouped_percentiles",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scaling-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_data(spark)
    qs = all_queries()
    spark.range(1000).count()  # JVM warm
    timings = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scaling-heavy {name}")
        t0 = time.time()
        qs[name](spark, DST).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    rec = {
        "metric": "heavy_scaling_cold_wall_clock",
        "cpus": int(cpus),
        "tier": "sf1x_replica_10x_sf0.1",
        "unit": "sec",
        "value": round(sum(timings.values()), 3),
        "queries": timings,
    }
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
