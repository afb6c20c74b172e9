"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style terminal action (collect on the
already-aggregated result) so timings measure engine work, not driver
transfer of wide row sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_computing_final_project_spark.plans import all_queries
from big_data_computing_final_project_spark.session import get_spark

# Headline set: one per workload family.
HEADLINE = [
    "q01_pricing_summary",     # scan -> filter -> agg (TPC-H Q1 shape)
    "q02_filter_derive",       # narrow projection w/ derived columns
    "q03_star_join_revenue",   # star join, broadcast dims
    "q06_topk_customers",      # join + agg + global top-k
    "q07_grouped_topk",        # ranking window
    "q13_running_total",       # running-frame window
    "q17_value_counts",        # profiling: group counts + share
    "q22_corr_pairs",          # profiling: single-pass corr matrix
    "q27_tumbling_window",     # event-time window agg
    "q31_token_stats",         # text: tokenize/fingerprint map
    "q36_minhash_lsh_dedup",   # MinHash-LSH near-dup (scale path)
    "q38_cosine_topk",         # embedding similarity brute-force
    "q51_multimodal_decode",   # mapInPandas Arrow path
    "q58_brand_revenue",       # dim join + agg
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: JVM + parquet footer caches, one tiny job
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        # terminal action without shipping wide results to the driver
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
