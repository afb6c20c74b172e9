"""Synthetic ~sf1 stress run of the heaviest query families (VERDICT r4
item 3). The container only ships testdata up to sf0.1 (~17 MB), so this
tool materializes a 10x replica of the fact tables under
spark-warehouse/sf1x/ (a valid sf_dir: one <table>.parquet per table) and
runs the heavy families once each, printing a BENCH-style JSON line.

Replication with REMAPPED keys (copy i in 0..9):
  orders     o_orderkey*10+i         (o_custkey unchanged: 10x fan-out
                                      onto the same dims, like real growth)
  lineitem   l_orderkey*10+i         (joins stay consistent with orders)
  events     event_id*10+i
  documents  doc_id*10+i; copies i>0 append a ' c<i>' tag to text, so each
             original doc becomes a 10-member NEAR-dup group (not exact) —
             the hard case for MinHash/PPJoin: candidate pairs grow ~45x
             per group, none collapsible by the exact-dup pre-collapse.
  embeddings vec_id*10+i (vectors unchanged; throughput stress, ties OK)
Dims (region nation customer supplier part) are copied as-is — at 100 TB
facts grow, dims don't.

Queries: dedup q36/q122, funnel q132, decontamination q102,
decision-support q92/q137, ANN q131 — plus exact-dedup q34 as the cheap
control. One timed run each (this is a cliff-finder, not a bench; the
per-round bench stays at sf0.1).

Usage: python tools/sf1x_stress.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_computing_final_project_spark.plans import all_queries  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "spark-warehouse", "sf1x")
COPIES = 10
DIMS = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    "q34_exact_dedup",
    "q36_minhash_lsh_dedup",
    "q122_prefix_jaccard",
    "q132_corpus_funnel",
    "q102_decontamination",
    "q92_market_share",
    "q137_local_supplier_volume",
    "q131_int8_cosine_topk",
    "q157_corpus_report_card",
    "q158_dedup_savings",
    "q159_jaccard_threshold_sweep",
    # round-5 continuation families: the ones whose work grows superlinearly
    # in the fact (graph joins, basket pairs) or that carry a global sort
    # (layout simulation) — exactly where a 10x cliff would hide
    "q174_pagerank",
    "q175_triangle_census",
    "q178_basket_rules",
    "q170_zorder_layout",
    "q173_encoding_advisor",
    "q176_pit_training_set",
    "q183_cohort_ltv",
    # round-6 additions: LSH-edge clustering (iterative joins over the 10x
    # pair graph), banded sign-LSH embedding near-dup, the prefix-scan
    # consumers (skyline's distinct-price scan; weighted median's grouped
    # scan), rank fusion, and the Arrow MMR pool path
    "q68_dedup_clusters",
    "q40_embedding_near_dup",
    # round-7 additions: FK audit (7 anti-joins over the 10x facts), the
    # LSH source matrix (rides the pair graph), grouped distributed
    # percentiles (per-group prefix scans), token spectrum (vocab agg)
    "q206_referential_integrity",
    "q208_near_dup_source_matrix",
    "q209_grouped_percentiles",
    "q207_token_freq_spectrum",
    "q194_dedup_weights",
    "q196_skyline_parts",
    "q197_weighted_median",
    "q198_rrf_fusion",
    "q199_mmr_rerank",
    # round-8 additions: weighted interpolated percentiles (two rank joins
    # over the 10x prefix frame), decode-health (Arrow classify over 10x
    # planted blobs), vocab coverage (prefix scan over the 10x vocabulary)
    "q219_weighted_interp_percentiles",
    "q220_decode_health",
    "q221_vocab_coverage",
    # round-9 additions: IVF cell-balance audit (KMeans fit + one keyed
    # aggregate over the 10x embeddings), fertility x quality matrix
    # ((source, band) aggregate over the 10x corpus)
    "q222_ivf_cell_balance",
    "q223_fertility_quality_matrix",
    "q224_segment_calibration",
    "q225_ngram_novelty",
    # round-10 additions: IVF probe top-k (shares the session quantizer
    # fit with q222 — run order pins who pays it), dedup-adjusted budget
    # (CC over the 10x near-dup pair graph + keeper aggregates),
    # decode-health x quality matrix (Arrow classify + 1:1 doc join)
    "q64_ann_ivf_topk",
    "q226_dedup_adjusted_budget",
    "q227_decode_quality_matrix",
    # round-11 additions: the index-eval pair (int8 probe + PQ fit/ADC
    # over the 10x store), the curation scorecard (three corpus passes),
    # and the clean budget (shares q226's session CC labels — marginal
    # cost only, the q222-after-q64 argument)
    "q230_int8_retrieval_ndcg",
    "q231_pq_retrieval_ndcg",
    "q232_curation_scorecard",
    "q233_clean_token_budget",
    # cluster-size histogram: shares q68/q226's session CC labels —
    # marginal cost only (two tiny aggregates after the one build)
    "q234_dedup_cluster_sizes",
    # leak attribution: q102's containment core + two O(sources) aggs
    "q235_benchmark_leak_by_source",
]


def _replicate(df, remap: dict[str, object], n: int = COPIES):
    """Union n copies with per-copy key remaps; a narrow map per copy."""
    out = None
    for i in range(n):
        c = df
        for col, fn in remap.items():
            c = c.withColumn(col, fn(i))
        out = c if out is None else out.unionByName(c)
    return out


def ensure_data(spark, dst: str = DST, copies: int = COPIES) -> None:
    if os.path.exists(os.path.join(dst, "embeddings.parquet")):
        return
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    _replicate(
        orders, {"o_orderkey": lambda i: F.col("o_orderkey") * copies + i}, copies
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    _replicate(
        li, {"l_orderkey": lambda i: F.col("l_orderkey") * copies + i}, copies
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    _replicate(
        ev, {"event_id": lambda i: F.col("event_id") * copies + i}, copies
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    _replicate(
        docs,
        {
            "doc_id": lambda i: F.col("doc_id") * copies + i,
            "text": lambda i: (
                F.col("text") if i == 0 else F.concat(F.col("text"), F.lit(f" c{i}"))
            ),
        },
        copies,
    ).withColumn("n_chars", F.length("text").cast("bigint")).write.mode(
        "overwrite"
    ).parquet(f"{dst}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    _replicate(
        emb, {"vec_id": lambda i: F.col("vec_id") * copies + i}, copies
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def main() -> None:
    spark = get_spark("sf1x-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_data(spark)
    queries = all_queries()
    spark.range(1000).count()  # warmup
    # optional subset: query names after out_json (per-round refreshes
    # re-time only the round's queries; the full list is the r4 record)
    only = set(sys.argv[2:])
    names = [n for n in QUERIES if not only or n in only]
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = queries[name](spark, DST)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "sf1x_stress_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": "sf0.1x10",
    }
    line = json.dumps(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
