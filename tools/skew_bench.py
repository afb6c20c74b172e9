"""Measured straggler-relief benchmark for the skew escapes (VERDICT r4
item 2): make the 100 TB claims of operators/skew.py and plans/scale.py
(q77/q78/q148) falsifiable with task-level numbers on planted-zipf data,
instead of plan-shape assertions alone.

Data (generated once under spark-warehouse/skewbench/, ~10x the sf0.1
lineitem row count):
  fact.parquet   16M rows (k bigint, id bigint, v bigint) — key 0 holds
                 ~20% of all rows; the other 12.8M rows spread uniformly
                 over 100k keys. v = id (all-distinct, so distinct-style
                 aggregation has real per-key volume).
  build.parquet  100k rows (k, attr) — the unbroadcastable-ish join side
                 (broadcast is force-disabled during join runs to model
                 "both sides too big to broadcast").

Runs (each wall-timed; per-stage task-time quantiles pulled from the
Spark UI REST API so the straggler shows up as max/median task time):
  join_plain_noaqe  fact ⋈ build, AQE off       — the canonical straggler
  join_plain_aqe    fact ⋈ build, AQE skew-join — what AQE fixes by itself
  join_salted       operators/skew.salted_join, AQE off — the explicit
                    escape for hash joins / known-ahead skew
  agg_collect_set   groupBy(k).size(collect_set(v)) — holistic agg whose
                    hot-key merge concentrates on one reducer
  agg_two_phase     distinct(k,v) -> count per k — q77's reformulation
  agg_builtin_distinct  groupBy(k).countDistinct(v) — Spark's Expand
                    rewrite (two-phase internally; should track q77)
  agg_plain_sum     groupBy(k).sum(v) — algebraic: map-side partial
                    aggregation absorbs the hot key with NO salt; measured
                    to document why q78-style salting is reserved for
                    merge-exact/holistic cases

Correctness on the planted data is asserted inline (salted == plain join
checksums; all three distinct variants equal), re-running the salted==
plain pin on data 80x larger than the pytest fixture.

Usage: python tools/skew_bench.py [out_json]   (default: prints JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_computing_final_project_spark.operators.skew import salted_join  # noqa: E402
from big_data_computing_final_project_spark.session import get_spark  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "spark-warehouse", "skewbench")
N_FACT = 16_000_000
HOT_SHARE = 0.20
N_KEYS = 100_000


def ensure_data(spark) -> None:
    fact_path = os.path.join(DATA_DIR, "fact.parquet")
    build_path = os.path.join(DATA_DIR, "build.parquet")
    if os.path.exists(fact_path) and os.path.exists(build_path):
        return
    n_hot = int(N_FACT * HOT_SHARE)
    # hot rows: key 0; rest: deterministic uniform spread over keys 1..N_KEYS
    rows = spark.range(N_FACT)
    k = F.when(
        F.col("id") < n_hot, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1)
    rows.select(k.alias("k"), "id", F.col("id").alias("v")).write.mode(
        "overwrite"
    ).parquet(fact_path)
    spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
    ).write.mode("overwrite").parquet(build_path)


def _stages_after(spark, min_stage_id: int) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        if s["stageId"] < min_stage_id:
            continue
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0"
            ) as r:
                q = json.load(r)
            dur = q.get("executorRunTime") or q.get("duration")
        except Exception:
            dur = None
        if dur:
            out.append(
                {
                    "stage": s["stageId"],
                    "tasks": s.get("numCompleteTasks"),
                    "min_ms": dur[0],
                    "med_ms": dur[1],
                    "max_ms": dur[2],
                }
            )
    return out


def _next_stage_id(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages"
    ) as r:
        stages = json.load(r)
    return 1 + max((s["stageId"] for s in stages), default=-1)


def measure(spark, name: str, df_builder, results: dict) -> tuple:
    """Run df_builder() -> DataFrame, time the checksum action, attach the
    straggler stats of the heaviest new stage; returns (row count, order-
    insensitive bit_xor hash) for cross-variant equality assertions."""
    t0 = time.time()
    df = df_builder()
    cols = ", ".join(sorted(df.columns))
    checksum = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64(concat_ws('|', {cols})))").alias("h"),
    )
    mark = _next_stage_id(spark)
    row = checksum.first()
    wall = round(time.time() - t0, 3)
    stages = _stages_after(spark, mark)
    heavy = max(stages, key=lambda s: s["max_ms"], default=None) if stages else None
    results[name] = {
        "wall_sec": wall,
        "rows": row["n"],
        "hash": row["h"],
        "heaviest_stage": heavy,
        "straggler_ratio": (
            round(heavy["max_ms"] / max(heavy["med_ms"], 1), 2) if heavy else None
        ),
    }
    return row["n"], row["h"]


def main() -> None:
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_data(spark)
    fact = spark.read.parquet(os.path.join(DATA_DIR, "fact.parquet"))
    build = spark.read.parquet(os.path.join(DATA_DIR, "build.parquet"))
    # warm the page cache + parquet footers so the first measured variant
    # doesn't pay the cold scan the others skip
    fact.count()
    build.count()
    results: dict = {}

    def conf(aqe: bool, broadcast: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760" if broadcast else "-1"
        )

    # --- joins: plain (no AQE) vs AQE skew-join vs explicit salt ---------
    conf(aqe=False, broadcast=False)
    plain = measure(
        spark, "join_plain_noaqe", lambda: fact.join(build, "k"), results
    )
    conf(aqe=True, broadcast=False)
    aqe = measure(spark, "join_plain_aqe", lambda: fact.join(build, "k"), results)
    conf(aqe=False, broadcast=False)
    salted = measure(
        spark,
        "join_salted",
        lambda: salted_join(fact, build, ["k"], n_salts=32, salt_from="id"),
        results,
    )
    assert plain == aqe == salted, (
        "salted/plain join results diverge on planted skew",
        plain,
        aqe,
        salted,
    )

    # --- aggregation: holistic vs two-phase vs builtin vs algebraic ------
    conf(aqe=False, broadcast=True)
    hol = measure(
        spark,
        "agg_collect_set",
        lambda: fact.groupBy("k").agg(
            F.size(F.collect_set("v")).cast("bigint").alias("ndv")
        ),
        results,
    )
    two = measure(
        spark,
        "agg_two_phase",
        lambda: fact.select("k", "v")
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("ndv")),
        results,
    )
    builtin = measure(
        spark,
        "agg_builtin_distinct",
        lambda: fact.groupBy("k").agg(F.countDistinct("v").alias("ndv")),
        results,
    )
    assert hol == two == builtin, (
        "distinct-aggregation variants diverge",
        hol,
        two,
        builtin,
    )
    measure(
        spark,
        "agg_plain_sum",
        lambda: fact.groupBy("k").agg(F.sum("v").alias("s")),
        results,
    )
    conf(aqe=True, broadcast=True)

    out = {
        "n_fact": N_FACT,
        "hot_share": HOT_SHARE,
        "n_keys": N_KEYS,
        "results": results,
    }
    line = json.dumps(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
