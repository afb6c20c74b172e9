"""Semantic pins for the warehouse-maintenance family (plans/cdc.py).

The oracle-parity test already hash-matches all three queries against
DuckDB; these tests pin the MERGE SEMANTICS themselves — the properties a
hash match alone wouldn't explain to a reader: no-op updates must not
version, latest-wins must actually pick the highest sequence, EWMA must
equal an independently computed weighted mean.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


# ---------------------------------------------------------------------------
# q163 SCD2 merge
# ---------------------------------------------------------------------------


def test_scd2_planted_noops_stay_single_version(spark, sf_dir):
    """custkey % 11 == 0 updates are planted no-ops (incoming == current):
    a correct merge leaves them as ONE open seed version."""
    out = _Q["q163_scd2_merge"](spark, sf_dir)
    noop = out.filter((F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") < 10_000_000))
    per_key = noop.groupBy("c_custkey").count()
    assert per_key.filter(F.col("count") != 1).count() == 0
    assert noop.filter(~F.col("is_current")).count() == 0


def test_scd2_changed_keys_have_closed_plus_open_version(spark, sf_dir):
    out = _Q["q163_scd2_merge"](spark, sf_dir).cache()
    try:
        two = (
            out.filter(F.col("c_custkey") < 10_000_000)
            .groupBy("c_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_current").cast("int")).alias("n_open"),
                F.max(F.col("valid_to").isNotNull().cast("int")).alias("has_closed"),
            )
            .filter(F.col("n") == 2)
        )
        # every 2-version key: exactly one open row and one closed row,
        # and the closed row's valid_to equals the open row's valid_from
        assert two.filter((F.col("n_open") != 1) | (F.col("has_closed") != 1)).count() == 0
        handoff = (
            out.filter(F.col("valid_to").isNotNull())
            .select("c_custkey", F.col("valid_to").alias("vt"))
            .join(
                out.filter(F.col("is_current") & (F.col("valid_from") > "1990-01-01")),
                "c_custkey",
            )
            .filter(F.col("vt") != F.col("valid_from"))
        )
        assert handoff.count() == 0
        # inserts carry the synthetic key offset and are open-only
        ins = out.filter(F.col("c_custkey") >= 10_000_000)
        assert ins.count() > 0
        assert ins.filter(~F.col("is_current") | F.col("valid_to").isNotNull()).count() == 0
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# q164 CDC apply
# ---------------------------------------------------------------------------


def test_cdc_latest_wins_and_deletes(spark, sf_dir):
    """Recompute the expected per-status counts straight from the base
    snapshot's key residues: %20==3 deleted; %20==1 ends 'U2' (seq 3 beats
    seq 1); the remaining %10 in (1,2,3) keys end 'U1'; %50==7 spawns
    'NEW' inserts; everything else keeps its base status."""
    from big_data_computing_final_project_spark.catalog import load_table

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st")
    )
    k = F.col("k")
    expected = {
        "U1": base.filter((k % 10).isin(1, 2, 3) & (k % 20 != 3) & (k % 20 != 1)).count(),
        "U2": base.filter(k % 20 == 1).count(),
        "NEW": base.filter(k % 50 == 7).count(),
    }
    untouched = base.filter(~(k % 10).isin(1, 2, 3)).groupBy("st").count().collect()
    for r in untouched:
        expected[r["st"]] = expected.get(r["st"], 0) + r["count"]
    got = {
        r["o_orderstatus"]: r["n_orders"]
        for r in _Q["q164_cdc_apply"](spark, sf_dir).collect()
    }
    assert got == {s: n for s, n in expected.items() if n > 0}


# ---------------------------------------------------------------------------
# q165 EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_independent_computation(spark, sf_dir):
    """Pin one priority's full EWMA series against a direct Python
    recomputation from the same monthly revenues (alpha=0.5, trailing 12
    months by INDEX DISTANCE — gap months age observations out)."""
    rows = (
        _Q["q165_ewma_revenue"](spark, sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("month_idx")
        .collect()
    )
    assert len(rows) > 12
    series = [(r["month_idx"], r["revenue"]) for r in rows]
    for pos, r in enumerate(rows):
        num = den = 0.0
        for idx, rev in series[: pos + 1]:
            gap = r["month_idx"] - idx
            if gap <= 11:
                w = 0.5 ** gap
                num += rev * w
                den += w
        assert math.isclose(r["ewma"], num / den, rel_tol=1e-9), r
