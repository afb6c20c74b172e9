"""Semantic pins for the customer-analytics family (plans/customer.py).

Oracle parity hash-matches q177-q180 against DuckDB; these pin the BUSINESS
SEMANTICS on planted data: quintiles partition customers near-evenly, a
planted always-together pair gets the right support/confidence/lift, the
LAST click wins attribution (not the first, not a same-microsecond one),
and HHI hits exactly 1.0 for a monopoly and 1/n for n equal competitors.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


def _write(spark, tmp_path, name, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


_LI = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
    ]
)
_SUP = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_nationkey", T.IntegerType()),
    ]
)
_NAT = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
    ]
)
_EV = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# q177 RFM
# ---------------------------------------------------------------------------


def test_rfm_cells_partition_customers_evenly(spark, sf_dir):
    rows = _Q["q177_rfm_segmentation"](spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for dim in ("r_q", "f_q", "m_q"):
        per_q = {}
        for r in rows:
            per_q[getattr(r, dim)] = per_q.get(getattr(r, dim), 0) + r.n_customers
        assert sorted(per_q) == [1, 2, 3, 4, 5]
        # ntile: bucket sizes differ by at most 1
        assert max(per_q.values()) - min(per_q.values()) <= 1


# ---------------------------------------------------------------------------
# q178 basket rules
# ---------------------------------------------------------------------------


def test_basket_rules_planted_pair(spark, tmp_path):
    """10 baskets; parts 1 and 2 co-occur in 4; part 1 appears in 5,
    part 2 in 4 (always with 1). confidence(2->1)=1.0, lift=10/5=2."""
    lines = []
    for o in range(1, 11):
        lines.append((o, 100 + o, 1, 1.0, 0.0))  # unique filler part
    for o in range(1, 5):
        lines.append((o, 1, 1, 1.0, 0.0))
        lines.append((o, 2, 1, 1.0, 0.0))
    lines.append((5, 1, 1, 1.0, 0.0))  # part 1 alone once
    _write(spark, tmp_path, "lineitem", _LI, lines)
    out = _Q["q178_basket_rules"](spark, str(tmp_path)).collect()
    rules = {(r.antecedent, r.consequent): r for r in out}
    r21 = rules[(2, 1)]
    assert r21.n_both == 4
    assert r21.support == 0.4
    assert r21.confidence == 1.0
    assert r21.lift == 4 * 10 / (5 * 4)
    r12 = rules[(1, 2)]
    assert r12.confidence == 0.8 and r12.lift == r21.lift


# ---------------------------------------------------------------------------
# q179 last-touch attribution
# ---------------------------------------------------------------------------


def test_attribution_last_click_wins_and_organic_bucket(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        (1, t0 - 3 * h, 1, "click", 0.0, '{"k": 5}'),   # earlier click
        (2, t0 - 1 * h, 1, "click", 0.0, '{"k": 9}'),   # latest click: wins
        (3, t0, 1, "purchase", 100.0, "{}"),
        (4, t0, 2, "click", 0.0, '{"k": 7}'),           # same us as purchase: out
        (5, t0, 2, "purchase", 50.0, "{}"),             # -> organic
        (6, t0 + us, 3, "click", 0.0, '{"k": 1}'),      # future click
        (7, t0, 3, "purchase", 25.0, "{}"),             # -> organic
    ]
    _write(spark, tmp_path, "events", _EV, rows)
    out = {r.campaign: r for r in _Q["q179_lasttouch_attribution"](spark, str(tmp_path)).collect()}
    assert set(out) == {9, -1}
    assert out[9].n_purchases == 1 and out[9].attributed_revenue == 100.0
    assert out[-1].n_purchases == 2 and out[-1].attributed_revenue == 75.0


def test_attribution_microsecond_tie_breaks_by_event_id(spark, tmp_path):
    """Two clicks in the SAME microsecond: the higher event_id wins —
    pinned so both engines' choice stays the documented one."""
    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (10, t0, 1, "click", 0.0, '{"k": 3}'),
        (11, t0, 1, "click", 0.0, '{"k": 8}'),
        (12, t0 + s, 1, "purchase", 60.0, "{}"),
    ]
    _write(spark, tmp_path, "events", _EV, rows)
    out = _Q["q179_lasttouch_attribution"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].campaign == 8


# ---------------------------------------------------------------------------
# q180 supplier HHI
# ---------------------------------------------------------------------------


def test_hhi_monopoly_and_equal_split_are_exact(spark, tmp_path):
    lines = [
        # nation 0: one supplier -> HHI exactly 1
        (1, 1, 1, 1000.0, 0.0),
        (2, 1, 1, 500.0, 0.0),
        # nation 1: four suppliers with EQUAL revenue -> HHI exactly 0.25
        (3, 1, 2, 100.0, 0.0),
        (4, 1, 3, 100.0, 0.0),
        (5, 1, 4, 100.0, 0.0),
        (6, 1, 5, 100.0, 0.0),
    ]
    sups = [(1, 0), (2, 1), (3, 1), (4, 1), (5, 1)]
    nats = [(0, "MONOPOLIA"), (1, "QUADLAND")]
    _write(spark, tmp_path, "lineitem", _LI, lines)
    _write(spark, tmp_path, "supplier", _SUP, sups)
    _write(spark, tmp_path, "nation", _NAT, nats)
    out = {r.nation: r for r in _Q["q180_supplier_hhi"](spark, str(tmp_path)).collect()}
    m, q = out["MONOPOLIA"], out["QUADLAND"]
    assert m.n_suppliers == 1 and m.hhi == 1.0 and m.effective_competitors == 1.0
    assert m.top_share == 1.0 and m.total_revenue == 1500.0
    assert q.n_suppliers == 4 and q.hhi == 0.25 and q.effective_competitors == 4.0
    assert q.top_share == 0.25


def test_hhi_discount_applied(spark, sf_dir):
    """total_revenue must be sum(extendedprice*(1-discount)), not gross."""
    import pyspark.sql.functions as F

    out = _Q["q180_supplier_hhi"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    want = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()[0][0]
    )
    got = sum(r.total_revenue for r in out)
    assert abs(got - want) / want < 1e-9
    assert all(0.0 < r.hhi <= 1.0 for r in out)
