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


def test_attribution_tie_break_survives_large_event_ids(spark, tmp_path):
    """Ids past 1e7 (a 100 TB stream certainly has them): the packed key's
    id space is 1e13, so the higher id still wins the same-microsecond tie
    (the first cut's 1e7 modulus silently inverted this)."""
    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (10_000_000_001, t0, 1, "click", 0.0, '{"k": 3}'),
        (5, t0, 1, "click", 0.0, '{"k": 8}'),
        (12, t0 + s, 1, "purchase", 60.0, "{}"),
    ]
    _write(spark, tmp_path, "events", _EV, rows)
    out = _Q["q179_lasttouch_attribution"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].campaign == 3


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


# ---------------------------------------------------------------------------
# q181 mutual information (lives in plans/impurity.py; pinned here with the
# other planted-orders analytics)
# ---------------------------------------------------------------------------

_ORD = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def test_mutual_information_independent_is_exactly_zero(spark, tmp_path):
    """Product distribution (every (priority, status) cell equal): each
    cell's log argument is exactly 1, so MI is exactly 0.0 — not an
    epsilon."""
    d0 = dt.datetime(1995, 6, 1)
    rows = []
    i = 0
    for p in ("1-URGENT", "2-HIGH"):
        for s in ("F", "O"):
            for _ in range(10):
                rows.append((i, 1, s, 100.0, d0, p))
                i += 1
    _write(spark, tmp_path, "orders", _ORD, rows)
    out = _Q["q181_mutual_information"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].mi_bits == 0.0 and out[0].mi_normalized == 0.0


def test_mutual_information_bijection_saturates(spark, tmp_path):
    """priority determines status (3 pairs, equal mass): MI = H_status =
    log2(3), normalized exactly 1."""
    import math

    d0 = dt.datetime(1995, 6, 1)
    pairs = [("1-URGENT", "F"), ("2-HIGH", "O"), ("3-MEDIUM", "P")]
    rows = [
        (i * 100 + j, 1, s, 100.0, d0, p)
        for i, (p, s) in enumerate(pairs)
        for j in range(10)
    ]
    _write(spark, tmp_path, "orders", _ORD, rows)
    r = _Q["q181_mutual_information"](spark, str(tmp_path)).collect()[0]
    assert abs(r.mi_bits - math.log2(3)) < 1e-11
    assert r.mi_normalized == 1.0
    assert r.h_status == r.mi_bits


def test_mutual_information_bounds_on_real_data(spark, sf_dir):
    for r in _Q["q181_mutual_information"](spark, sf_dir).collect():
        assert -1e-12 <= r.mi_bits <= min(r.h_priority, r.h_status) + 1e-9
        assert 0.0 <= r.mi_normalized <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# q182 reorder gaps
# ---------------------------------------------------------------------------


def test_reorder_gaps_planted_bands(spark, tmp_path):
    d0 = dt.datetime(2024, 1, 1)

    def day(n):
        return d0 + dt.timedelta(days=n)

    rows = [
        (1, 1, "O", 10.0, day(0), "5-LOW"),
        (2, 1, "O", 10.0, day(0), "5-LOW"),    # same-day repeat -> gap 0
        (3, 1, "O", 10.0, day(3), "5-LOW"),    # gap 3 -> 1-7d
        (4, 1, "O", 10.0, day(40), "5-LOW"),   # gap 37 -> 31-90d
        (5, 1, "O", 10.0, day(500), "5-LOW"),  # gap 460 -> 365d+
        (6, 2, "O", 10.0, day(100), "5-LOW"),  # single order: no gap
    ]
    _write(spark, tmp_path, "orders", _ORD, rows)
    out = {r.band: r for r in _Q["q182_reorder_gaps"](spark, str(tmp_path)).collect()}
    assert set(out) == {"same_day", "1-7d", "31-90d", "365d+"}
    assert all(r.n_gaps == 1 for r in out.values())
    assert out["31-90d"].avg_gap_days == 37.0
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# q183 cohort LTV
# ---------------------------------------------------------------------------


def test_cohort_ltv_conserves_revenue_and_accumulates(spark, sf_dir):
    import pyspark.sql.functions as F

    rows = _Q["q183_cohort_ltv"](spark, sf_dir).collect()
    total = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.sum("o_totalprice"))
        .collect()[0][0]
    )
    got = sum(r.month_revenue for r in rows)
    assert abs(got - total) / total < 1e-9
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r.months_since)
        assert cells[0].months_since == 0  # the first-order month is a cell
        cum = 0.0
        for c in cells:
            cum += c.month_revenue
            assert abs(c.cum_revenue - cum) / max(cum, 1.0) < 1e-9
            assert abs(c.ltv_per_customer - c.cum_revenue / c.cohort_size) < 1e-6


# ---------------------------------------------------------------------------
# q187 hierarchical shares / q188 Benford audit
# ---------------------------------------------------------------------------


def test_hierarchical_shares_sum_to_one_per_parent(spark, sf_dir):
    rows = _Q["q187_hierarchical_shares"](spark, sf_dir).collect()
    total = [r for r in rows if r.level == "total"]
    assert len(total) == 1 and total[0].share_of_parent == 1.0
    regions = [r for r in rows if r.level == "region"]
    nations = [r for r in rows if r.level == "nation"]
    assert abs(sum(r.share_of_parent for r in regions) - 1.0) < 1e-9
    per_region = {}
    for r in nations:
        per_region[r.region] = per_region.get(r.region, 0.0) + r.share_of_parent
    for s in per_region.values():
        assert abs(s - 1.0) < 1e-9
    # parent-child revenue conservation
    assert abs(sum(r.revenue for r in regions) - total[0].revenue) < 1e-4


def test_benford_counts_every_order_once_and_digit_extraction_exact(spark, sf_dir):
    rows = _Q["q188_benford_audit"](spark, sf_dir).collect()
    assert [r.first_digit for r in rows] == list(range(1, 10))
    n_orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 0")
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    # independent digit recount in python, exact-cents route
    import collections

    vals = [
        r.o_totalprice
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    ]
    cnt = collections.Counter(str(round(v * 100))[0] for v in vals if v > 0)
    for r in rows:
        assert r.n_orders == cnt.get(str(r.first_digit), 0)


def test_benford_flags_fabricated_uniform_amounts(spark, tmp_path):
    """Uniform 100..999 amounts (every first digit equally likely) are the
    textbook Benford violation: digit-1 share ~1/9, far below 0.301, and
    the chi2 total is large."""
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, "O", float(100 + (i * 37) % 900) + 0.5, d0, "5-LOW")
        for i in range(3600)
    ]
    _write(spark, tmp_path, "orders", _ORD, rows)
    out = {r.first_digit: r for r in _Q["q188_benford_audit"](spark, str(tmp_path)).collect()}
    assert abs(out[1].share - 1 / 9) < 0.01
    assert sum(r.chi2_term for r in out.values()) > 0.1


# ---------------------------------------------------------------------------
# q191 keyset pagination
# ---------------------------------------------------------------------------


def test_keyset_page_equals_offset_page(spark, sf_dir):
    """The seek-predicate page must equal rows 101-150 of the full ordering
    (the OFFSET form it replaces), row for row."""
    got = [
        (r.c_custkey, r.c_acctbal)
        for r in _Q["q191_keyset_pagination"](spark, sf_dir).collect()
    ]
    import pyspark.sql.functions as F

    full = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(150)
        .collect()
    )
    want = [(r.c_custkey, r.c_acctbal) for r in full[100:150]]
    assert got == want and len(got) == 50


# size-guarded broadcasts on linearly-scaling frames (VERDICT r6 item 1)


import pytest as _pytest


@_pytest.mark.parametrize(
    "name",
    [
        "q178_basket_rules",
        "q180_supplier_hhi",
        "q185_scd2_pit_join",
        "q187_hierarchical_shares",
        "q92_market_share",
        "q184_deletion_manifest",
        "q132_corpus_funnel",
    ],
)
def test_scaling_broadcasts_are_size_guarded(name, spark, sf_dir):
    """The per-part item counts (q178), supplier dim (q180/q187), SCD2
    customer dim (q185), q92's region-customer/supplier-nation frames,
    q184's deletion-subject frames (all VERDICT r6/r7) grow linearly with
    the corpus, so their broadcasts go through
    operators/sizing.broadcast_if_small; q132's contaminated-doc set is
    data-dependent and rides an UNHINTED join (AQE decides at runtime).
    Forcing the session threshold to 0 must yield a shuffle join — the
    behavior those frames get at 100x — with identical results. (Dims-
    proper like nation/region and 1-row aggregates stay forced.)"""
    expected = [tuple(r) for r in _Q[name](spark, sf_dir).collect()]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
        df = _Q[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re as _re

        # the guarded key columns must now be joined via a shuffle join
        keys = {
            "q178_basket_rules": r"(SortMergeJoin|ShuffledHashJoin) \[p1#\d+L?\]",
            "q180_supplier_hhi": r"(SortMergeJoin|ShuffledHashJoin) \[l_suppkey#\d+L?\]",
            "q185_scd2_pit_join": r"(SortMergeJoin|ShuffledHashJoin) \[o_custkey#\d+L?\]",
            "q187_hierarchical_shares": r"(SortMergeJoin|ShuffledHashJoin) \[l_suppkey#\d+L?\]",
            "q92_market_share": r"(SortMergeJoin|ShuffledHashJoin) \[o_custkey#\d+L?\]",
            "q184_deletion_manifest": r"(SortMergeJoin|ShuffledHashJoin) \[o_custkey#\d+L?\]",
            "q132_corpus_funnel": r"(SortMergeJoin|ShuffledHashJoin) \[doc_id#\d+L?\]",
        }
        assert _re.search(keys[name], plan), plan[:1200]
        got = [tuple(r) for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted(map(str, got)) == sorted(map(str, expected))
