"""Decision-support query shapes: correlated subqueries, nested semi/anti
joins, scalar-subquery HAVING, disjunctive pushdown (SURVEY.md §2.5/§2.6/§2.7
extension surface; shapes modeled on the classic TPC-H Q2/Q11/Q13/Q14/Q15/
Q17/Q18/Q19/Q20/Q21/Q22 suite — plus the Q3-Q10/Q16 completions q135-q142 — adapted to the driver's schema — no partsupp
table, no commit/receipt dates).

These exercise the *query capability* half of the engine: Catalyst's
subquery decorrelation, semi/anti join planning, and scalar-subquery
broadcasting. Every query is written scale-first:

- correlated scalar subqueries are expressed as group-aggregate + join
  (what a decorrelator produces), with the aggregate side orders of
  magnitude smaller than the fact, so Spark broadcasts it;
- IN/EXISTS become left_semi, NOT EXISTS becomes left_anti — both
  shuffle-free when the filter side is broadcastable;
- global scalar aggregates (Q11/Q22 thresholds) are 1-row frames crossed
  in via broadcast, never collected to the driver;
- all money sums use the exact decimal trick (functions.stats.dec_sum) so
  threshold comparisons and value hashes are order-independent — a
  1000-executor run decides every threshold identically to the oracle.

Reference parity: the reference notebooks express these shapes with pandas
boolean masks + groupby-transform (e.g. `data_analysis.ipynb` cell
58736659's per-group listing, `house_predict.py:146-178` derived filters);
the SQL-standard forms here are their set-based equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stats import dec_sum, sql_dec_sum
from ..operators.sizing import broadcast_if_small
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q106 — customer order-count distribution (TPC-H Q13 shape: left outer
# join + two-level aggregate). Scale plan: aggregate orders FIRST (map-side
# partial combine on o_custkey collapses the fact before any join), then
# left-join customers so zero-order customers land in bucket 0. The second
# aggregate is over ~|customer| rows, trivially small.
# ---------------------------------------------------------------------------

_Q106_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q106_order_count_histogram", oracle=_Q106_ORACLE)
def q106_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("o_orderkey").alias("c_count"))
    counts = (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q107 — promo revenue share (TPC-H Q14 shape: conditional aggregate ratio
# over a month-sliced fact ⋈ broadcast dim). The month filter pushes to the
# scan; part broadcasts; one partial-aggregated shuffle to a single group.
# ---------------------------------------------------------------------------

_Q107_ORACLE = f"""
SELECT 100.0 * {sql_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
             / {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("q107_promo_revenue", oracle=_Q107_ORACLE)
def q107_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    joined = month.join(broadcast_if_small(part), month.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return joined.agg(
        (F.lit(100.0) * dec_sum(promo, 6) / dec_sum(disc, 6)).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------------------
# q108 — top revenue supplier (TPC-H Q15 shape: aggregate view + max scalar
# subquery, returning ALL argmax rows). The revenue aggregate shrinks the
# fact to |supplier| rows; the global max is a window over that tiny frame
# (single partition of ~|supplier| rows — fine at any SF because the
# aggregate ran first). Exact decimal sums make the double equality
# deterministic across engines and run orders.
# ---------------------------------------------------------------------------

_Q108_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q108_top_supplier", oracle=_Q108_ORACLE)
def q108_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(disc, 6).alias("total_revenue"))
    )
    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        best.join(broadcast_if_small(supplier), best.supplier_no == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q109 — small-quantity-order revenue (TPC-H Q17 shape: correlated scalar
# subquery `l_quantity < 0.2 * per-part avg`). Decorrelated form: per-part
# exact avg (tiny after aggregation — broadcast), joined back to the
# brand-filtered fact slice. Exact decimal avg ⇒ the 0.2×avg threshold
# decides identically on both engines.
# ---------------------------------------------------------------------------

_Q109_ORACLE = f"""
SELECT {sql_dec_sum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * (
    SELECT {sql_dec_sum('l_quantity')} / COUNT(l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q109_small_qty_revenue", oracle=_Q109_ORACLE)
def q109_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # exact per-part mean over ALL lineitem rows (matches the correlated
    # subquery's scope: uncorrelated with the brand filter on the outer)
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((dec_sum(F.col("l_quantity")) / F.count("l_quantity")).alias("avg_qty"))
        .join(broadcast_if_small(brand_parts), F.col("ap_partkey") == F.col("p_partkey"))
        .select("ap_partkey", "avg_qty")
    )
    slice_ = li.join(broadcast_if_small(brand_parts), li.l_partkey == F.col("p_partkey"))
    return (
        slice_.join(broadcast_if_small(avg_qty), slice_.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q110 — large-volume orders (TPC-H Q18 shape: IN-subquery over a
# group-HAVING aggregate). The HAVING survivor set is small (hundreds of
# orderkeys) ⇒ broadcast semi-join prunes orders before the customer join;
# the per-order quantity re-aggregate only runs on surviving rows.
# ---------------------------------------------------------------------------

_Q110_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dec_sum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dec_sum('l_quantity')} > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q110_large_orders", oracle=_Q110_ORACLE)
def q110_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(broadcast_if_small(big), orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q111 — heavy shippers of red parts (TPC-H Q20 shape: nested IN-subqueries
# → two chained semi-join reductions). part-filter is a broadcast semi-join
# into the fact; the group-HAVING survivor set broadcasts into supplier.
# ---------------------------------------------------------------------------

_Q111_ORACLE = f"""
WITH red_1998 AS (
  SELECT l_suppkey, {sql_dec_sum('l_quantity')} AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM red_1998
  WHERE qty > 1.2 * (SELECT {sql_dec_sum('qty', 6)} / COUNT(qty) FROM red_1998)
)
ORDER BY s_suppkey
"""


@register("q111_heavy_red_shippers", oracle=_Q111_ORACLE)
def q111_heavy_red_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    red_1998 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(broadcast_if_small(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dec_sum(F.col("l_quantity")).alias("qty"))
    )
    # relative threshold (> 1.2 × mean per-supplier volume) stays selective
    # at every SF; the mean is a 1-row broadcast off the same aggregate
    avg_qty = red_1998.agg((dec_sum(F.col("qty"), 6) / F.count("qty")).alias("avg_qty"))
    heavy = (
        red_1998.join(F.broadcast(avg_qty))
        .filter(F.col("qty") > F.lit(1.2) * F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(broadcast_if_small(heavy), supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q112 — idle rich customers (TPC-H Q22 shape: scalar avg subquery + NOT
# EXISTS anti-join). Threshold = exact mean of positive balances (1-row
# broadcast); "idle" = no order since 2000-07-01 (every customer has SOME
# order in this data, so the anti-join carries the date predicate).
# ---------------------------------------------------------------------------

_Q112_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {sql_dec_sum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {sql_dec_sum('c_acctbal')} / COUNT(c_acctbal) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-07-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q112_idle_rich_customers", oracle=_Q112_ORACLE)
def q112_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (dec_sum(F.col("c_acctbal")) / F.count("c_acctbal")).alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp_ntz")
    ).select("o_custkey")
    rich = customer.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle_rich = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle_rich.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), dec_sum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q113 — disjunctive-predicate revenue (TPC-H Q19 shape: OR-of-ANDs across
# fact and dim columns). Catalyst extracts the common `l_quantity <= 36`
# style bounds; the whole disjunction evaluates post-broadcast-join in one
# codegen stage — no UDF, no multi-pass union.
# ---------------------------------------------------------------------------

_Q113_ORACLE = f"""
SELECT {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 36)
"""


@register("q113_disjunctive_revenue", oracle=_Q113_ORACLE)
def q113_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 36))
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return j.filter(pred).agg(dec_sum(disc, 6).alias("revenue"))


# ---------------------------------------------------------------------------
# q114 — cheapest-balance supplier per part (TPC-H Q2 shape: correlated min
# subquery over the supplier-of-part relationship). With no partsupp table,
# the relationship is distinct (l_partkey, l_suppkey) pairs mined from
# lineitem. Decorrelated: per-part min over the pair⋈supplier frame, joined
# back on (part, min) — ties keep ALL argmin suppliers, same as SQL.
# ---------------------------------------------------------------------------

_Q114_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
     cand AS (
       SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
       FROM part JOIN ps ON p_partkey = l_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
       WHERE p_type = 'STANDARD' AND p_size <= 10
     )
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM cand c
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY p_partkey, s_suppkey
LIMIT 100
"""


@register("q114_min_bal_supplier", oracle=_Q114_ORACLE)
def q114_min_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    wanted = part.filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)).select(
        "p_partkey", "p_name"
    )
    # distinct pairs: map-side combine collapses the fact before the shuffle;
    # the part filter semi-joins FIRST so only wanted parts pay the distinct
    pairs = (
        li.join(broadcast_if_small(wanted.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = pairs.join(broadcast_if_small(supplier), pairs.l_suppkey == supplier.s_suppkey).join(
        broadcast_if_small(wanted), pairs.l_partkey == wanted.p_partkey
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q115 — high-value parts (TPC-H Q11 shape: group HAVING > fraction ×
# global scalar subquery). Both sides aggregate once; the global total is a
# 1-row broadcast crossed into the per-part frame — no driver collect, no
# second fact scan (Spark reuses the shuffle via the cached aggregate).
# ---------------------------------------------------------------------------

_Q115_ORACLE = f"""
WITH val AS (
  SELECT l_partkey, {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, value
FROM val
WHERE value > 1.5 * (SELECT {sql_dec_sum('value', 6)} / COUNT(value) FROM val)
ORDER BY value DESC, l_partkey
"""


@register("q115_important_parts", oracle=_Q115_ORACLE)
def q115_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    val = li.groupBy("l_partkey").agg(dec_sum(disc, 6).alias("value"))
    threshold = val.agg((dec_sum(F.col("value"), 6) / F.count("value")).alias("avg_value"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("value") > F.lit(1.5) * F.col("avg_value"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
    )


# ---------------------------------------------------------------------------
# q116 — sole-blame suppliers (TPC-H Q21 shape: EXISTS + NOT EXISTS
# self-joins on the fact). A returned ('R') line in a finished multi-
# supplier order where NO other supplier returned anything. Both EXISTS
# become one self-aggregate: per-order supplier and returner counts, joined
# back broadcast — two fact self-joins collapse to one aggregate + join.
# ---------------------------------------------------------------------------

_Q116_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q116_sole_blame_suppliers", oracle=_Q116_ORACLE)
def q116_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    # one aggregate chain replaces both correlated EXISTS probes: per
    # order, the distinct-supplier count and how many of them returned
    # anything. Two-level form (pair-distinct, then per-order counts)
    # instead of two COUNT(DISTINCT)s in one agg: multi-count-distinct
    # plans through Expand, which doubles every fact row pre-shuffle; the
    # pair aggregate combines map-side and the second level is tiny.
    per_pair = li.groupBy(F.col("l_orderkey").alias("ok"), "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret")
    )
    order_stats = per_pair.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("ret").alias("n_ret_supp"),
    )
    r_lines = (
        li.filter(F.col("l_returnflag") == "R")
        .join(finished, li.l_orderkey == finished.o_orderkey, "left_semi")
        .join(order_stats, li.l_orderkey == order_stats.ok)
        # EXISTS other-supplier ⇔ n_supp > 1; NOT EXISTS other returner ⇔
        # the only returning supplier is l1's own (n_ret_supp == 1, and l1
        # itself returned, so that one is l1.l_suppkey)
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
    )
    return (
        r_lines.join(broadcast_if_small(supplier), r_lines.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q135 — shipping-priority top-10 (TPC-H Q3 shape; q03 is the static
# rollup cousin, this is the real Q3: as-of-date order screening + grouped
# revenue + top-k). BUILDING-segment orders placed before the cutoff whose
# lines ship after it, ranked by outstanding revenue. Scale plan: customer
# (filtered) broadcasts into orders, the fact-fact join shuffles on
# orderkey, revenue is a partial+final decimal agg, and the top-10 is
# TakeOrderedAndProject — no global sort.
# ---------------------------------------------------------------------------

_Q135_CUTOFF = "1998-01-01"

_Q135_ORACLE = f"""
SELECT o.o_orderkey, o.o_orderdate,
       {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q135_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_Q135_CUTOFF}'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q135_shipping_priority", oracle=_Q135_ORACLE)
def q135_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(_Q135_CUTOFF).cast("timestamp_ntz")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        o.join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q136 — order-priority checking (TPC-H Q4 shape: EXISTS semi-join +
# priority histogram). Adapted predicate (schema has no commit/receipt
# dates): an order counts when some line shipped more than 30 days after
# the order date. left_semi keeps each order once no matter how many lines
# qualify; the fact-side shuffle is on the join key only.
# ---------------------------------------------------------------------------

_Q136_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q136_order_priority", oracle=_Q136_ORACLE)
def q136_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q137 — local-supplier volume (TPC-H Q5 shape: 6-way join with the
# same-nation equi-constraint). Revenue per ASIA nation in 1997 where the
# ordering customer and the line's supplier share a nation — the one
# classic shape whose join graph is cyclic (customer.nation == supplier.
# nation). Scale plan: nation⋈region broadcasts, customer and supplier
# broadcast (dims), the only shuffle is orders⋈lineitem on orderkey; the
# nation-equality lands as a post-join filter on two broadcast columns.
# ---------------------------------------------------------------------------

_Q137_ORACLE = f"""
SELECT n.n_name,
       {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@register("q137_local_supplier_volume", oracle=_Q137_ORACLE)
def q137_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(
            broadcast_if_small(s),
            (li.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# q138 — forecast revenue change (TPC-H Q6 shape: the pure scan-filter-agg
# throughput probe). One pass, no joins, filters pushed to the parquet
# reader; the answer is a single decimal-exact cell.
# ---------------------------------------------------------------------------

_Q138_ORACLE = f"""
SELECT {sql_dec_sum('l_extendedprice * l_discount', 6)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q138_forecast_revenue", oracle=_Q138_ORACLE)
def q138_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q139 — volume shipping between two nations (TPC-H Q7 shape: directed
# nation-pair flows). Lines where the supplier sits in one named nation
# and the ordering customer in the other, both directions kept, revenue
# per (supp_nation, cust_nation, ship-year). Scale plan: both nation-
# filtered dims broadcast; one fact-fact shuffle on orderkey.
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_18", "NATION_19")

_Q139_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = '{_Q7_NATIONS[0]}' AND cn.n_name = '{_Q7_NATIONS[1]}')
   OR (sn.n_name = '{_Q7_NATIONS[1]}' AND cn.n_name = '{_Q7_NATIONS[0]}')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q139_volume_shipping", oracle=_Q139_ORACLE)
def q139_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # nation filter applied when BUILDING the dims: pair_ok implies both
    # sides are in the two named nations, but Catalyst cannot derive
    # per-side IN filters from the disjunctive pair predicate, so without
    # this the full customer/supplier dims would broadcast
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*_Q7_NATIONS))
        .select("n_nationkey", "n_name")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    a, b = _Q7_NATIONS
    pair_ok = (
        (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
    ) | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
    # estimate_from: c/s embed a nation join whose default size estimate is
    # the PRODUCT of the sides — useless; the base dim scans are the honest
    # linear proxies (filtered frames are never larger than their scans)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(
            broadcast_if_small(c, estimate_from=_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            broadcast_if_small(s, estimate_from=_t(spark, sf_dir, "supplier")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q140 — product-type profit (TPC-H Q9 shape, adapted: no partsupp table,
# so supply cost is proxied as 10% of the part's retail price — the shape
# being exercised is the 5-way join + profit expression + (nation, year)
# rollup, not the cost model). Scale plan: part (name-filtered) and
# supplier⋈nation broadcast; one orders⋈lineitem shuffle.
# ---------------------------------------------------------------------------

_Q140_ORACLE = f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {sql_dec_sum(
           'l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity', 6
       )} AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q140_product_profit", oracle=_Q140_ORACLE)
def q140_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.1
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dec_sum(profit, 6).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q141 — returned-item reporting (TPC-H Q10 shape): top 20 customers by
# revenue lost to returns in a quarter. Scale plan: the quarter filter
# cuts orders first, returns filter cuts lineitem at the scan, one
# orderkey shuffle, customer/nation broadcast onto the aggregate, top-20
# via TakeOrderedAndProject with a unique key tiebreak.
# ---------------------------------------------------------------------------

_Q141_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, nation
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q141_returned_items", oracle=_Q141_ORACLE)
def q141_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q142 — parts/supplier relationship (TPC-H Q16 shape, adapted: supplier-
# per-part counts come from observed lineitem pairs instead of partsupp,
# and the excluded-supplier subquery keys on negative account balance as
# the complaints proxy). Distinct-supplier counts per (brand, type, size)
# for non-ECONOMY parts. Scale plan: the (partkey, suppkey) projection
# dedups BEFORE joining part attributes (map-side combine on the pair),
# the part dim broadcasts, excluded suppliers arrive as a broadcast
# anti-join, and the final countDistinct runs on pre-deduped pairs.
# ---------------------------------------------------------------------------

_Q142_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type <> 'ECONOMY'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q142_parts_supplier_rel", oracle=_Q142_ORACLE)
def q142_parts_supplier_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") != "ECONOMY").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(broadcast_if_small(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )
