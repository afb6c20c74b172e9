"""Impurity aggregates + remaining relational inventory (SURVEY.md §2.6
A12-A14, §2.3 E11, §2.7 range frames, grouping sets).

A12/A13/A14 are the reference's custom UDAFs (`house_predict.py:228-308`):
entropy −Σ p·log2 p, Gini 1−Σ p², and split information gain. Implemented
as aggregations over class counts with the class set pinned (O,F,P), so the
Σ over classes is an explicit left-associated expression — exact parity
with the oracle, no aggregation-order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import epoch_us, load_table
from ..functions.expressions import interval_bucket
from ..functions.stats import dec_sum, sql_dec_sum
from ..operators.sizing import broadcast_if_small
from .registry import register


def _epoch_sec(colname: str):
    """Zone-invariant epoch seconds of an NTZ column (RANGE-frame key;
    o_orderdate is date-midnights so the µs→s division is exact)."""
    return (epoch_us(F.col(colname)) / F.lit(1_000_000)).cast("long")

_STATUSES = ["F", "O", "P"]  # o_orderstatus class domain


def _class_count(c: str) -> F.Column:
    return F.count(F.when(F.col("o_orderstatus") == c, 1))


def _sql_class_count(c: str) -> str:
    return f"COUNT(*) FILTER (WHERE o_orderstatus = '{c}')"


def _entropy_terms(counts: list[F.Column], total: F.Column) -> F.Column:
    """−Σ p·log2(p), skipping zero classes (`probabilities > 0` guard, P4,
    `house_predict.py:236`)."""
    acc = F.lit(0.0)
    for n in counts:
        p = n.cast("double") / total
        acc = acc + F.when(n > 0, -(p * F.log2(p))).otherwise(F.lit(0.0))
    return acc


def _sql_entropy(counts: list[str], total: str) -> str:
    terms = [
        f"(CASE WHEN {n} > 0 THEN -((CAST({n} AS DOUBLE) / {total}) * log2(CAST({n} AS DOUBLE) / {total})) ELSE 0.0 END)"
        for n in counts
    ]
    return "(0.0 + " + " + ".join(terms) + ")"


def _gini_terms(counts: list[F.Column], total: F.Column) -> F.Column:
    """1 − Σ p² (`house_predict.py:239-245`)."""
    acc = F.lit(1.0)
    for n in counts:
        p = n.cast("double") / total
        acc = acc - p * p
    return acc


def _sql_gini(counts: list[str], total: str) -> str:
    terms = [f"(CAST({n} AS DOUBLE) / {total}) * (CAST({n} AS DOUBLE) / {total})" for n in counts]
    return "(1.0 - " + " - ".join(terms) + ")"


# ---------------------------------------------------------------------------
# q53 — entropy + Gini of the order-status distribution per market segment
# (A12/A13 as first-class aggregates).
# ---------------------------------------------------------------------------


def _q53_oracle() -> str:
    counts = [_sql_class_count(c) for c in _STATUSES]
    total = "COUNT(*)"
    return f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND({_sql_entropy(counts, total)}, 12) AS status_entropy,
       ROUND({_sql_gini(counts, total)}, 12) AS status_gini
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("q53_entropy_gini", oracle=_q53_oracle())
def q53_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = [_class_count(c) for c in _STATUSES]
    total = F.count(F.lit(1))
    return (
        broadcast_if_small(customer)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            total.alias("n_orders"),
            F.round(_entropy_terms(counts, total), 12).alias("status_entropy"),
            F.round(_gini_terms(counts, total), 12).alias("status_gini"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q54 — information gain of a candidate split (A14: `parent − (nL/n)·left −
# (nR/n)·right`, `house_predict.py:295-308`): split orders on
# o_totalprice > 250000, label = o_orderstatus.
# ---------------------------------------------------------------------------

_SPLIT = 250000.0


def _q54_oracle() -> str:
    sides = {"left": f"o_totalprice <= {_SPLIT}", "right": f"o_totalprice > {_SPLIT}"}
    cols = {}
    for side, cond in sides.items():
        cols[side] = {
            "n": f"COUNT(*) FILTER (WHERE {cond})",
            "counts": [
                f"COUNT(*) FILTER (WHERE {cond} AND o_orderstatus = '{c}')" for c in _STATUSES
            ],
        }
    parent_counts = [_sql_class_count(c) for c in _STATUSES]
    parent_entropy = _sql_entropy(parent_counts, "COUNT(*)")
    left_e = _sql_entropy(cols["left"]["counts"], cols["left"]["n"])
    right_e = _sql_entropy(cols["right"]["counts"], cols["right"]["n"])
    gain = (
        f"{parent_entropy} - (CAST({cols['left']['n']} AS DOUBLE) / COUNT(*)) * {left_e}"
        f" - (CAST({cols['right']['n']} AS DOUBLE) / COUNT(*)) * {right_e}"
    )
    return f"""
SELECT ROUND({parent_entropy}, 12) AS parent_entropy,
       CAST({cols['left']['n']} AS BIGINT) AS n_left,
       CAST({cols['right']['n']} AS BIGINT) AS n_right,
       ROUND({gain}, 9) AS info_gain
FROM orders
"""


@register("q54_information_gain", oracle=_q54_oracle())
def q54_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    left = F.col("o_totalprice") <= _SPLIT
    right = F.col("o_totalprice") > _SPLIT

    def side_counts(cond):
        n = F.count(F.when(cond, 1))
        counts = [F.count(F.when(cond & (F.col("o_orderstatus") == c), 1)) for c in _STATUSES]
        return n, counts

    n_left, left_counts = side_counts(left)
    n_right, right_counts = side_counts(right)
    total = F.count(F.lit(1))
    parent_counts = [_class_count(c) for c in _STATUSES]
    parent_entropy = _entropy_terms(parent_counts, total)
    gain = (
        parent_entropy
        - (n_left.cast("double") / total) * _entropy_terms(left_counts, n_left)
        - (n_right.cast("double") / total) * _entropy_terms(right_counts, n_right)
    )
    # transcendental outputs are rounded on BOTH sides: Java and C log2
    # differ in the last ulp, and info gain subtracts near-equal entropies
    # (catastrophic cancellation). Rounding is safe here because these
    # values have full-width 17-digit reprs (no representable-tie hazard).
    return orders.agg(
        F.round(parent_entropy, 12).alias("parent_entropy"),
        n_left.cast("bigint").alias("n_left"),
        n_right.cast("bigint").alias("n_right"),
        F.round(gain, 9).alias("info_gain"),
    )


# ---------------------------------------------------------------------------
# q55 — moving aggregate with a RANGE frame: 30-day trailing spend per
# customer (window analytics with a value-based frame, completing §2.7).
# ---------------------------------------------------------------------------

_Q55_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS trailing_30d_spend
FROM orders
ORDER BY o_custkey, order_date, o_orderkey
"""


@register("q55_range_frame_trailing", oracle=_Q55_ORACLE)
def q55_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = 86400  # RANGE frame over epoch seconds; 30 days inclusive
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(_epoch_sec("o_orderdate"))
        .rangeBetween(-30 * day, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).over(w).cast("double").alias(
            "trailing_30d_spend"
        ),
    ).orderBy("o_custkey", "order_date", "o_orderkey")


# ---------------------------------------------------------------------------
# q56 — GROUPING SETS directly (completing §2.6's grouping-set coverage
# beyond rollup/cube) + grouping() flags.
# ---------------------------------------------------------------------------

_Q56_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       {sql_dec_sum('o_totalprice')} AS total_price,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("q56_grouping_sets", oracle=_Q56_ORACLE)
def q56_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_price,
               COUNT(*) AS n
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# q57 — labeled interval bucketing (E11: `pd.cut(age, bins, labels)`,
# `Sol_2.ipynb:360-362`) over order age in years.
# ---------------------------------------------------------------------------

_Q57_ORACLE = """
WITH a AS (
  SELECT (2025 - year(o_orderdate)) AS order_age, o_totalprice FROM orders
)
SELECT CASE WHEN order_age > 0 AND order_age <= 25 THEN 'Recent'
            WHEN order_age > 25 AND order_age <= 27 THEN 'Old'
            WHEN order_age > 27 AND order_age <= 100 THEN 'Very_Old'
            ELSE NULL END AS age_category,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_price
FROM a
GROUP BY age_category
ORDER BY age_category NULLS FIRST
"""


@register("q57_labeled_interval_bucket", oracle=_Q57_ORACLE)
def q57_labeled_interval_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    age = F.lit(2025) - F.year("o_orderdate")
    cat = interval_bucket(age, [0, 25, 27, 100], ["Recent", "Old", "Very_Old"])
    return (
        orders.groupBy(cat.alias("age_category"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy(F.col("age_category").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q58 — two-dim broadcast join chain: revenue by part brand for large parts
# (exercises the part dimension + filter pushdown through a join).
# ---------------------------------------------------------------------------

_Q58_ORACLE = f"""
SELECT p.p_brand,
       {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 30
GROUP BY p.p_brand
ORDER BY p_brand
"""


@register("q58_brand_revenue", oracle=_Q58_ORACLE)
def q58_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(broadcast_if_small(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dec_sum(revenue, 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q181 — mutual information between order priority and order status, per
# order year: MI = Σ_ij (n_ij/n) · log2(n_ij·n / (n_i·n_j)), the feature-
# relevance score a tree builder compares against information gain (A14 is
# exactly MI of the split indicator). Same exactness recipe as q53: both
# class domains are pinned and tiny (5 priorities × 3 statuses), so every
# cell/marginal is an explicit conditional COUNT and the Σ over 15 cells is
# one left-associated expression written in the SAME order in both engines
# — no aggregation-order dependence — with the log argument formed from
# EXACT int64 products (n_ij·n and n_i·n_j stay < 2^63 through sf100k).
# ROUND(…,12) guards the last-ulp libm divergence, as everywhere else.
# Also emitted: marginal entropies and the normalized MI/min(H_p, H_s).
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _q181_oracle() -> str:
    cell = lambda p, s: f'COUNT(*) FILTER (WHERE o_orderpriority = \'{p}\' AND o_orderstatus = \'{s}\')'  # noqa: E731
    marg_p = lambda p: f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}')"  # noqa: E731
    marg_s = _sql_class_count
    n = "COUNT(*)"
    mi_terms = []
    for p in _PRIORITIES:
        for s in _STATUSES:
            nij = cell(p, s)
            mi_terms.append(
                f"(CASE WHEN {nij} > 0 THEN (CAST({nij} AS DOUBLE) / {n})"
                f" * log2(CAST({nij} * {n} AS DOUBLE)"
                f" / CAST({marg_p(p)} * {marg_s(s)} AS DOUBLE)) ELSE 0.0 END)"
            )
    mi = "(0.0 + " + " + ".join(mi_terms) + ")"
    h_p = _sql_entropy([marg_p(p) for p in _PRIORITIES], n)
    h_s = _sql_entropy([marg_s(s) for s in _STATUSES], n)
    return f"""
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       CAST({n} AS BIGINT) AS n_orders,
       ROUND({mi}, 12) AS mi_bits,
       ROUND({h_p}, 12) AS h_priority,
       ROUND({h_s}, 12) AS h_status,
       ROUND(CASE WHEN least({h_p}, {h_s}) > 0
                  THEN {mi} / least({h_p}, {h_s}) ELSE 0.0 END, 12) AS mi_normalized
FROM orders
GROUP BY 1
ORDER BY order_year
"""


@register("q181_mutual_information", oracle=_q181_oracle())
def q181_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    cell = lambda p, s: F.count(  # noqa: E731
        F.when((F.col("o_orderpriority") == p) & (F.col("o_orderstatus") == s), 1)
    )
    marg_p = lambda p: F.count(F.when(F.col("o_orderpriority") == p, 1))  # noqa: E731
    mi = F.lit(0.0)
    for p in _PRIORITIES:
        for s in _STATUSES:
            nij = cell(p, s)
            term = (nij.cast("double") / n) * F.log2(
                (nij * n).cast("double") / (marg_p(p) * _class_count(s)).cast("double")
            )
            mi = mi + F.when(nij > 0, term).otherwise(F.lit(0.0))
    h_p = _entropy_terms([marg_p(p) for p in _PRIORITIES], n)
    h_s = _entropy_terms([_class_count(s) for s in _STATUSES], n)
    return (
        o.groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            n.cast("bigint").alias("n_orders"),
            F.round(mi, 12).alias("mi_bits"),
            F.round(h_p, 12).alias("h_priority"),
            F.round(h_s, 12).alias("h_status"),
            F.round(
                F.when(F.least(h_p, h_s) > 0, mi / F.least(h_p, h_s)).otherwise(
                    F.lit(0.0)
                ),
                12,
            ).alias("mi_normalized"),
        )
        .orderBy("order_year")
    )
