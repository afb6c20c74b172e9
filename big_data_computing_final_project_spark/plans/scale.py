"""Skew-safe aggregation patterns (SURVEY.md §4 scale notes): salting and
two-phase shuffles for hot keys.

The events table is the skew case in this schema: a handful of event_type
values fan out over millions of rows, so any `groupBy("event_type")` sends
entire hot groups to single reducers. At sf0.1 that is invisible; at 100 TB
it is THE straggler. Three standard escapes, each registered as a query so
the plan shape is pinned and oracle-checked:

- **q77 two-phase distinct**: `COUNT(DISTINCT user)` shuffles the full row
  set on the group key — the hot key's reducer receives everything. Phase 1
  dedups on (key, user): the shuffle key now includes the high-cardinality
  user, so rows spread across all reducers regardless of key skew. Phase 2
  counts the (already tiny) distinct pairs per key. Same answer, no hot
  reducer. (This is "salting where the value is the salt".)
- **q78 salted partial agg**: explicit salt for algebraic aggregates —
  partial (sum, count) per (key, salt % N), then merge partials per key.
  Spark's hash aggregate already does map-side partials for plain sums, so
  this pattern matters for aggregates the planner can't partial (here the
  exact decimal limb-sum over a forced single-stage agg) and documents the
  salt idiom itself.
- **q79 sketch distinct**: HLL sketches are mergeable, so the skewed
  distinct becomes salted partials + union-merge — the 100 TB path when
  exactness isn't required. Rows-only (the estimate has no DuckDB twin);
  pytest bounds its error against the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stats import dec_sum, sql_dec_sum
from .registry import register

_N_SALTS = 16

_Q77_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("q77_skew_distinct_twophase", oracle=_Q77_ORACLE)
def q77_skew_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()  # shuffle on (key, user)
    return (
        pairs.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


_Q78_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dec_sum('value')} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("q78_salted_agg", oracle=_Q78_ORACLE)
def q78_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregate: stage 1 groups on (key, salt) — the hot
    key's rows split across ``_N_SALTS`` reducers — stage 2 merges the
    per-salt partials. The salt is a deterministic hash of a unique column
    (not rand()) so re-executed tasks land rows in the same salt bucket."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(_N_SALTS)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        dec_sum(F.col("value")).alias("pv"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            # partials are decimal-exact doubles with <=4dp — the merge sum
            # re-applies the same exact decimal path, so the two-stage total
            # equals the one-stage oracle digit-for-digit
            dec_sum(F.col("pv")).alias("total_value"),
        )
        .orderBy("event_type")
    )


_Q101_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       {sql_dec_sum('l_extendedprice')} AS total_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("q101_bloom_pruned_join", oracle=_Q101_ORACLE)
def q101_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with explicit Bloom-filter pruning (operators/bloom):
    the ~0.7%-selective σ(orders) key set compresses to a 16 KB bitmap that
    filters lineitem BEFORE its shuffle, so the exchange carries only
    probable matches instead of the full fact table. False positives are
    removed by the join itself — the result is exactly the plain join's
    (the oracle), the bloom only moves work off the wire. At 100 TB this is
    the pattern for selective fact-fact joins where the filtered side is
    still too big to broadcast as rows but its keys fit a bitmap."""
    from ..operators.bloom import bloom_prune

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sel = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp_ntz"))
    )
    pruned = bloom_prune(li, "l_orderkey", sel.select("o_orderkey"), "o_orderkey")
    return (
        pruned.join(sel.select("o_orderkey"), pruned.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(F.col("l_extendedprice")).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@register("q79_sketch_distinct")
def q79_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted HLL distinct: mergeable sketches make the non-algebraic
    distinct-count algebraic — partial sketch per (key, salt), union-merge
    per key. At 100 TB this replaces q77's exact path when ±2% is fine;
    state per group is a ~KB sketch instead of the distinct value set."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(_N_SALTS)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_approx"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q148 — salted fact-fact enrichment (operators/skew.salted_join registered
# end-to-end): every event is enriched with its user's total activity (a
# self-aggregate too large to broadcast at scale), then rolled up per
# event_type. The enrichment join's shuffle key is (user_id, salt): a hot
# user's events spread over _N_SALTS reducers instead of one. The salt is
# invisible in the answer — the oracle is the plain join — which is
# exactly the property the pattern must preserve. All emitted aggregates
# are integers (counts and a bigint sum of counts), so cross-engine hash
# parity is exact.
# ---------------------------------------------------------------------------

_Q148_ORACLE = """
WITH u AS (
  SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(u.user_events) AS BIGINT) AS sum_user_activity,
       CAST(COUNT(DISTINCT CASE WHEN u.user_events >= 5 THEN e.user_id END)
            AS BIGINT) AS n_heavy_users
FROM events e JOIN u ON e.user_id = u.user_id
GROUP BY e.event_type
ORDER BY e.event_type
"""


@register("q148_salted_enrich", oracle=_Q148_ORACLE)
def q148_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    user_totals = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    enriched = salted_join(
        ev.select("event_id", "event_type", "user_id"),
        user_totals,
        ["user_id"],
        n_salts=8,
        salt_from="event_id",
    )
    return (
        enriched.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_events").cast("bigint").alias("sum_user_activity"),
            F.countDistinct(
                F.when(F.col("user_events") >= 5, F.col("user_id"))
            ).alias("n_heavy_users"),
        )
        .orderBy("event_type")
    )
