"""Temporal joins over `events` (north-star extension; SURVEY §2.5 notes the
reference has no joins at all, so these — like the star-schema joins — come
from the driver-mandated extension surface).

q65: as-of join (kdb aj / merge_asof) via operators/temporal.asof_join —
     oracle-checked against DuckDB's native ASOF JOIN.
q66: banded range join (no equi key): a tiny band dimension joined on an
     interval-containment predicate. At scale the band table is broadcast,
     so the non-equi join never shuffles the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stats import dec_sum, sql_dec_sum
from ..operators.temporal import asof_join
from .registry import register

# ---------------------------------------------------------------------------
# q65 — as-of join: each 'click' event picks up the latest 'purchase' of the
# same user at or before its timestamp (inclusive). Purchases are
# pre-aggregated per (user_id, ts) so the right side is tie-free — the
# uniqueness contract any deterministic as-of join needs.
# ---------------------------------------------------------------------------

_Q65_ORACLE = f"""
WITH p AS (
  SELECT user_id, ts,
         MAX(event_id) AS purchase_id,
         {sql_dec_sum('value')} AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


@register("q65_asof_join", oracle=_Q65_ORACLE)
def q65_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            dec_sum(F.col("value")).alias("purchase_value"),
        )
    )
    return (
        asof_join(
            clicks,
            purchases,
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            payload=["purchase_id", "purchase_value"],
        )
        .select("event_id", "user_id", "purchase_id", "purchase_value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q66 — banded range join: events joined to a value-band dimension on
# lo <= value < hi (no equi key). The band table is broadcast, so Spark
# plans a BroadcastNestedLoopJoin — fact rows never shuffle, which is the
# scale-safe shape for any small interval dimension (calendars, SLA tiers,
# price bands). Contiguous bands could also compile to a when()-chain or
# Bucketizer; the join form generalizes to overlapping/gapped intervals.
# ---------------------------------------------------------------------------

_BANDS = [
    (0, 0.0, 10.0),
    (1, 10.0, 50.0),
    (2, 50.0, 100.0),
    (3, 100.0, 500.0),
    (4, 500.0, 1.0e308),
]

_Q66_ORACLE = f"""
WITH bands(band_id, lo, hi) AS (
  VALUES {', '.join(f'({b}, {lo}, {hi})' for b, lo, hi in _BANDS)}
)
SELECT band_id, COUNT(*) AS n_events, {sql_dec_sum('value')} AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id
ORDER BY band_id
"""


@register("q66_range_band_join", oracle=_Q66_ORACLE)
def q66_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "band_id int, lo double, hi double")
    joined = ev.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return (
        joined.groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
        .orderBy("band_id")
    )
