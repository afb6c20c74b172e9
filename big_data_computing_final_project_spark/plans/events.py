"""Event-time window analytics over the `events` table (SURVEY.md §2.10).

The reference is batch-only; the driver's `events` table brings
tumbling/sliding/session windows into scope. Each query here is the *batch*
form of a streaming plan — `streaming/` runs the same logical plans under
Structured Streaming with watermarks and checks batch/stream equivalence
(batch-first, DuckDB-checkable, exactly as SURVEY §7 step 5 prescribes).

Timestamp parity note: events.parquet has stored TIMESTAMP(NANOS) in some
data generations and TIMESTAMP(MICROS, NTZ) in others; the catalog
normalizes either to µs TimestampType under a UTC session
(catalog.normalize_events_ts), and oracles compute on `epoch_us(ts)` so
both engines compare identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import epoch_us, load_table
from ..functions.stats import dec_sum, sql_dec_sum
from ..operators.sizing import broadcast_if_small
from .registry import register


# ---------------------------------------------------------------------------
# q27 — tumbling window aggregation (`F.window(ts, "1 hour")`).
# Streaming shape: groupBy(window) is an incremental stateful agg; in batch
# it's a plain hash aggregate on the bucketed timestamp.
# ---------------------------------------------------------------------------

_Q27_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('value')} AS total_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("q27_tumbling_window", oracle=_Q27_ORACLE)
def q27_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q28 — sliding window (1h window, 30m slide): every event lands in exactly
# duration/slide = 2 windows. The oracle materializes the same two bucket
# starts per event via epoch_us arithmetic.
# ---------------------------------------------------------------------------

_SLIDE_US = 30 * 60 * 1_000_000

_Q28_ORACLE = f"""
WITH e AS (
  SELECT make_timestamp((epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}) AS w1, value FROM events
), w AS (
  SELECT w1 AS window_start, value FROM e
  UNION ALL
  SELECT w1 - INTERVAL 30 MINUTE AS window_start, value FROM e
)
SELECT window_start, COUNT(*) AS n_events, {sql_dec_sum('value')} AS total_value
FROM w
GROUP BY window_start
ORDER BY window_start
"""


@register("q28_sliding_window", oracle=_Q28_ORACLE)
def q28_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# q29 — session windows (gap-based). Spark: F.session_window(ts, gap) —
# stateful merging sessions in streaming. Oracle: classic gaps-and-islands
# (lag → new-session flag → running count) on µs integers.
# A session closes when the next event is >= gap after the previous one.
# ---------------------------------------------------------------------------

_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000

_Q29_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= {_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       make_timestamp((epoch_us(MIN(ts)) // 1) * 1) AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


@register("q29_session_window", oracle=_Q29_ORACLE)
def q29_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", _GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# q30 — JSON extraction from events.props (extension per SURVEY §2.9/§7:
# `get_json_object` / `from_json`) + per-type aggregation of the extracted
# value. At scale the JSON parse is codegen'd JVM work, no Python.
# ---------------------------------------------------------------------------

_Q30_ORACLE = f"""
SELECT event_type,
       {sql_dec_sum("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} AS k_total,
       COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_over_50,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("q30_json_extract", oracle=_Q30_ORACLE)
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            dec_sum(k, 0).alias("k_total"),
            F.count(F.when(k > 50, F.lit(1))).alias("k_over_50"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q83 — event enrichment against the customer dim (batch form of the
# stream-static join: streaming/events.enrich_stream runs THIS plan with a
# streaming fact side; the static dim broadcasts in both worlds, so the
# streaming query has no shuffle on the fact). The equivalence test pins
# stream == batch == this oracle.
# ---------------------------------------------------------------------------

_Q83_ORACLE = f"""
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('e.value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
ORDER BY c.c_mktsegment, e.event_type
"""


@register("q83_event_enrich", oracle=_Q83_ORACLE)
def q83_event_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(broadcast_if_small(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
        .orderBy("c_mktsegment", "event_type")
    )


# ---------------------------------------------------------------------------
# q84 — view->click attribution pairs (batch form of the stream-stream
# interval join): every (view, click) of the same user with the click in
# (view_ts, view_ts + 10 min]. In streaming this is the watermarked
# stream-stream join whose time bound lets Spark expire join state; in
# batch it's a plain equi-join on user plus a range predicate — AQE picks
# the shuffle join on user_id and the band predicate prunes post-join.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 10 * 60 * 1_000_000

_Q84_ORACLE = f"""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND epoch_us(c.ts) > epoch_us(v.ts)
 AND epoch_us(c.ts) <= epoch_us(v.ts) + {_ATTR_WINDOW_US}
ORDER BY v.user_id, view_id, click_id
"""


@register("q84_view_click_join", oracle=_Q84_ORACLE)
def q84_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    gap = epoch_us(F.col("c_ts")) - epoch_us(F.col("v_ts"))
    return (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (epoch_us(F.col("c_ts"))
               <= epoch_us(F.col("v_ts")) + _ATTR_WINDOW_US),
        )
        .select("user_id", "view_id", "click_id", gap.alias("gap_us"))
        .orderBy("user_id", "view_id", "click_id")
    )


# ---------------------------------------------------------------------------
# q76 — semi-structured props via Spark 4 VariantType (SURVEY §2.9 JSON
# extension, scale path next to q30's get_json_object): parse_json() builds
# a binary Variant ONCE per row, then any number of typed variant_get()
# extractions are O(field) reads of that binary — at 100 TB with wide JSON,
# one parse + N cheap reads beats N re-parses of the raw string (which is
# what N get_json_object calls cost). Oracle: DuckDB json_extract.
# ---------------------------------------------------------------------------

_Q76_ORACLE = f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decade,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dec_sum('value')} AS total_value
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY k_decade
ORDER BY k_decade
"""


@register("q76_variant_json", oracle=_Q76_ORACLE)
def q76_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "user_id", "value", F.try_parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        parsed.select("user_id", "value", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(F.floor(F.col("k") / 10).alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            dec_sum(F.col("value")).alias("total_value"),
        )
        .orderBy("k_decade")
    )


# ---------------------------------------------------------------------------
# q73 — ordered conversion funnel (view -> click -> purchase): a user
# counts for step N only with an event at or after their step-N-1 time.
# Three chained (filter -> per-user min -> join) stages — each one shuffle
# on user_id, reusing the same partitioning; at scale the per-user step
# frames are tiny projections of the events fact, and AQE picks
# shuffle-vs-broadcast per stage. epoch_us comparisons keep the oracle on
# integer microseconds (ns-truncation parity, see module docstring).
# ---------------------------------------------------------------------------

_Q73_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
  GROUP BY e.user_id
)
SELECT step_no, step, n_users FROM (
  SELECT 1 AS step_no, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, 'click_after_view', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase_after_click', (SELECT COUNT(*) FROM s3)
) ORDER BY step_no
"""


@register("q73_event_funnel", oracle=_Q73_ORACLE)
def q73_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(no: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(no).alias("step_no"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(1, "view", s1)
        .unionByName(stage(2, "click_after_view", s2))
        .unionByName(stage(3, "purchase_after_click", s3))
        .orderBy("step_no")
    )


# ---------------------------------------------------------------------------
# q104 — weekly cohort retention over events: users grouped by the week of
# their first activity (the cohort), then counted as active per (cohort,
# weeks-since-cohort) — the standard retention triangle. Weeks are epoch-µs
# integer buckets (not calendar weeks) so both engines bucket identically.
#
# Scale shape: one shuffle keyed by user_id serves BOTH the first-activity
# min (window) and the per-(cohort, offset) distinct count's dedup — the
# distinct pair set (cohort, offset, user) falls out of the same partition-
# local state, then only tiny (cohort, offset) partials shuffle again.
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 24 * 3600 * 1_000_000


def _week_index(us):
    # exact integer floor-division on long columns (us >= 0 here): the
    # subtraction of the long modulus keeps everything integer-exact, then
    # the division of an exact multiple is exact in double too
    return ((us - us % _WEEK_US) / _WEEK_US).cast("long")

_Q104_ORACLE = f"""
WITH wk AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events
), coh AS (
  SELECT user_id, MIN(w) AS cw FROM wk GROUP BY user_id
)
SELECT cw AS cohort_week, w - cw AS week_offset,
       COUNT(DISTINCT wk.user_id) AS n_active
FROM wk JOIN coh USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("q104_cohort_retention", oracle=_Q104_ORACLE)
def q104_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", _week_index(epoch_us(F.col("ts"))).alias("w")
    )
    cw = F.min("w").over(Window.partitionBy("user_id"))
    return (
        wk.select("user_id", "w", cw.alias("cw"))
        .groupBy(F.col("cw").alias("cohort_week"), (F.col("w") - F.col("cw")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q134 — per-window source-mix shares (the mixture MONITOR to q103's
# mixture WEIGHTS): for every event-time hour, each event type's share of
# the window's traffic. The batch twin of the streaming ingest-drift
# monitor (streaming/events.mixture_from_store pins the upsert-store
# variant equal to this query): a corpus pipeline watches these shares to
# catch source-mix drift while data is still arriving. share is one
# bigint/bigint division — cross-engine exact.
# Scale: one partial-aggregated groupBy on (window, type); the share
# window function runs over the already-aggregated (hours x types) frame.
# ---------------------------------------------------------------------------

_Q134_ORACLE = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events,
       CAST(n_events AS DOUBLE)
         / CAST(SUM(n_events) OVER (PARTITION BY window_start) AS DOUBLE) AS share
FROM c
ORDER BY window_start, event_type
"""


@register("q134_window_mixture", oracle=_Q134_ORACLE)
def q134_window_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    ww = Window.partitionBy("window_start")
    return (
        c.withColumn(
            "share",
            F.col("n_events").cast("double") / F.sum("n_events").over(ww).cast("double"),
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q189 — rolling 7-day active users (DAU / WAU / stickiness). COUNT
# (DISTINCT) over a sliding window is the one aggregate window frames
# cannot express (no engine supports it), so this uses the standard
# explode rewrite: each user's distinct ACTIVITY DAY covers the 7 calendar
# days [a, a+6]; dedup (user, covered_day) and count per day. The rewrite
# is exact (a user counts for day d iff some activity falls in [d-6, d])
# and scale-linear: the fact collapses to distinct (user, day) FIRST (the
# only fact-sized aggregate), the x7 explode happens on that much smaller
# frame, and everything shuffles on the natural (user, day) keys. Days are
# emitted only where the day itself had activity (a DAU of 0 has no
# stickiness to report).
#
# Exactness: all counts; stickiness = dau/wau is the single division.
# ---------------------------------------------------------------------------

_SQL_EV_DAY = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"

_Q189_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, {_SQL_EV_DAY} AS d FROM events
), covered AS (
  SELECT DISTINCT user_id, d + o AS day_idx
  FROM ud, (SELECT unnest(generate_series(0, 6)) AS o)
), wau AS (
  SELECT day_idx, COUNT(*) AS wau FROM covered GROUP BY day_idx
), dau AS (
  SELECT d AS day_idx, COUNT(*) AS dau FROM ud GROUP BY d
)
SELECT dau.day_idx AS day_idx,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau ON wau.day_idx = dau.day_idx
ORDER BY dau.day_idx
"""


@register("q189_rolling_active_users", oracle=_Q189_ORACLE)
def q189_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    ud = ev.select("user_id", day.alias("d")).distinct()
    covered = (
        ud.select(
            "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("day_idx")
        )
        .distinct()
    )
    wau = covered.groupBy("day_idx").agg(F.count(F.lit(1)).alias("wau"))
    dau = ud.groupBy(F.col("d").alias("day_idx")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "day_idx")
        .select(
            "day_idx",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("day_idx")
    )
