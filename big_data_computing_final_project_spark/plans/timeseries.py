"""Time-series diagnostics over the orders fact: calendar seasonality,
changepoint localization, and trailing-window anomaly flags.

These extend the trend family (q138 linear forecast, q165 EWMA) with the
three remaining shapes an operations dashboard runs over a revenue series:

q167: day-of-week seasonal index — how far each weekday's average daily
      revenue sits from the overall daily average (the multiplicative
      seasonal factor a naive seasonal forecaster multiplies by).
q168: CUSUM changepoint — the date where the cumulative deviation from the
      per-group mean peaks, i.e. the single most likely level-shift point
      (Page's CUSUM statistic, offline form).
q169: trailing-window anomaly flags — each day scored against the mean/std
      of the PRECEDING 28 days (current day excluded, so the detector never
      conditions on the value it is judging).

Reference parity: the reference's notebooks stop at describe()-level trend
stats (SURVEY.md §2 A2/A4); these are the driver-mandated "operations at
scale" extension surface, same contract as q151-q162 (drift family).

Cross-engine exactness (the discipline proven by q165): every aggregate that
folds many doubles goes through exact decimal accumulation (order-free), and
every double emitted is produced by a short, fixed chain of single IEEE ops
on identical inputs — so Spark and DuckDB agree bit-for-bit and the driver's
value-hash gate is meaningful rather than tolerance-fudged.

Scale shape: all three queries aggregate the fact to ~2.4k daily rows in one
partial-aggregated hash aggregate (the only fact-sized work), then run
window math on that kilobyte frame. At 100 TB the daily rollup is still tiny;
nothing below the first groupBy ever shuffles fact-sized data again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stats import dec_sum, sql_dec_sum
from .registry import register

# Portable day-of-week: days since the epoch, mod 7. 1970-01-01 was a
# Thursday, so bucket 0 = Thursday ... 6 = Wednesday. Neither engine's
# dayofweek() is used because their week-start conventions differ
# (Spark 1=Sunday, DuckDB 0=Sunday) — an off-by-one that epoch-day
# arithmetic can't have.
_DOW_NAMES = ["Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed"]
_SQL_DAY_IDX = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"


def order_epoch_day() -> F.Column:
    """Epoch-day index of o_orderdate — the portable calendar key this
    family and the customer-analytics family (q177) share."""
    return F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01")))


# ---------------------------------------------------------------------------
# q167 — day-of-week seasonal index. Two aggregation levels, both exact:
# per-dow revenue is a decimal sum over raw rows (NOT a sum of per-day
# doubles — double addition is order-dependent, decimal isn't), and the
# grand totals are window sums over the 7 per-dow DECIMALS, exact again.
# Only then does anything become a double: avg_daily = rev/n_days and
# index = avg_daily / overall_avg are single divisions of identical inputs.
# DuckDB's decimal->double cast is routed through VARCHAR (sql_dec_sum's
# documented two-step-rounding workaround).
# ---------------------------------------------------------------------------

_Q167_ORACLE = f"""
WITH per_dow AS (
  SELECT {_SQL_DAY_IDX} % 7 AS dow_idx,
         COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
         SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev_dec
  FROM orders
  GROUP BY 1
), tot AS (
  SELECT dow_idx, n_days, rev_dec,
         SUM(rev_dec) OVER () AS tot_rev_dec,
         SUM(n_days) OVER () AS tot_days
  FROM per_dow
)
SELECT dow_idx,
       CASE dow_idx WHEN 0 THEN 'Thu' WHEN 1 THEN 'Fri' WHEN 2 THEN 'Sat'
                    WHEN 3 THEN 'Sun' WHEN 4 THEN 'Mon' WHEN 5 THEN 'Tue'
                    ELSE 'Wed' END AS dow_name,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) / n_days AS avg_daily,
       (CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) / n_days)
       / (CAST(CAST(tot_rev_dec AS VARCHAR) AS DOUBLE) / tot_days)
         AS seasonal_index
FROM tot
ORDER BY dow_idx
"""


@register("q167_seasonal_dow_index", oracle=_Q167_ORACLE)
def q167_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_dow = o.groupBy((order_epoch_day() % 7).alias("dow_idx")).agg(
        F.countDistinct(F.to_date("o_orderdate")).alias("n_days"),
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rev_dec"),
    )
    w = Window.partitionBy()
    t = per_dow.select(
        "dow_idx",
        "n_days",
        "rev_dec",
        F.sum("rev_dec").over(w).alias("tot_rev_dec"),
        F.sum("n_days").over(w).alias("tot_days"),
    )
    rev = F.col("rev_dec").cast("double")
    avg_daily = rev / F.col("n_days")
    overall = F.col("tot_rev_dec").cast("double") / F.col("tot_days")
    dow_name = F.element_at(
        F.array(*[F.lit(n) for n in _DOW_NAMES]), F.col("dow_idx").cast("int") + 1
    )
    return t.select(
        "dow_idx",
        dow_name.alias("dow_name"),
        F.col("n_days").cast("bigint").alias("n_days"),
        rev.alias("revenue"),
        avg_daily.alias("avg_daily"),
        (avg_daily / overall).alias("seasonal_index"),
    ).orderBy("dow_idx")


# ---------------------------------------------------------------------------
# q168 — CUSUM changepoint per order priority. Offline CUSUM: against the
# group's own mean, S_t = sum_{s<=t}(x_s - mean) peaks in magnitude at the
# most likely level-shift date. Exactness: the prefix sum is a WINDOW SUM
# OVER DECIMALS (exact, order-free); S_t is then the single-op chain
# double(prefix_dec) - t * mean with mean = double(total_dec)/n — two
# products/divisions of identical doubles. The argmax tie-breaks on the
# earlier date deterministically.
#
# Scale: fact -> ~2.4k daily rows per group in one hash agg; the window
# runs per-group over <=2.4k rows. The changepoint row_number is a second
# tiny window. Nothing fact-sized crosses the wire twice.
# ---------------------------------------------------------------------------

_Q168_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority,
         {_SQL_DAY_IDX} AS day_idx,
         SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev_dec
  FROM orders GROUP BY 1, 2
), c AS (
  SELECT priority, day_idx,
         CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY day_idx) AS t,
         CAST(CAST(SUM(rev_dec) OVER (PARTITION BY priority ORDER BY day_idx)
                   AS VARCHAR) AS DOUBLE) AS prefix_rev,
         CAST(CAST(SUM(rev_dec) OVER (PARTITION BY priority)
                   AS VARCHAR) AS DOUBLE) AS tot_rev,
         COUNT(*) OVER (PARTITION BY priority) AS n_days
  FROM daily
), s AS (
  SELECT priority, day_idx, revenue, n_days,
         prefix_rev - t * (tot_rev / n_days) AS cusum
  FROM c
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY priority
                               ORDER BY abs(cusum) DESC, day_idx) AS rk
  FROM s
)
SELECT priority,
       CAST(day_idx AS BIGINT) AS change_day_idx,
       CAST(n_days AS BIGINT) AS n_days,
       cusum,
       revenue AS revenue_at_change
FROM ranked WHERE rk = 1
ORDER BY priority
"""


@register("q168_cusum_changepoint", oracle=_Q168_ORACLE)
def q168_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"), order_epoch_day().alias("day_idx")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rev_dec"))

    ordered = Window.partitionBy("priority").orderBy("day_idx")
    whole = Window.partitionBy("priority")
    c = daily.select(
        "priority",
        "day_idx",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.row_number().over(ordered).alias("t"),
        F.sum("rev_dec").over(ordered).cast("double").alias("prefix_rev"),
        F.sum("rev_dec").over(whole).cast("double").alias("tot_rev"),
        F.count(F.lit(1)).over(whole).alias("n_days"),
    )
    s = c.withColumn(
        "cusum",
        F.col("prefix_rev") - F.col("t") * (F.col("tot_rev") / F.col("n_days")),
    )
    ranked = s.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("priority").orderBy(F.abs("cusum").desc(), "day_idx")
        ),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .select(
            "priority",
            F.col("day_idx").cast("bigint").alias("change_day_idx"),
            F.col("n_days").cast("bigint").alias("n_days"),
            "cusum",
            F.col("revenue").alias("revenue_at_change"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q169 — trailing-window anomaly flags on global daily revenue. Each day is
# scored against the PRECEDING 28 days only (RANGE -28..-1 on the day index
# — the current observation is excluded, so the detector can't launder the
# anomaly into its own baseline; a gap-day calendar ages out naturally
# because the frame is RANGE, not ROWS). z = (x - mean) / sd with the
# sample-sd from EXACT INTEGER-UNIT window sums: a first attempt that
# decimal-cast the double x*x at scale 8 hash-mismatched by 1 ulp (the cast
# genuinely rounds there, and Spark's HALF_UP disagrees with DuckDB's
# rounding of a full-mantissa product), so instead each day carries
# u = rev_dec * 1e4 via exact decimal multiply (integral, since rev_dec has
# scale 4; no double round-trip, so exact at any magnitude) — and the frame sums
# u (int64) and u*u (a DECIMAL(19,0) x DECIMAL(19,0) product, exact at both
# engines' max-38-digit width). s1 = u-sum/1e4 and s2 = u²-sum/1e8 then
# reach double via one correctly-rounded conversion each (VARCHAR-routed on
# DuckDB), and mean / var / sd / z are a fixed chain of single IEEE ops.
# Days with fewer than 14 prior days are warm-up and excluded. Only flagged
# days (|z| > 3) and their context stats are emitted.
# ---------------------------------------------------------------------------

_Q169_MIN_PRIOR = 14

_Q169_ORACLE = f"""
WITH daily AS (
  SELECT {_SQL_DAY_IDX} AS day_idx,
         SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev_dec
  FROM orders GROUP BY 1
), x AS (
  SELECT day_idx,
         CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
         CAST(CAST(rev_dec AS DECIMAL(28,4)) * 10000 AS BIGINT) AS u
  FROM daily
), win AS (
  SELECT day_idx, revenue,
         COUNT(*) OVER w AS n_prior,
         CAST(CAST(SUM(u) OVER w AS VARCHAR) AS DOUBLE) / 1e4 AS s1,
         CAST(CAST(SUM(CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))) OVER w
                   AS VARCHAR) AS DOUBLE) / 1e8 AS s2
  FROM x
  WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT day_idx, revenue, n_prior,
         s1 / n_prior AS mean_28,
         sqrt((s2 - s1 * (s1 / n_prior)) / (n_prior - 1)) AS sd_28
  FROM win
  WHERE n_prior >= {_Q169_MIN_PRIOR}
)
SELECT CAST(day_idx AS BIGINT) AS day_idx, revenue,
       CAST(n_prior AS BIGINT) AS n_prior, mean_28, sd_28,
       (revenue - mean_28) / sd_28 AS zscore
FROM scored
WHERE abs((revenue - mean_28) / sd_28) > 3.0
ORDER BY day_idx
"""


def score_daily_anomalies(x: DataFrame) -> DataFrame:
    """q169's scoring over a (day_idx, revenue, u) daily series — shared
    with the streaming revenue monitor, whose store fold reconstructs the
    identical series from per-batch integer-unit partials."""
    w = Window.orderBy("day_idx").rangeBetween(-28, -1)
    u19 = F.col("u").cast("decimal(19,0)")
    win = x.select(
        "day_idx",
        "revenue",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        (F.sum("u").over(w).cast("double") / F.lit(1e4)).alias("s1"),
        (F.sum(u19 * u19).over(w).cast("double") / F.lit(1e8)).alias("s2"),
    )
    scored = win.filter(F.col("n_prior") >= _Q169_MIN_PRIOR).select(
        "day_idx",
        "revenue",
        "n_prior",
        (F.col("s1") / F.col("n_prior")).alias("mean_28"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * (F.col("s1") / F.col("n_prior")))
            / (F.col("n_prior") - 1)
        ).alias("sd_28"),
    )
    z = (F.col("revenue") - F.col("mean_28")) / F.col("sd_28")
    return (
        scored.select(
            F.col("day_idx").cast("bigint").alias("day_idx"),
            "revenue",
            F.col("n_prior").cast("bigint").alias("n_prior"),
            "mean_28",
            "sd_28",
            z.alias("zscore"),
        )
        .filter(F.abs("zscore") > 3.0)
        .orderBy("day_idx")
    )


@register("q169_rolling_anomaly", oracle=_Q169_ORACLE)
def q169_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(order_epoch_day().alias("day_idx")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,4)")).alias("rev_dec")
    )
    x = daily.select(
        "day_idx",
        F.col("rev_dec").cast("double").alias("revenue"),
        # exact: rev_dec has scale 4, so rev_dec*1e4 is integral and the
        # decimal product stays inside 38 digits — no double round-trip,
        # so u is exact at ANY day-revenue magnitude (not just < 2^53/1e4)
        (F.col("rev_dec") * F.lit(10000))
        .cast("decimal(38,0)")
        .cast("long")
        .alias("u"),
    )
    return score_daily_anomalies(x)
