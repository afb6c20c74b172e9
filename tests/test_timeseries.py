"""Semantic pins for the time-series family (plans/timeseries.py).

Oracle parity already hash-matches q167-q169 against DuckDB; these tests pin
the STATISTICS themselves on planted series where the right answer is known
by construction: a planted level shift must be localized by CUSUM, a planted
spike day must be the anomaly flagged, and the seasonal indices must be a
proper (weighted-mean-1) multiplicative decomposition.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def _write_orders(spark, tmp_path, rows) -> str:
    """Write a planted orders.parquet (one row per (day, amount)) and return
    the directory usable as a query sf_dir."""
    data = [
        (i, i, "O", float(amt), dt.datetime(2024, 1, 1) + dt.timedelta(days=day), prio)
        for i, (day, amt, prio) in enumerate(rows)
    ]
    spark.createDataFrame(data, _ORDERS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# q167 seasonal index
# ---------------------------------------------------------------------------


def test_seasonal_index_weighted_mean_is_one(spark, sf_dir):
    """index = (dow avg daily) / (overall avg daily), so the n_days-weighted
    mean of the indices is exactly the overall average over itself: 1."""
    rows = _Q["q167_seasonal_dow_index"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    tot_days = sum(r.n_days for r in rows)
    weighted = sum(r.seasonal_index * r.n_days for r in rows) / tot_days
    assert math.isclose(weighted, 1.0, rel_tol=1e-9)


def test_seasonal_index_recovers_planted_weekly_pattern(spark, tmp_path):
    """70 days, amount = 100 on all days except every 7th day at 800: the
    hot weekday's index must be the unique maximum and > 1."""
    rows = [(d, 800.0 if d % 7 == 0 else 100.0, "1-URGENT") for d in range(70)]
    out = _Q["q167_seasonal_dow_index"](spark, _write_orders(spark, tmp_path, rows))
    got = {r.dow_idx: r.seasonal_index for r in out.collect()}
    assert len(got) == 7
    # 2024-01-01 is a Monday -> epoch-day 19723, 19723 % 7 == 4 (bucket 'Mon')
    hot = max(got, key=got.get)
    assert hot == 4 and got[hot] > 1.0
    assert all(v < 1.0 for k, v in got.items() if k != hot)


# ---------------------------------------------------------------------------
# q168 CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_localizes_planted_level_shift(spark, tmp_path):
    """60 days at 100 then 60 days at 200: |CUSUM| peaks exactly at the last
    low-regime day (day 59)."""
    rows = [(d, 100.0 if d < 60 else 200.0, "1-URGENT") for d in range(120)]
    out = _Q["q168_cusum_changepoint"](spark, _write_orders(spark, tmp_path, rows))
    r = out.collect()
    assert len(r) == 1
    epoch0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert r[0].change_day_idx == epoch0 + 59
    # below the mean for the whole first regime -> the peak is a trough
    assert r[0].cusum < 0 and r[0].n_days == 120


def test_cusum_matches_independent_prefix_computation(spark, sf_dir):
    """The reported (priority, cusum) equals a pandas recomputation of
    max-|prefix - t*mean| over the same daily series."""
    out = {r.priority: r for r in _Q["q168_cusum_changepoint"](spark, sf_dir).collect()}
    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("d"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
        .toPandas()
    )
    for prio, g in daily.groupby("priority"):
        g = g.sort_values("d")
        mean = g.rev.sum() / len(g)
        cusum = (g.rev - mean).cumsum()
        best = cusum.abs().values.argmax()
        assert out[prio].change_day_idx == int(g.d.values[best])
        assert math.isclose(out[prio].cusum, float(cusum.values[best]), rel_tol=1e-6)


# ---------------------------------------------------------------------------
# q169 rolling anomaly
# ---------------------------------------------------------------------------


def test_rolling_anomaly_flags_only_planted_spike(spark, tmp_path):
    """Gaussian-free construction: flat 100s with one 10x day. Only that day
    can be flagged (everything else has |z| tiny), and it must be flagged
    (sd of the trailing window is ~0 ... but exactly 0 breaks the z; use a
    gentle +-1 alternation so sd > 0)."""
    rows = []
    for d in range(60):
        amt = 100.0 + (1.0 if d % 2 == 0 else -1.0)
        if d == 45:
            amt = 1000.0
        rows.append((d, amt, "1-URGENT"))
    out = _Q["q169_rolling_anomaly"](spark, _write_orders(spark, tmp_path, rows))
    got = out.collect()
    epoch0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    flagged_days = {r.day_idx - epoch0 for r in got}
    assert 45 in flagged_days
    # days right after the spike see an inflated sd, never a |z|>3 of their own;
    # tolerate no other flags
    assert flagged_days == {45}
    spike = [r for r in got if r.day_idx - epoch0 == 45][0]
    assert spike.zscore > 3.0 and spike.n_prior == 28


def test_rolling_anomaly_excludes_current_day_from_baseline(spark, tmp_path):
    """The trailing frame must exclude the scored day: with a planted spike,
    mean_28 at the spike equals the mean of the PRIOR 28 days (~100), not a
    value polluted by the 1000."""
    rows = [(d, 100.0 + (d % 2), "1-URGENT") for d in range(60)]
    rows[45] = (45, 1000.0, "1-URGENT")
    out = _Q["q169_rolling_anomaly"](spark, _write_orders(spark, tmp_path, rows))
    spike = out.collect()[0]
    assert 99.0 < spike.mean_28 < 102.0
