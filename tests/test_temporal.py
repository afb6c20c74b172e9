"""asof_join operator semantics on a hand-built frame, plus the registered
temporal queries' shapes. Value parity for q65/q66 is the DuckDB oracle's
job (tools/check_oracle.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_computing_final_project_spark.operators.temporal import asof_join
from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_edge_cases(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(5)), (3, 10, _ts(10)), (4, 20, _ts(5))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(5), 100.0), (10, _ts(8), 200.0), (30, _ts(0), 999.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r.id: r.v
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["v"]
        ).collect()
    }
    assert out[1] is None  # no right row at or before ts(0)
    assert out[2] == 100.0  # equal timestamp matches (inclusive)
    assert out[3] == 200.0  # latest of two prior right rows
    assert out[4] is None  # key with no right rows at all

    # every left row survives, exactly once
    assert sorted(out) == [1, 2, 3, 4]


def test_q65_every_click_present(spark, sf_dir):
    df = _Q["q65_asof_join"](spark, sf_dir)
    n_clicks = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .count()
    )
    rows = df.collect()
    assert len(rows) == n_clicks
    assert df.columns == ["event_id", "user_id", "purchase_id", "purchase_value"]


def test_q66_bands_partition_events(spark, sf_dir):
    rows = _Q["q66_range_band_join"](spark, sf_dir).collect()
    n_nonnull = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .count()
    )
    assert sum(r.n_events for r in rows) == n_nonnull


# ---------------------------------------------------------------------------
# q176 point-in-time training set — the leakage pins
# ---------------------------------------------------------------------------

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_q176_boundary_and_leakage_semantics(spark, tmp_path):
    """One purchase at T for user 1, with planted neighbors probing every
    frame edge: exactly-7-days-before counts (lower bound inclusive),
    7-days-and-1us-before does not, 1us-before counts, the same-microsecond
    event does not (upper bound is -1), and the future event never counts."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    week = dt.timedelta(days=7)
    rows = [
        (1, t0 - week - us, 1, "view", 1.0),   # too old: out
        (2, t0 - week, 1, "view", 1.0),        # exactly -7d: in
        (3, t0 - dt.timedelta(days=1), 1, "click", 1.0),  # in
        (4, t0 - us, 1, "view", 1.0),          # -1us: in
        (5, t0, 1, "error", 1.0),              # same microsecond: OUT
        (6, t0 + us, 1, "view", 1.0),          # future: out
        (7, t0, 1, "purchase", 42.5),          # the label row
        (8, t0 - us, 2, "view", 1.0),          # other user: out
    ]
    out = _Q["q176_pit_training_set"](spark, _write_events(spark, tmp_path, rows))
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_id == 7 and r.label_value == 42.5
    assert r.n_prior_total == 3          # events 2, 3, 4
    assert r.n_prior_views == 2 and r.n_prior_clicks == 1
    assert r.n_prior_errors == 0 and r.n_prior_purchases == 0
    assert r.last_gap_us == 1            # event 4 is 1us before


def test_q176_cold_start_purchase_has_zero_features(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 20, 12, 0, 0)
    rows = [(1, t0, 1, "purchase", 10.0)]
    r = _Q["q176_pit_training_set"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()[0]
    assert r.n_prior_total == 0 and r.last_gap_us is None


# ---------------------------------------------------------------------------
# q189 rolling active users
# ---------------------------------------------------------------------------


def test_rolling_active_users_window_semantics(spark, tmp_path):
    """User A active on days 0 and 10; user B on day 3. WAU(day 3) counts
    A (day 0 is within [−6, 0] of day 3) and B; WAU(day 10) counts only A
    (B's day 3 aged out); stickiness is dau/wau exactly."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def day(n):
        return t0 + dt.timedelta(days=n)

    rows = [
        (1, day(0), 1, "view", 1.0),
        (2, day(10), 1, "view", 1.0),
        (3, day(3), 2, "view", 1.0),
    ]
    out = {r.day_idx: r for r in _Q["q189_rolling_active_users"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()}
    epoch0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert set(out) == {epoch0, epoch0 + 3, epoch0 + 10}
    assert out[epoch0].dau == 1 and out[epoch0].wau == 1
    assert out[epoch0 + 3].dau == 1 and out[epoch0 + 3].wau == 2
    assert out[epoch0 + 3].stickiness == 0.5
    assert out[epoch0 + 10].dau == 1 and out[epoch0 + 10].wau == 1


def test_rolling_active_users_wau_at_least_dau(spark, sf_dir):
    rows = _Q["q189_rolling_active_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau >= 1
        assert 0 < r.stickiness <= 1.0
