"""asof_join operator semantics on a hand-built frame, plus the registered
temporal queries' shapes. Value parity for q65/q66 is the DuckDB oracle's
job (tools/check_oracle.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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
