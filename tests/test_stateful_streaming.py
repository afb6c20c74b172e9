"""Stateful streaming operators vs batch references.

- applyInPandasWithState sessionizer: streamed CLOSED sessions must equal
  the batch gaps-and-islands sessions minus each user's final (still-open)
  session.
- dropDuplicatesWithinWatermark: a doubled source (union of the stream with
  itself) dedups back to the batch row count.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from big_data_computing_final_project_spark.streaming import run_stream_to_memory, stream_events
from big_data_computing_final_project_spark.streaming.stateful import dedup_stream, sessionize_stream


def _run(df, name, fmt_mode="append"):
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(fmt_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if q.isActive:
            q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_sessionizer_matches_batch(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    _run(sessionize_stream(events), "sessions_stream")
    streamed = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }

    # batch reference: gaps-and-islands sessions, excluding each user's last
    from big_data_computing_final_project_spark.catalog import epoch_us, load_table

    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        (
            (epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))) >= 30 * 60 * 1_000_000
        ).cast("int"),
    ).na.fill(0, ["new_session"])
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    batch_sessions = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events")
    )
    last_per_user = batch_sessions.groupBy("user_id").agg(
        F.max("session_id").alias("last_sid")
    )
    closed = batch_sessions.join(
        last_per_user,
        (batch_sessions.user_id == last_per_user.user_id)
        & (batch_sessions.session_id == last_per_user.last_sid),
        "left_anti",
    )
    expected = {(r.user_id, r.session_start, r.n_events) for r in closed.collect()}
    assert streamed == expected
    assert len(expected) > 0


def test_stream_dedup_within_watermark(spark, sf_dir):
    a = stream_events(spark, sf_dir)
    b = stream_events(spark, sf_dir)
    doubled = a.unionByName(b)
    _run(dedup_stream(doubled), "dedup_stream")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_stream").first().n
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == n_batch


def test_tws_pipelines_import_and_plan_build(spark, sf_dir):
    """Guard for the v2 TWS operators (streaming/tws.py): this container
    lacks the python protobuf runtime TWS needs at EXECUTION time, so
    test_tws_streaming.py skips — but import, pipeline construction, and
    analysis are protobuf-free and must keep working. Pins the analyzed
    output schemas and that the plan actually routes through
    transformWithStateInPandas, so a refactor can't silently break the
    only not-executed surface in the repo before a protobuf-equipped
    environment runs the full tests."""
    from big_data_computing_final_project_spark.streaming.tws import (
        running_user_stats,
        sessionize_with_timers,
    )

    events = stream_events(spark, sf_dir)

    running = running_user_stats(events.withColumn("value", F.lit(1.0)))
    assert running.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in running.schema.fields] == [
        ("user_id", "bigint"),
        ("n_events", "bigint"),
        ("total_value", "double"),
    ]

    sessions = sessionize_with_timers(events)
    assert sessions.isStreaming
    assert [f.name for f in sessions.schema.fields] == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        "flushed_by_timer",
    ]
    for df in (running, sessions):
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "TransformWithStateIn" in plan, plan[:500]
