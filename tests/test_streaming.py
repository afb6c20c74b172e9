"""Batch/stream equivalence: the streaming tumbling-window plan under
trigger(availableNow) must reproduce the batch q27 result exactly
(which is itself DuckDB-oracle-checked)."""

from __future__ import annotations

import shutil
import tempfile

from big_data_computing_final_project_spark.plans import all_queries
from big_data_computing_final_project_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    tumbling_counts,
)


def test_stream_equals_batch_tumbling(spark, sf_dir):
    ckpt = tempfile.mkdtemp(prefix="ckpt_stream_")
    try:
        events = stream_events(spark, sf_dir)
        result = tumbling_counts(events)
        run_stream_to_memory(result, "stream_tumbling", ckpt)
        streamed = {
            tuple(r) for r in spark.sql("SELECT * FROM stream_tumbling").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    batch = {tuple(r) for r in all_queries()["q27_tumbling_window"](spark, sf_dir).collect()}
    assert streamed == batch
    assert len(batch) > 0
