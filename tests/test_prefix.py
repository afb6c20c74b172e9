"""Unit pins for operators/prefix.py: the distributed prefix scan must
equal the single-partition window forms exactly — sum/max/min, strict and
inclusive frames, with and without partition keys — on shuffled input."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_computing_final_project_spark.operators.prefix import prefix_agg


def _df(spark, vals):
    rows = [(v, i, i % 3) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "v long, uid long, g int").repartition(7, "uid")


def test_prefix_sum_equals_window(spark):
    vals = [5, 3, 3, 9, 1, 3, 9, 0, 7, 7, 2, 2, 2, 8]
    df = _df(spark, vals)
    got = {
        r.uid: r.cum
        for r in prefix_agg(df, ["v", "uid"], "v", "cum", agg="sum").collect()
    }
    want = {
        r.uid: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("v").over(
                Window.orderBy("v", "uid").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == want


def test_prefix_max_strict_with_coarse_bucket(spark):
    # unique order keys (one row per v required for strict): v = permutation
    vals = [(i * 37) % 100 for i in range(100)]
    assert len(set(vals)) == 100
    df = _df(spark, vals)
    got = {
        r.uid: r.m
        for r in prefix_agg(
            df,
            ["v"],
            "uid",
            "m",
            agg="max",
            bucket=(F.col("v") / 10).cast("bigint"),
            strict=True,
        ).collect()
    }
    want = {
        r.uid: r.m
        for r in df.withColumn(
            "m",
            F.max("uid").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
            ),
        ).collect()
    }
    assert got == want  # includes the NULL first-row strict frame


def test_prefix_sum_partitioned_equals_window(spark):
    vals = [5, 3, 3, 9, 1, 3, 9, 0, 7, 7, 2, 2, 2, 8, 4, 6]
    df = _df(spark, vals)
    got = {
        r.uid: r.cum
        for r in prefix_agg(
            df,
            ["v", "uid"],
            "v",
            "cum",
            agg="sum",
            partition_cols=["g"],
            bucket=(F.col("v") / 4).cast("bigint"),
        ).collect()
    }
    want = {
        r.uid: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("v").over(
                Window.partitionBy("g")
                .orderBy("v", "uid")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == want


def test_prefix_min_null_bucket_rows_survive(spark):
    rows = [(None if i % 4 == 0 else (i * 7) % 30, i) for i in range(40)]
    df = spark.createDataFrame(rows, "v long, uid long").repartition(5, "uid")
    out = prefix_agg(df, ["v", "uid"], "uid", "m", agg="min").collect()
    assert len(out) == 40
    want = {
        r.uid: r.m
        for r in df.withColumn(
            "m",
            F.min("uid").over(
                Window.orderBy(F.asc_nulls_first("v"), "uid").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert {r.uid: r.m for r in out} == want
