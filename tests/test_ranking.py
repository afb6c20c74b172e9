"""Unit pins for operators/ranking.py: the distributed global rank / NTILE
must equal the single-partition window forms exactly — including the
n < tiles and heavy-ties edges — on deliberately shuffled input."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_computing_final_project_spark.operators.ranking import (
    distributed_ntile,
    global_rank,
)


def _df(spark, vals):
    # two-column rows: (v, uid); shuffled partitioning on purpose
    rows = [(v, i) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "v long, uid long").repartition(7, "uid")


def test_global_rank_equals_window_row_number(spark):
    vals = [5, 3, 3, 9, 1, 3, 9, 0, 7, 7, 2, 2, 2, 8]
    df = _df(spark, vals)
    got = {
        r.uid: r.rank
        for r in global_rank(df, ["v", "uid"], rank_col="rank").collect()
    }
    want = {
        r.uid: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "uid"))
        ).collect()
    }
    assert got == want


def test_global_rank_with_coarse_bucket(spark):
    vals = list(range(100, 0, -1)) * 3
    df = _df(spark, vals)
    got = {
        r.uid: r.rank
        for r in global_rank(
            df, ["v", "uid"], bucket=(F.col("v") / 10).cast("bigint")
        ).collect()
    }
    want = {
        r.uid: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "uid"))
        ).collect()
    }
    assert got == want


def test_distributed_ntile_matches_window_ntile(spark):
    for n, tiles in ((14, 5), (15, 5), (3, 5), (1, 5), (100, 7), (12, 12)):
        vals = [(i * 37) % 23 for i in range(n)]
        df = _df(spark, vals)
        got = {
            r.uid: r.t
            for r in distributed_ntile(df, ["v", "uid"], tiles, out_col="t").collect()
        }
        want = {
            r.uid: r.t
            for r in df.withColumn(
                "t", F.ntile(tiles).over(Window.orderBy("v", "uid"))
            ).collect()
        }
        assert got == want, (n, tiles)


def test_distributed_ntile_all_ties(spark):
    df = _df(spark, [4] * 11)
    got = {
        r.uid: r.t for r in distributed_ntile(df, ["v", "uid"], 4, out_col="t").collect()
    }
    want = {
        r.uid: r.t
        for r in df.withColumn(
            "t", F.ntile(4).over(Window.orderBy("v", "uid"))
        ).collect()
    }
    assert got == want
