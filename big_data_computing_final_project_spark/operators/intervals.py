"""Interval overlap join without an equi-key — the temporal-binning trick.

Spark compiles a pure theta join (`a.start <= b.end AND b.start <= a.end`)
to BroadcastNestedLoopJoin or CartesianProduct: O(|a|·|b|) comparisons and
a driver-sized broadcast. When intervals are bounded in length, the
standard escape is COARSE TIME BUCKETS: explode each interval to the
buckets it touches, equi-join on the bucket (overlapping intervals must
share at least one bucket), de-duplicate the (id_a, id_b) candidates that
met in several buckets, and verify the exact predicate on candidates only.
Cost: one shuffle keyed on the bucket; join width is per-bucket interval
count, never the corpus.

Bucket width trades explosion against selectivity: width ~ the typical
interval length keeps the per-interval explode factor ~2 while random
non-overlapping pairs rarely share a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_overlap_pairs(
    df: DataFrame,
    bucket_width: int,
    id_col: str = "id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """(id_a, id_b) with id_a < id_b for every pair of rows whose CLOSED
    integer intervals [start, end] overlap. ``start``/``end`` must be
    integral (epoch days/seconds/us) with start <= end."""
    bkt = F.explode(
        F.sequence(
            (F.col(start_col) / bucket_width).cast("bigint"),
            (F.col(end_col) / bucket_width).cast("bigint"),
        )
    ).alias("bkt")
    ex = df.select(F.col(id_col), F.col(start_col), F.col(end_col), bkt)
    a = ex.select(
        F.col(id_col).alias("id_a"),
        F.col(start_col).alias("sa"),
        F.col(end_col).alias("ea"),
        "bkt",
    )
    b = ex.select(
        F.col(id_col).alias("id_b"),
        F.col(start_col).alias("sb"),
        F.col(end_col).alias("eb"),
        "bkt",
    )
    return (
        a.join(b, "bkt")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
