"""Temporal join operators the reference lacks and Spark has no builtin for.

``asof_join`` implements the classic "latest right row at or before each
left timestamp" join (kdb+ aj / pandas merge_asof / DuckDB ASOF JOIN) as a
composition of existing DataFrame ops — the SURVEY §2 custom-operator rule
(a): no Python in the row path, no UDF.

Distributed shape: union the two sides, hash-partition by the join keys,
sort each partition by (ts, side), and carry the right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding row frame. One
shuffle + one sort — the same cost as any keyed window; at 100 TB the only
caveat is per-key skew, which AQE's skew handling and key salting address
the same way they do for any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and equal ``on`` keys (inclusive,
    ASOF-JOIN ">=" semantics); left rows with no prior right row keep NULLs.

    The right side must be unique per (on, right_ts) — ties there make any
    as-of join nondeterministic (pre-aggregate duplicates away first).
    Returns all left columns plus ``payload``.
    """
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn(_TS, F.col(left_ts))
    r_tagged = (
        right.select(
            *on,
            F.col(right_ts).alias(_TS),
            F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l_tagged = l_tagged.withColumn(_PAYLOAD, F.lit(None).cast(r_tagged.schema[_PAYLOAD].dataType))

    merged = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    # right rows (_SIDE=0) sort before left rows at an equal timestamp, so a
    # left row sees a right row with the exact same ts — inclusive semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    return (
        carried.filter(F.col(_SIDE) == 1)
        .select(*left.columns, *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload])
    )
