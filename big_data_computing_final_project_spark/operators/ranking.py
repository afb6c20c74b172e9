"""Distributed exact global ranking — ROW_NUMBER and NTILE without the
single-partition window.

`Window.orderBy(...)` with no partition key moves EVERY row into one task:
correct, and unbounded at scale — the cliff the sf1x stress caught in q170
and a review pass then found in q172/q173/q177. The exact global rank
decomposes whenever a coarse BUCKET that is monotone in the sort order is
available:

    global_rank(row) = (# rows in earlier buckets) + (rank within bucket)

Bucket row-counts are one partial-aggregated groupBy; their cumulative
offsets are a window over DISTINCT BUCKET VALUES ONLY (bounded by the
bucket domain, not the table — e.g. epoch days, cents-div-1000 price
bands); the within-bucket row_number parallelizes across bucket
partitions. Same numbers as the naive form, no single-partition stage.

NTILE then follows from the global rank in closed form (standard SQL
semantics: the first n mod k tiles get one extra row):

    q, r = divmod(n, k)
    tile(rank) = (rank-1) // (q+1) + 1                  if rank <= r*(q+1)
                 r + (rank-1 - r*(q+1)) // q + 1        otherwise

Used by q177 (RFM quintiles); unit-pinned equal to F.ntile / row_number on
shuffled inputs, including the n < k and all-ties edges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__rank_bucket"
_OFF = "__rank_offset"
_N = "__rank_n"


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column | None = None,
    rank_col: str = "rank",
    n_col: str | None = None,
) -> DataFrame:
    """Exact global ROW_NUMBER() over ``order_cols`` (ties broken by the
    full column list — pass a unique suffix for determinism), computed
    distributively via ``bucket`` (default: the first order column). The
    bucket expression MUST be monotone non-decreasing in the sort order
    and should have a bounded value domain. Optionally also attaches the
    total row count as ``n_col`` (needed by ntile)."""
    b = bucket if bucket is not None else F.col(order_cols[0])
    tagged = df.withColumn(_BKT, b)
    grp = tagged.groupBy(_BKT).agg(F.count(F.lit(1)).alias("__gcnt"))
    # asc_nulls_first matches Window.orderBy's default NULL placement, so a
    # NULL bucket (from a NULL leading sort key) ranks first, not dropped
    cum = Window.orderBy(F.asc_nulls_first(_BKT)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = grp.select(
        F.col(_BKT).alias("__obkt"),
        F.coalesce(F.sum("__gcnt").over(cum), F.lit(0)).alias(_OFF),
        F.sum("__gcnt").over(Window.partitionBy()).alias(_N),
    )
    rn = F.row_number().over(Window.partitionBy(_BKT).orderBy(*order_cols))
    out = (
        # eqNullSafe: a plain equi-join silently DELETES null-bucket rows
        tagged.join(
            F.broadcast(offs), F.col(_BKT).eqNullSafe(F.col("__obkt"))
        )
        .withColumn(rank_col, (F.col(_OFF) + rn).cast("bigint"))
        .drop(_BKT, "__obkt", _OFF)
    )
    if n_col is not None:
        out = out.withColumnRenamed(_N, n_col)
    else:
        out = out.drop(_N)
    return out


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """NTILE(tiles) from a 1-based global rank and the total count —
    standard SQL semantics (first n mod tiles tiles take the extra row).
    Divisions are exact-double (numerators are exact multiples of their
    divisors), so correctness requires n < 2^53 — document-level bound,
    same as every epoch/count column here. q == 0 (n < tiles) degenerates
    to rank itself, matching NTILE."""
    q = (n - n % tiles) / tiles  # exact: numerator is a multiple of tiles
    q = q.cast("bigint")
    r = (n % tiles).cast("bigint")
    head = r * (q + 1)
    in_head = rank <= head
    tile_head = ((rank - 1) - (rank - 1) % (q + 1)) / (q + 1) + 1
    tile_tail = r + ((rank - 1 - head) - (rank - 1 - head) % q) / F.when(
        q > 0, q
    ).otherwise(F.lit(1)) + 1
    return (
        F.when(in_head, tile_head).otherwise(tile_tail).cast("int")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    tiles: int,
    bucket: Column | None = None,
    out_col: str = "ntile",
) -> DataFrame:
    """NTILE(tiles) over a global ordering, without a single-partition
    window (see module docstring)."""
    ranked = global_rank(
        df, order_cols, bucket=bucket, rank_col="__rank", n_col="__n"
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("__rank"), F.col("__n"), tiles)
    ).drop("__rank", "__n")
