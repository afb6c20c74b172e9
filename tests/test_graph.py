"""Semantic pins for the graph family (plans/graph.py).

Oracle parity hash-matches q174/q175 against DuckDB (which runs the same
unrolled iterations), so these tests pin the GRAPH SEMANTICS independently:
PageRank must conserve mass up to floor loss and rank a planted hub first;
the triangle census must equal trace(A^3)/6 computed from a dense adjacency
matrix, and must be exact on a hand-countable planted clique.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import types as T

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()

_UNIT = 1_000_000_000_000

_LI_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
    ]
)
_ORD_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampType()),
    ]
)


def _write_graph(spark, tmp_path, order_to_cust, lines) -> str:
    """lines: [(orderkey, partkey, suppkey)]; order_to_cust: {orderkey: custkey}."""
    d0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(o, c, d0) for o, c in order_to_cust.items()], _ORD_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(lines, _LI_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# q174 PageRank
# ---------------------------------------------------------------------------


def test_pagerank_mass_conserved_up_to_floor_loss(spark, sf_dir):
    rows = _Q["q174_pagerank"](spark, sf_dir).collect()
    n = len(rows)
    total = sum(r.rank_units for r in rows)
    # every one of the 6 integer steps floors away < 1 unit per node per
    # division (r0, base, per-edge share, the 85% scale) — generous bound
    assert _UNIT - 20 * n * 6 <= total <= _UNIT
    assert all(r.rank_units > 0 for r in rows)
    assert all(abs(r.rank - r.rank_units / _UNIT) < 1e-15 for r in rows)


def test_pagerank_ranks_planted_hub_first(spark, tmp_path):
    """Star: customer 1 trades with suppliers 1..10; customer 2 with
    supplier 1 only. Hub C:1 must rank highest; the symmetric leaves
    S:2..S:10 must tie exactly (integer arithmetic, so EXACTLY)."""
    orders = {i: 1 for i in range(1, 11)}
    orders[11] = 2
    lines = [(i, 1, i) for i in range(1, 11)] + [(11, 1, 1)]
    out = {
        r.node: r.rank_units
        for r in _Q["q174_pagerank"](
            spark, _write_graph(spark, tmp_path, orders, lines)
        ).collect()
    }
    assert len(out) == 12
    assert max(out, key=out.get) == "C:1"
    leaf_ranks = {out[f"S:{i}"] for i in range(2, 11)}
    assert len(leaf_ranks) == 1
    assert out["S:1"] > out["S:2"]
    assert out["C:2"] < out["S:1"]


# ---------------------------------------------------------------------------
# q175 triangle census
# ---------------------------------------------------------------------------


def test_triangle_census_planted_clique(spark, tmp_path):
    """One order with parts {1,2,3,4} (a K4: 4 triangles, 12 wedges,
    clustering 1.0) plus an isolated edge {5,6}."""
    orders = {1: 1, 2: 2}
    lines = [(1, p, 1) for p in (1, 2, 3, 4)] + [(2, 5, 1), (2, 6, 1)]
    out = _Q["q175_triangle_census"](
        spark, _write_graph(spark, tmp_path, orders, lines)
    ).collect()[0]
    assert out.n_nodes == 6
    assert out.n_edges == 7  # C(4,2) + 1
    assert out.n_triangles == 4
    assert out.wedges == 12
    assert out.clustering_coeff == 1.0


def test_triangle_census_matches_dense_adjacency(spark, sf_dir):
    """Independent recount: trace(A^3)/6 over the dense co-purchase
    adjacency matrix built in numpy."""
    out = _Q["q175_triangle_census"](spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    parts = sorted(li.l_partkey.unique())
    idx = {p: i for i, p in enumerate(parts)}
    a = np.zeros((len(parts), len(parts)), dtype=np.int64)
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i, p in enumerate(ps):
            for q in ps[i + 1 :]:
                a[idx[p], idx[q]] = 1
                a[idx[q], idx[p]] = 1
    tri = int(np.trace(a @ a @ a)) // 6
    deg = a.sum(axis=1)
    wedges = int((deg * (deg - 1) // 2).sum())
    assert out.n_triangles == tri
    assert out.wedges == wedges
    assert out.n_edges == int(a.sum()) // 2
    assert out.n_nodes == int((deg > 0).sum())
