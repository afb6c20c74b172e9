"""Semantic pins for the data-layout family (plans/layout.py).

Oracle parity hash-matches q170-q173 against DuckDB; these tests pin the
LAYOUT DECISIONS themselves: z-order must actually prune both dimensions,
the compaction packer must conserve bytes and bound overshoot, a planted
hot key must draw a 'salt' recommendation, and planted run/cardinality
patterns must pick RLE / DICT / PLAIN respectively.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()

_LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)


def _write_lineitem(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, _LINEITEM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# q170 z-order pruning
# ---------------------------------------------------------------------------


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    out = {r.layout: r for r in _Q["q170_zorder_layout"](spark, sf_dir).collect()}
    lin, zo = out["linear"], out["zorder"]
    assert lin.n_files == zo.n_files
    # linear is sorted by x: near-perfect x pruning, but y hits everything
    assert lin.files_hit_x <= lin.n_files // 8
    assert lin.files_hit_y >= zo.n_files - 2
    # z-order pays a little on x to win a lot on y: both dims bounded,
    # and the worst dimension is strictly better than linear's worst
    assert zo.files_hit_x < lin.files_hit_y
    assert zo.files_hit_y < lin.files_hit_y
    assert zo.files_hit_x + zo.files_hit_y < lin.files_hit_x + lin.files_hit_y


# ---------------------------------------------------------------------------
# q171 compaction plan
# ---------------------------------------------------------------------------


def test_compaction_conserves_bytes_and_bounds_overshoot(spark, sf_dir):
    target = 200_000
    out = _Q["q171_compaction_plan"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    manifest = (
        docs.groupBy("source", (F.col("doc_id") % 50).alias("fk"))
        .agg(F.sum("n_chars").alias("b"))
        .collect()
    )
    # conservation: packed bytes == manifest bytes, per source
    got = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + r.total_bytes
    want = {}
    for r in manifest:
        want[r.source] = want.get(r.source, 0) + r.b
    assert got == want
    # groups are contiguous 0..max per source
    per_src_groups = {}
    for r in out:
        per_src_groups.setdefault(r.source, []).append(r.grp)
    for grps in per_src_groups.values():
        assert sorted(grps) == list(range(len(grps)))
    # bounded overshoot: a group never exceeds target + its largest file
    max_file = max(r.b for r in manifest)
    assert all(r.total_bytes < target + max_file for r in out)


# ---------------------------------------------------------------------------
# q172 partition-skew audit
# ---------------------------------------------------------------------------


def test_skew_audit_flags_planted_hot_key(spark, tmp_path):
    """900 of 1000 rows on one supplier: l_suppkey must read 'salt' with a
    high Gini; the uniform candidates stay 'hash'."""
    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for i in range(1000):
        supp = 1 if i < 900 else (i % 50) + 2
        rows.append(
            (i, i % 200, supp, 1, float(i % 7), "A", "F", d0 + dt.timedelta(hours=i))
        )
    out = {
        r.candidate: r
        for r in _Q["q172_partition_skew_audit"](
            spark, _write_lineitem(spark, tmp_path, rows)
        ).collect()
    }
    assert out["l_suppkey"].recommendation == "salt"
    assert out["l_suppkey"].top_share == 0.9
    assert out["l_suppkey"].gini > 0.8
    assert out["l_partkey"].recommendation == "hash"
    assert out["l_partkey"].gini < 0.1


def test_skew_audit_gini_uniform_is_zero(spark, tmp_path):
    """Perfectly uniform keys -> Gini exactly 0 (the exact-int formula hits
    0, not an epsilon)."""
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 10, i % 10 + 1, 1, 1.0, "A", "F", d0 + dt.timedelta(hours=i % 24))
        for i in range(1000)
    ]
    out = {
        r.candidate: r
        for r in _Q["q172_partition_skew_audit"](
            spark, _write_lineitem(spark, tmp_path, rows)
        ).collect()
    }
    assert out["l_partkey"].gini == 0.0
    assert out["l_partkey"].skew_factor == 1.0


# ---------------------------------------------------------------------------
# q173 encoding advisor
# ---------------------------------------------------------------------------


def test_encoding_advisor_picks_planted_encodings(spark, tmp_path):
    """Long runs -> RLE; tiny dictionary scattered -> DICT; unique -> PLAIN."""
    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for i in range(1000):
        rows.append(
            (
                i,  # l_orderkey: write order
                i,  # l_partkey: unique -> PLAIN
                1,
                1,  # l_linenumber
                float(i) + 0.5,  # l_quantity: unique -> PLAIN
                "R" if (i // 100) % 2 == 0 else "N",  # runs of 100 -> RLE
                "P" if i % 2 == 0 else "F",  # alternating, ndv=2 -> DICT
                d0 + dt.timedelta(days=i // 200),  # runs of 200 -> RLE
            )
        )
    out = {
        r.col_name: r
        for r in _Q["q173_encoding_advisor"](
            spark, _write_lineitem(spark, tmp_path, rows)
        ).collect()
    }
    assert out["l_returnflag"].encoding == "RLE"
    assert out["l_returnflag"].avg_run_len == 100.0
    assert out["l_linestatus"].encoding == "DICT"
    assert out["l_linestatus"].ndv == 2
    assert out["l_partkey"].encoding == "PLAIN"
    assert out["l_partkey"].dict_ratio == 1.0
    assert out["l_shipdate"].encoding == "RLE"
    assert out["l_quantity"].encoding == "PLAIN"


def test_encoding_advisor_real_data_sanity(spark, sf_dir):
    out = {r.col_name: r for r in _Q["q173_encoding_advisor"](spark, sf_dir).collect()}
    assert len(out) == 5
    # 3-value flag scattered row-to-row: dictionary, not runs
    assert out["l_returnflag"].ndv <= 3
    assert out["l_returnflag"].encoding == "DICT"
    # keys are high-cardinality: never DICT
    assert out["l_partkey"].encoding == "PLAIN"
