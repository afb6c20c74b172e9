"""Semantic pins for the warehouse-maintenance family (plans/cdc.py).

The oracle-parity test already hash-matches all three queries against
DuckDB; these tests pin the MERGE SEMANTICS themselves — the properties a
hash match alone wouldn't explain to a reader: no-op updates must not
version, latest-wins must actually pick the highest sequence, EWMA must
equal an independently computed weighted mean.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


# ---------------------------------------------------------------------------
# q163 SCD2 merge
# ---------------------------------------------------------------------------


def test_scd2_planted_noops_stay_single_version(spark, sf_dir):
    """custkey % 11 == 0 updates are planted no-ops (incoming == current):
    a correct merge leaves them as ONE open seed version."""
    out = _Q["q163_scd2_merge"](spark, sf_dir)
    noop = out.filter((F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") < 10_000_000))
    per_key = noop.groupBy("c_custkey").count()
    assert per_key.filter(F.col("count") != 1).count() == 0
    assert noop.filter(~F.col("is_current")).count() == 0


def test_scd2_changed_keys_have_closed_plus_open_version(spark, sf_dir):
    out = _Q["q163_scd2_merge"](spark, sf_dir).cache()
    try:
        two = (
            out.filter(F.col("c_custkey") < 10_000_000)
            .groupBy("c_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_current").cast("int")).alias("n_open"),
                F.max(F.col("valid_to").isNotNull().cast("int")).alias("has_closed"),
            )
            .filter(F.col("n") == 2)
        )
        # every 2-version key: exactly one open row and one closed row,
        # and the closed row's valid_to equals the open row's valid_from
        assert two.filter((F.col("n_open") != 1) | (F.col("has_closed") != 1)).count() == 0
        handoff = (
            out.filter(F.col("valid_to").isNotNull())
            .select("c_custkey", F.col("valid_to").alias("vt"))
            .join(
                out.filter(F.col("is_current") & (F.col("valid_from") > "1990-01-01")),
                "c_custkey",
            )
            .filter(F.col("vt") != F.col("valid_from"))
        )
        assert handoff.count() == 0
        # inserts carry the synthetic key offset and are open-only
        ins = out.filter(F.col("c_custkey") >= 10_000_000)
        assert ins.count() > 0
        assert ins.filter(~F.col("is_current") | F.col("valid_to").isNotNull()).count() == 0
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# q164 CDC apply
# ---------------------------------------------------------------------------


def test_cdc_latest_wins_and_deletes(spark, sf_dir):
    """Recompute the expected per-status counts straight from the base
    snapshot's key residues: %20==3 deleted; %20==1 ends 'U2' (seq 3 beats
    seq 1); the remaining %10 in (1,2,3) keys end 'U1'; %50==7 spawns
    'NEW' inserts; everything else keeps its base status."""
    from big_data_computing_final_project_spark.catalog import load_table

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st")
    )
    k = F.col("k")
    expected = {
        "U1": base.filter((k % 10).isin(1, 2, 3) & (k % 20 != 3) & (k % 20 != 1)).count(),
        "U2": base.filter(k % 20 == 1).count(),
        "NEW": base.filter(k % 50 == 7).count(),
    }
    untouched = base.filter(~(k % 10).isin(1, 2, 3)).groupBy("st").count().collect()
    for r in untouched:
        expected[r["st"]] = expected.get(r["st"], 0) + r["count"]
    got = {
        r["o_orderstatus"]: r["n_orders"]
        for r in _Q["q164_cdc_apply"](spark, sf_dir).collect()
    }
    assert got == {s: n for s, n in expected.items() if n > 0}


# ---------------------------------------------------------------------------
# q165 EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_independent_computation(spark, sf_dir):
    """Pin one priority's full EWMA series against a direct Python
    recomputation from the same monthly revenues (alpha=0.5, trailing 12
    months by INDEX DISTANCE — gap months age observations out)."""
    rows = (
        _Q["q165_ewma_revenue"](spark, sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("month_idx")
        .collect()
    )
    assert len(rows) > 12
    series = [(r["month_idx"], r["revenue"]) for r in rows]
    for pos, r in enumerate(rows):
        num = den = 0.0
        for idx, rev in series[: pos + 1]:
            gap = r["month_idx"] - idx
            if gap <= 11:
                w = 0.5 ** gap
                num += rev * w
                den += w
        assert math.isclose(r["ewma"], num / den, rel_tol=1e-9), r


# ---------------------------------------------------------------------------
# streaming twin (streaming/events.run_stream_cdc_ops)
# ---------------------------------------------------------------------------


def _write_op_drops(spark, sf_dir, src_dir, seq_groups):
    """Stage the derived CDC log as parquet drops (one per seq group) with
    monotonic past mtimes — FileStreamSource processes oldest-first, so
    this pins arrival order without sleeps."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.plans.cdc import cdc_base, derive_cdc_ops

    ops = derive_cdc_ops(cdc_base(spark, sf_dir))
    arrow_schema = pa.schema(
        [
            ("k", pa.int64()),
            ("seq", pa.int32()),
            ("op", pa.string()),
            ("st", pa.string()),
            ("pr", pa.float64()),
        ]
    )
    src_dir.mkdir()
    base_t = time.time() - 3600
    for i, seqs in enumerate(seq_groups):
        rows = [tuple(r) for r in ops.filter(F.col("seq").isin(*seqs)).collect()]
        tbl = pa.Table.from_pylist(
            [dict(zip(("k", "seq", "op", "st", "pr"), r)) for r in rows],
            schema=arrow_schema,
        )
        p = str(src_dir / f"drop_{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (base_t + 10 * i, base_t + 10 * i))
    return str(src_dir)


def _ops_stream(spark, src_dir):
    from big_data_computing_final_project_spark.plans.cdc import CDC_OPS_SCHEMA

    return (
        spark.readStream.schema(CDC_OPS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def test_stream_cdc_store_equals_batch_q164_any_arrival_order(spark, sf_dir, tmp_path):
    """CDC-at-ingest twin: the op log arrives as one micro-batch per
    sequence point; the store's post-apply fingerprint must equal batch
    q164 exactly — in seq order AND in REVERSED order (latest-wins merges
    by seq, not by arrival, the stronger contract the batch==stream pin
    exercises), and compaction must not change the fold while continued
    ingestion (the seq-3 drop after compacting seqs 1-2) still lands."""
    from big_data_computing_final_project_spark.plans.cdc import cdc_base
    from big_data_computing_final_project_spark.streaming.events import (
        cdc_snapshot_from_store,
        compact_cdc_store,
        run_stream_cdc_ops,
    )

    base = cdc_base(spark, sf_dir)
    want = [tuple(r) for r in _Q["q164_cdc_apply"](spark, sf_dir).collect()]

    for label, groups in (("inorder", [[1], [2], [3]]), ("reversed", [[3], [2], [1]])):
        src = _write_op_drops(spark, sf_dir, tmp_path / f"ops_{label}", groups)
        store = str(tmp_path / f"store_{label}")
        run_stream_cdc_ops(_ops_stream(spark, src), store, str(tmp_path / f"ckpt_{label}"))
        got = [tuple(r) for r in cdc_snapshot_from_store(spark, base, store).collect()]
        assert got == want, label

    # compaction mid-ingest: seqs 1-2 arrive, compact, then seq 3 arrives
    src = _write_op_drops(spark, sf_dir, tmp_path / "ops_split", [[1, 2]])
    store, ckpt = str(tmp_path / "store_split"), str(tmp_path / "ckpt_split")
    run_stream_cdc_ops(_ops_stream(spark, src), store, ckpt)
    compact_cdc_store(spark, store)
    import os

    late = _write_op_drops(spark, sf_dir, tmp_path / "ops_late", [[3]])
    for f in os.listdir(late):
        os.rename(os.path.join(late, f), os.path.join(src, "late_" + f))
    run_stream_cdc_ops(_ops_stream(spark, src), store, ckpt)
    got = [tuple(r) for r in cdc_snapshot_from_store(spark, base, store).collect()]
    assert got == want


def test_cdc_empty_store_is_unchanged_base(spark, sf_dir, tmp_path):
    from big_data_computing_final_project_spark.plans.cdc import (
        cdc_base,
        cdc_status_fingerprint,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        cdc_snapshot_from_store,
    )

    base = cdc_base(spark, sf_dir)
    want = [
        tuple(r)
        for r in cdc_status_fingerprint(base.withColumn("op", F.lit(None).cast("string")))
        .collect()
    ]
    got = [
        tuple(r)
        for r in cdc_snapshot_from_store(spark, base, str(tmp_path / "nostore")).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# q166 snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_round_trip(spark, sf_dir):
    """The reconciliation law: applying the diff as a one-cut op log
    reproduces the target exactly (row-for-row, both directions empty
    under exceptAll)."""
    from big_data_computing_final_project_spark.plans.cdc import (
        apply_cdc_ops,
        cdc_base,
        derive_cdc_ops,
        latest_cdc_ops,
        snapshot_diff,
    )

    base = cdc_base(spark, sf_dir)
    target = apply_cdc_ops(base, latest_cdc_ops(derive_cdc_ops(base))).select(
        "k", "st", "pr"
    )
    ops = snapshot_diff(base, target).withColumn("seq", F.lit(1))
    rebuilt = apply_cdc_ops(base, ops.select("k", "seq", "op", "st", "pr")).select(
        "k", "st", "pr"
    )
    assert rebuilt.exceptAll(target).count() == 0
    assert target.exceptAll(rebuilt).count() == 0


def test_snapshot_diff_identical_snapshots_is_empty(spark, sf_dir):
    from big_data_computing_final_project_spark.plans.cdc import cdc_base, snapshot_diff

    base = cdc_base(spark, sf_dir)
    assert snapshot_diff(base, base).count() == 0


# ---------------------------------------------------------------------------
# q184 deletion manifest
# ---------------------------------------------------------------------------


def test_deletion_manifest_counts_full_cascade(spark, sf_dir):
    """The manifest's per-table totals must equal the true cascade sizes
    recomputed directly, and the customer shard histogram must cover only
    subjects (custkey % 97 == 0)."""
    out = _Q["q184_deletion_manifest"](spark, sf_dir).collect()
    per_table = {}
    for r in out:
        per_table[r.table_name] = per_table.get(r.table_name, 0) + r.n_rows
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 97 == 0
    )
    subj = {r.c_custkey for r in cust.select("c_custkey").collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    del_orders = {
        r.o_orderkey
        for r in orders.filter(F.col("o_custkey").isin(list(subj))).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_li = li.filter(F.col("l_orderkey").isin(list(del_orders))).count()
    assert per_table["customer"] == len(subj)
    assert per_table["orders"] == len(del_orders)
    assert per_table["lineitem"] == n_li
    assert all(0 <= r.shard <= 15 for r in out)


# ---------------------------------------------------------------------------
# q185 SCD2 point-in-time join
# ---------------------------------------------------------------------------


def test_scd2_pit_join_conserves_orders_and_respects_epochs(spark, sf_dir):
    """The SCD2 invariant (non-overlapping versions covering every date)
    means each order matches EXACTLY one version: total n_orders equals the
    orders rowcount. Orders strictly before the effective date can only sit
    in the seed epoch."""
    import datetime as dt

    rows = _Q["q185_scd2_pit_join"](spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    epochs = {r.version_epoch for r in rows}
    assert dt.date(1990, 1, 1) in epochs
    seed = [r for r in rows if r.version_epoch == dt.date(1990, 1, 1)][0]
    pre_eff = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp_ntz"))
        .count()
    )
    # every pre-effective order is in the seed epoch; the seed epoch may
    # also hold post-effective orders of customers whose merge was a no-op
    assert seed.n_orders >= pre_eff
