"""Tests for the skew-safe aggregation patterns (plans/scale.py), the
variant JSON path (q76), and the round-2 hardening fixes: LSH dim guard,
connected-components convergence warning, cross-chunk sessionizer sort.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from big_data_computing_final_project_spark.plans import all_queries

from tests.test_plan_shape import plan_of


def test_q79_sketch_distinct_error_bound(spark, sf_dir):
    approx = {
        r.event_type: r.n_users_approx
        for r in all_queries()["q79_sketch_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in all_queries()["q77_skew_distinct_twophase"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_q78_salt_in_plan(spark, sf_dir):
    plan = plan_of(all_queries()["q78_salted_agg"](spark, sf_dir), mode="simple")
    assert "pmod" in plan  # stage-1 grouping really includes the salt
    # two aggregation stages (each partial+final) => >= 4 HashAggregates
    assert plan.count("HashAggregate") >= 4


def test_q76_variant_stays_jvm_side(spark, sf_dir):
    plan = plan_of(all_queries()["q76_variant_json"](spark, sf_dir), mode="simple")
    assert "variant_get" in plan or "try_variant_get" in plan
    assert "BatchEvalPython" not in plan


def test_assert_dim_fails_loudly_on_width_mismatch(spark):
    from big_data_computing_final_project_spark.plans.similarity import assert_dim

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "id long, e array<double>")
    bad = df.select(assert_dim(F.col("e"), 64).alias("e"))
    with pytest.raises(Exception, match="dim mismatch"):
        bad.collect()


def test_connected_components_warns_when_unconverged(spark):
    from big_data_computing_final_project_spark.operators.graph import connected_components

    # a path graph 0-1-2-...-9 has diameter 9; 2 rounds cannot converge
    vertices = spark.range(10).toDF("id")
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(vertices, edges, max_iterations=2)


def test_chunking_partitions_every_token_exactly_once(spark, sf_dir):
    """q81 invariant: per doc, chunk sizes sum to the token count, chunk ids
    are dense from 0, and only the last chunk may be short."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.catalog import load_table
    from big_data_computing_final_project_spark.functions import text as X

    chunks = all_queries()["q81_chunk_documents"](spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("tok_sum"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        F.sum(F.when(F.col("n_chunk_tokens") < 32, 1).otherwise(0)).alias("n_short"),
    )
    truth = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )
    joined = per_doc.join(truth, "doc_id")
    bad = joined.filter(
        (F.col("tok_sum") != F.col("n_tokens"))
        | (F.col("max_id") != F.col("n_chunks") - 1)
        | (F.col("n_short") > 1)
    )
    assert bad.count() == 0
    assert per_doc.count() == truth.count()


def test_packing_conserves_tokens_and_fills_bins(spark, sf_dir):
    """q82 invariant: bin token totals sum to the corpus token total per
    source, and every bin except possibly the last holds >= the budget's
    worth of started content (bins are dense: 0..max)."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.catalog import load_table
    from big_data_computing_final_project_spark.functions import text as X

    bins = all_queries()["q82_pack_sequences"](spark, sf_dir)
    per_source = bins.groupBy("source").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("bin_id").alias("max_bin"),
    )
    truth = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(X.token_count(F.col("text"))).alias("n_tokens"))
    )
    joined = per_source.join(truth, "source")
    bad = joined.filter(
        (F.col("tok_sum") != F.col("n_tokens"))
        | (F.col("max_bin") != F.col("n_bins") - 1)
    )
    assert bad.count() == 0


def test_sessionize_sorts_across_arrow_chunks():
    """One user's events split over two Arrow chunks, second chunk holding
    the EARLIER half: per-chunk sorting would mis-split sessions; the global
    sort must reassemble one continuous session before gap detection."""
    from big_data_computing_final_project_spark.streaming.stateful import _sessionize

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    base = pd.Timestamp("2024-01-01 00:00:00")
    late = pd.DataFrame(
        {"ts": [base + pd.Timedelta(minutes=m) for m in (10, 15)], "value": [1.0, 1.0]}
    )
    early = pd.DataFrame(
        {"ts": [base + pd.Timedelta(minutes=m) for m in (0, 5)], "value": [1.0, 1.0]}
    )
    state = FakeState()
    closed = list(_sessionize((7,), iter([late, early]), state))
    # all 4 events are within 5-minute gaps of each other once globally
    # sorted -> ONE open session of 4 events, nothing closed
    assert closed == []
    start_us, last_us, n_events, total = state.value
    assert n_events == 4
    assert (last_us - start_us) == 15 * 60 * 1_000_000


def test_bloom_prune_no_false_negatives_and_effective(spark, sf_dir):
    """operators/bloom: every true match survives pruning (no false
    negatives — the correctness contract), and the bitmap actually prunes
    (the scale contract: pruned size near the true match count, far below
    the full probe side)."""
    from big_data_computing_final_project_spark.catalog import load_table
    from big_data_computing_final_project_spark.operators.bloom import bloom_prune

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    pruned = bloom_prune(li, "l_orderkey", sel, "o_orderkey")
    n_total = li.count()
    n_pruned = pruned.count()
    n_true = li.join(sel, li.l_orderkey == sel.o_orderkey, "left_semi").count()
    n_pruned_true = pruned.join(sel, pruned.l_orderkey == sel.o_orderkey, "left_semi").count()

    assert n_pruned_true == n_true  # no false negatives
    assert n_true <= n_pruned < n_total
    # fpp bound: extras over true matches stay under a loose 5% of non-matches
    assert (n_pruned - n_true) <= max(10, 0.05 * (n_total - n_true))


def test_bloom_filter_applies_before_probe_shuffle(spark, sf_dir):
    """q101's plan must show the xxhash64 bitmap predicate on the lineitem
    side BELOW the join — pruning reaches the scan stage, not post-shuffle."""
    plan = plan_of(all_queries()["q101_bloom_pruned_join"](spark, sf_dir))
    assert "xxhash64" in plan
    # the membership test is a Filter, not a Join condition
    filter_pos = plan.find("xxhash64")
    assert "Filter" in plan[:filter_pos] or "Filter" in plan[filter_pos - 200 : filter_pos]


def test_salted_join_equals_plain_join_on_planted_skew(spark):
    """salted_join must return exactly the plain join's rows on a corpus
    where one key holds 90% of the probe side, and its physical join keys
    must include the salt (the hot key spreads over n_salts reducers)."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.operators.skew import SALT_COL, salted_join

    # planted skew: key "hot" carries 900 rows, 10 cold keys carry 10 each
    left = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 900, "hot").otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 10).cast("string"))
        ).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    right = spark.createDataFrame(
        [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(10)], ["k", "w"]
    )
    plain = left.join(right, ["k"]).select("k", "row_id", "v", "w")
    salted = salted_join(left, right, ["k"], n_salts=8, salt_from="row_id").select(
        "k", "row_id", "v", "w"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the join really runs on (k, salt): salt appears in the plan's keys
    plan = salted_join(left, right, ["k"], n_salts=8, salt_from="row_id")._jdf.queryExecution().executedPlan().toString()
    assert SALT_COL in plan
    # and the probe rows of the hot key land in multiple salt buckets
    n_buckets = (
        left.withColumn(
            SALT_COL, (((F.xxhash64(F.col("row_id")) % 8) + 8) % 8).cast("int")
        )
        .filter(F.col("k") == "hot")
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_salted_join_left_outer_preserves_unmatched(spark):
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zz")], ["row_id", "k"])
    right = spark.createDataFrame([("a", 10), ("b", 20)], ["k", "w"])
    got = {
        (r["k"], r["w"])
        for r in salted_join(left, right, ["k"], n_salts=4, salt_from="row_id", how="left").collect()
    }
    assert got == {("a", 10), ("b", 20), ("zz", None)}


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a")], ["row_id", "k"])
    right = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "w"])
    for how in ("right", "full", "full_outer", "right_outer", "outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, ["k"], n_salts=4, salt_from="row_id", how=how)
