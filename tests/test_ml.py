"""ML-surface tests: metric-aggregate parity against sklearn-style Python
math, estimator smoke floors, and pipeline invariants (SURVEY §5 strategy:
ML ops get self-checks, not SQL oracles)."""

from __future__ import annotations

import pytest

from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


def _metrics(spark, sf_dir, name):
    return {r.metric: r.value for r in _Q[name](spark, sf_dir).collect()}


def test_macro_f1_matches_python_reference(spark, sf_dir):
    """summary_metrics must equal a hand-rolled macro computation on the
    same (label, prediction) pairs — guards the weighted-vs-macro trap."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.ml.evaluation import summary_metrics

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = emb.select(
        F.col("label").cast("bigint").alias("label"),
        (F.col("vec_id") % 3).cast("bigint").alias("prediction"),
    )
    got = summary_metrics(pred).first()

    rows = [(r.label, r.prediction) for r in pred.collect()]
    classes = sorted({l for l, _ in rows} | {p for _, p in rows})
    f1s, precs, recs, correct = [], [], [], 0
    for c in classes:
        tp = sum(1 for l, p in rows if l == c and p == c)
        sup = sum(1 for l, _ in rows if l == c)
        prd = sum(1 for _, p in rows if p == c)
        prec = tp / prd if prd else 0.0
        rec = tp / sup if sup else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
        precs.append(prec)
        recs.append(rec)
    correct = sum(1 for l, p in rows if l == p)
    assert got.accuracy == pytest.approx(correct / len(rows), abs=1e-12)
    assert got.macro_precision == pytest.approx(sum(precs) / len(classes), abs=1e-12)
    assert got.macro_recall == pytest.approx(sum(recs) / len(classes), abs=1e-12)
    assert got.macro_f1 == pytest.approx(sum(f1s) / len(classes), abs=1e-12)


@pytest.mark.parametrize(
    "name",
    ["q44_decision_tree", "q45_random_forest", "q46_gradient_boosting", "q47_logistic_l1"],
)
def test_estimator_fit_produces_sane_metrics(name, spark, sf_dir):
    m = _metrics(spark, sf_dir, name)
    assert m["n_train"] + m["n_test"] == 500  # all embeddings rows used
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["macro_f1"] <= 1.0
    # embeddings are label-noise: just demand the split saw >= 10% test rows
    assert m["n_test"] >= 50


def test_grid_search_reports_every_candidate(spark, sf_dir):
    m = _metrics(spark, sf_dir, "q48_grid_search_dt")
    candidates = [k for k in m if k.startswith("cv_f1[")]
    assert len(candidates) == 4  # 2 depths x 2 maxBins
    assert m["best_cv_f1"] == pytest.approx(max(m[k] for k in candidates), abs=1e-12)


def test_house_pipeline_beats_majority_class(spark, sf_dir):
    """Label is 'price above median' — learnable from o_totalprice-derived
    features, so the pipeline must do clearly better than the 0.5 prior."""
    m = _metrics(spark, sf_dir, "q49_house_pipeline")
    assert m["accuracy"] >= 0.8
    assert m["macro_f1"] >= 0.8


def test_stratified_split_preserves_class_ratios(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.ml.pipeline import stratified_split

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("label").cast("double").alias("label")
    )
    train, test = stratified_split(emb, "label", 0.2, seed=42)
    assert train.count() + test.count() == emb.count()
    # every class appears in both folds
    train_classes = {r.label for r in train.select("label").distinct().collect()}
    test_classes = {r.label for r in test.select("label").distinct().collect()}
    assert train_classes == test_classes


def test_binning_strategy_chooser(spark, sf_dir):
    from big_data_computing_final_project_spark.ml.pipeline import choose_binning

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    decisions = choose_binning(li, ["l_quantity", "l_extendedprice"])
    by_col = {d.column: d for d in decisions}
    assert 5 <= by_col["l_quantity"].n_bins <= 10
    assert by_col["l_extendedprice"].strategy in ("equal_width", "quantile")


def test_random_search_samples_seeded(spark, sf_dir):
    """M9 — seeded random search: same seed -> same param maps; CV runs."""
    from big_data_computing_final_project_spark.ml.models import decision_tree
    from big_data_computing_final_project_spark.ml.selection import random_search
    from big_data_computing_final_project_spark.plans.ml_queries import _embedding_features

    dt = decision_tree()
    dist = {dt.maxDepth: [3, 4, 5, 6], dt.maxBins: [8, 16, 32]}
    cv1 = random_search(dt, dist, n_iter=3, num_folds=2, seed=7)
    cv2 = random_search(dt, dist, n_iter=3, num_folds=2, seed=7)
    maps1 = [{p.name: v for p, v in m.items()} for m in cv1.getEstimatorParamMaps()]
    maps2 = [{p.name: v for p, v in m.items()} for m in cv2.getEstimatorParamMaps()]
    assert maps1 == maps2
    df = _embedding_features(spark, sf_dir)
    model = cv1.fit(df)
    assert len(model.avgMetrics) == 3


def test_bootstrap_sample_seed_deterministic(spark, sf_dir):
    from big_data_computing_final_project_spark.operators.profiling import bootstrap_sample

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = bootstrap_sample(orders, seed=42).count()
    b = bootstrap_sample(orders, seed=42).count()
    assert a == b
    # with-replacement fraction=1.0 resamples roughly n rows
    n = orders.count()
    assert 0.8 * n < a < 1.2 * n
