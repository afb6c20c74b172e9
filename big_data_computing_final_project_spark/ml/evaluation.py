"""Evaluation metrics as distributed aggregates (SURVEY.md §2.8 M11).

The reference's contract metric is **macro**-F1 (`task_2.md:24`,
`house_predict.py:608`); Spark's ``MulticlassClassificationEvaluator``
``"f1"`` is weighted-by-support, so macro-F1 is computed here from the
confusion counts — a tiny ``groupBy(label, prediction).count()`` that
reduces the whole prediction table to |classes|² rows before any
driver-side math. This is the SURVEY §4 "custom work item 1".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(pred_df: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """(label, prediction, n) — the sufficient statistic for every metric
    below. One shuffle, |classes|² result rows regardless of data size."""
    return (
        pred_df.groupBy(
            F.col(label_col).cast("bigint").alias("label"),
            F.col(pred_col).cast("bigint").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def classification_report(pred_df: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """Per-class precision/recall/F1 + support in one pass over the
    confusion counts (the reference's `classification_report`,
    `Sol_2.ipynb` cell a00da7c1).

    All arithmetic happens on the |classes|²-row frame — negligible —
    but stays a DataFrame so the result is composable/oracle-checkable.
    """
    cc = confusion_counts(pred_df, label_col, pred_col)
    per_label = cc.groupBy("label").agg(F.sum("n").alias("support"))
    per_pred = cc.groupBy(F.col("prediction").alias("label")).agg(F.sum("n").alias("predicted"))
    diag = cc.filter(F.col("label") == F.col("prediction")).select(
        "label", F.col("n").alias("tp")
    )
    rep = (
        per_label.join(per_pred, "label", "full_outer")
        .join(diag, "label", "left")
        .na.fill(0, ["support", "predicted", "tp"])
    )
    precision = F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted")).otherwise(F.lit(0.0))
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(F.lit(0.0))
    rep = rep.select(
        "label",
        "support",
        precision.alias("precision"),
        recall.alias("recall"),
        F.col("tp").alias("tp"),
    ).withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            F.lit(2.0) * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )
    return rep.orderBy("label")


def summary_metrics(pred_df: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """One row: accuracy, macro precision/recall/F1 (the reference's
    headline metrics, `house_predict.py:606-612`)."""
    rep = classification_report(pred_df, label_col, pred_col)
    return rep.agg(
        (F.sum("tp") / F.sum("support")).alias("accuracy"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
    )
