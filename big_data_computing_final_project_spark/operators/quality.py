"""Data-quality constraint checking (Deequ-style audit pass).

A 100 TB ingest needs machine-checkable contracts: null keys, primary-key
uniqueness, referential integrity, value ranges. Each checker returns the
same long-format report frame ``(constraint, n_violations, n_checked)`` so
a pipeline can union audits across tables and gate on
``max(n_violations) == 0``.

Scale shapes: predicate checks are ONE conditional-count aggregate per
table (single pass, map-side combined, no shuffle beyond the 1-row
final); uniqueness is a count-vs-distinct delta on the key; referential
orphans are a left-anti join on the foreign key (shuffle-on-key — the
correct plan when both sides are fact-sized; Spark broadcasts the parent
side automatically when it is small).

Reference parity: the reference audits frames imperatively with pandas
(`data_analysis.ipynb` isnull-sum cells, `house_predict.py` dropna/clip
guards); this is the declarative, engine-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("constraint", "n_violations", "n_checked")


def check_predicates(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named violation predicates in ONE aggregate pass.

    ``checks`` maps constraint name -> Column that is true WHEN VIOLATED.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    # index-based internal aliases: constraint names are free-form (dots,
    # brackets) and would parse as struct paths in a column reference
    for i, pred in enumerate(checks.values()):
        aggs.append(F.count(F.when(pred, F.lit(1))).alias(f"_v{i}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.col(f"_v{i}").alias("n_violations"),
            F.col("_n").alias("n_checked"),
        )
        for i, name in enumerate(checks)
    ]
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def uniqueness_violations(df: DataFrame, key: str, constraint: str | None = None) -> DataFrame:
    """Rows carrying a non-unique key value (count - distinct-count)."""
    name = constraint or f"unique({key})"
    return df.agg(
        F.lit(name).alias("constraint"),
        (F.count(key) - F.countDistinct(key)).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )


def referential_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, constraint: str | None = None
) -> DataFrame:
    """Child rows whose foreign key has no parent (left-anti on the key)."""
    name = constraint or f"{fk}->{pk}"
    orphans = child.join(parent.select(pk), child[fk] == parent[pk], "left_anti")
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .join(F.broadcast(total))
        .select(
            F.lit(name).alias("constraint"),
            "n_violations",
            F.col("_n").alias("n_checked"),
        )
    )


def combine_reports(*reports: DataFrame) -> DataFrame:
    """Union audit frames into one ordered report."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("constraint")
