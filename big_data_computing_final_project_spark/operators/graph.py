"""Connected components over a DataFrame edge list — the clustering step of
a dedup pipeline (pair detection says *these two are dups*; components say
*this is the group, keep one*).

Algorithm: iterative min-label propagation — every vertex starts labeled
with itself; each round it takes the min of its own label and its
neighbors' labels; fixpoint after O(component diameter) rounds. This is
the standard MapReduce/Spark formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — their large-star/small-star
variant halves rounds for high-diameter graphs; near-dup clusters have
tiny diameter, so plain propagation is already 2-3 rounds).

Scale design:
- each round is ONE shuffle join (edges ⋈ labels on the neighbor key) plus
  a min-aggregate on the vertex key — no driver-side adjacency;
- `localCheckpoint(eager=True)` after every round truncates the lineage:
  without it the plan doubles per iteration and the job eventually dies in
  the optimizer, long before data size matters;
- convergence is detected with a count of changed labels (an O(V) agg),
  bounded by `max_iterations` as a backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Label every vertex with the min vertex id of its component.

    ``vertices``: one column ``id`` (unique). ``edges``: columns
    ``src``/``dst`` (undirected; either orientation works — both are
    added). Returns ``(id, component)``.
    """
    # materialize the edge list ONCE — it is consumed every round, and the
    # upstream pair-detection plan (LSH/Jaccard) must not re-run per round
    both = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = vertices.select("id", F.col("id").alias("component")).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nb_min"), F.col("component"))).alias(
                    "component"
                ),
                F.col("component").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("component") != F.col("prev")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    else:
        # exhausted max_iterations with labels still moving: components of
        # diameter > max_iterations would come back split into several ids.
        # Surface it instead of silently returning a wrong clustering.
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing); labels may split "
            "large components — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
