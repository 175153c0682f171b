"""Connected components over near-duplicate pair graphs.

Fuzzy dedup emits PAIRS (q45/q46); survivor selection needs CLUSTERS — the
transitive closure of pairs. This is iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is one shuffle (edge join + min-agg);
convergence takes O(diameter) iterations, and near-dup graphs have tiny
diameters (dup clusters are cliques-ish), so 3-5 rounds close real corpora.
The driver checks convergence with a cheap count — the standard Spark shape
for label propagation / small-diameter graph algorithms without GraphX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component id =
    min node id in the component (deterministic)."""
    edges = (
        pairs.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .unionByName(
            pairs.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Drop every near-duplicate except the min-id representative of each
    component; rows not in any pair survive untouched."""
    components = connected_components(pairs, src_col, dst_col)
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
