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
    driver_threshold: int = 500_000,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component id =
    min node id in the component (deterministic).

    Hybrid execution: the pair list is already the REDUCED output of the
    heavy distributed similarity stage (edges, not documents). When it fits
    comfortably on the driver (< `driver_threshold` edges — tens of MB), a
    local union-find beats ~diameter Spark rounds by an order of magnitude;
    above the threshold the iterative min-label propagation below runs fully
    distributed. Same result either way (min-id labels).
    """
    # Persist the (small, reduced) pair list so the size probe and the
    # follow-up collect/propagation evaluate its subtree once.
    pairs = pairs.persist()
    try:
        n_pairs = pairs.limit(driver_threshold + 1).count()
        if n_pairs <= driver_threshold:
            return _components_driver(pairs, src_col, dst_col)
        result = _components_distributed(pairs, src_col, dst_col, max_iterations)
        # Materialize before unpersist (the label loop already ran actions).
        return result
    finally:
        pairs.unpersist()


def _components_driver(
    pairs: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Union-find over a collected edge list (small-graph fast path)."""
    edges = [(r[0], r[1]) for r in pairs.select(src_col, dst_col).collect()]
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # Union by min id keeps labels deterministic.
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for e in edges for n in e}
    rows = [(n, find(n)) for n in sorted(nodes)]
    spark = pairs.sparkSession
    schema = pairs.select(
        pairs[src_col].alias("node"), pairs[src_col].alias("component")
    ).schema
    # Broadcast hint: this path only runs when the edge list fit on the
    # driver (≤ driver_threshold edges ⇒ ≤ 2× that many nodes, a few MB
    # of (id, id) rows), but a driver-created DataFrame carries UNKNOWN
    # size statistics, so the downstream survivor anti-join otherwise
    # plans a full sort-merge join — two exchanges + sorts to drop a
    # tiny set of ids. The hint makes the join strategy match what the
    # size argument already proved (guide §3.1: explicit broadcast when
    # the estimate is known-wrong). The distributed path below keeps
    # runtime-sized shuffle results and is left to AQE.
    # DLIS_CC_BROADCAST_HINT=0 drops the hint (A/B measurement only).
    import os as _os

    out = spark.createDataFrame(rows, schema=schema)
    if _os.environ.get("DLIS_CC_BROADCAST_HINT", "1") == "0":
        return out
    return out.hint("broadcast")


def _components_distributed(
    pairs: DataFrame, src_col: str, dst_col: str, max_iterations: int
) -> DataFrame:
    """Iterative min-label propagation (one shuffle per round)."""
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

    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # localCheckpoint: truncate lineage each round — without it, round k
        # re-executes all k-1 prior joins (O(iter^2) work and an
        # ever-deepening plan for Catalyst to re-analyze).
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
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
            converged = True
            break
    if not converged:
        # Min-label propagation needs O(component diameter) rounds. Hitting
        # the cap means some label is still moving — returning it would be
        # silently wrong (split components => duplicate survivors kept).
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations (graph diameter exceeds it)"
        )
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
