"""Dedup clustering: near-dup pairs -> connected components -> survivors.

Closes the fuzzy-dedup loop (SURVEY.md C2): q45 finds pairs, this clusters
them transitively and picks deterministic survivors. Spark side: iterative
min-label propagation (operators/graph.py); oracle: DuckDB recursive-CTE
transitive closure — exact agreement required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env, register_views
from datalakeingestionservice_spark.operators.dedup import (
    jaccard_pairs,
    word_shingles,
)
from datalakeingestionservice_spark.operators.graph import (
    connected_components,
    dedup_survivors,
)
from datalakeingestionservice_spark.queries.registry import register

#: Same candidate-pair definition as q45, at a looser threshold so components
#: have interesting shapes (chains, not just single edges).
_PAIRS_SQL = """
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM words WHERE len(w) >= 3
  )
),
doc_sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM pair_common p
  JOIN doc_sizes sa ON p.doc_a = sa.doc_id
  JOIN doc_sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.4
)
"""


def _spark_pairs(env: Env) -> DataFrame:
    shingles = word_shingles(env.t("documents"), "doc_id", "text", n=3)
    return jaccard_pairs(shingles, id_col="doc_id", threshold=0.4).select(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------------------------------
# q70 — connected components of the near-dup graph.
# ---------------------------------------------------------------------------
@register(
    "q70_dedup_clusters",
    tags=("dedup", "graph", "iterative"),
    oracle=f"""
WITH RECURSIVE
{_PAIRS_SQL},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT component, count(*) AS n_members,
       min(node) AS min_member, max(node) AS max_member
FROM labels
GROUP BY component
ORDER BY component
""",
)
def q70_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of near-dup pairs as iterative min-label
    propagation (one shuffle per round, O(diameter) rounds). Oracle: DuckDB
    recursive CTE computing the same components exactly."""
    env = Env(spark, sf_dir)
    components = connected_components(_spark_pairs(env))
    return (
        components.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_member"),
            F.max("node").alias("max_member"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# q104 — PageRank (2 unrolled iterations) over the near-dup graph.
# ---------------------------------------------------------------------------
_PR_SQL_BODY = """
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n_total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src),
pr0 AS (
  SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN n_total
),
pr1 AS (
  SELECT nodes.node AS node,
         0.15 / n_total.n + 0.85 * coalesce(sum(pr0.pr / deg.d), 0.0) AS pr
  FROM nodes
  CROSS JOIN n_total
  LEFT JOIN edges ON edges.dst = nodes.node
  LEFT JOIN pr0 ON pr0.node = edges.src
  LEFT JOIN deg ON deg.node = edges.src
  GROUP BY nodes.node, n_total.n
),
pr2 AS (
  SELECT nodes.node AS node,
         0.15 / n_total.n + 0.85 * coalesce(sum(pr1.pr / deg.d), 0.0) AS pr
  FROM nodes
  CROSS JOIN n_total
  LEFT JOIN edges ON edges.dst = nodes.node
  LEFT JOIN pr1 ON pr1.node = edges.src
  LEFT JOIN deg ON deg.node = edges.src
  GROUP BY nodes.node, n_total.n
)
SELECT node, round(pr, 8) AS pagerank
FROM pr2
ORDER BY node
"""


@register(
    "q104_pagerank",
    tags=("graph", "iterative", "pagerank"),
    oracle=f"""
WITH
{_PAIRS_SQL},
{_PR_SQL_BODY}
""",
)
def q104_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, two power iterations unrolled (d=0.85), over the undirected
    near-dup graph: rank mass flows along pr/degree edges — the canonical
    iterative graph workload as pure joins+aggregations (each iteration is
    one shuffle; a driver loop generalizes it, exactly like k-means q67).
    Identical algebra in the DuckDB oracle, exact to 8 dp."""
    env = Env(spark, sf_dir)
    register_views(env.spark, sf_dir)
    _spark_pairs(env).createOrReplaceTempView("pairs")
    return env.spark.sql(f"WITH {_PR_SQL_BODY}")


# ---------------------------------------------------------------------------
# q71 — fuzzy-dedup survivors (the end product of the dedup pipeline).
# ---------------------------------------------------------------------------
@register(
    "q71_dedup_survivors",
    tags=("dedup", "graph"),
    oracle=f"""
WITH RECURSIVE
{_PAIRS_SQL},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
),
losers AS (SELECT node FROM labels WHERE node <> component)
SELECT count(*) AS n_survivors,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
WHERE doc_id NOT IN (SELECT node FROM losers)
""",
)
def q71_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus after fuzzy dedup: every near-dup component keeps only its
    min-id representative (anti-join on the loser set)."""
    env = Env(spark, sf_dir)
    docs = env.t("documents")
    survivors = dedup_survivors(docs, _spark_pairs(env))
    return survivors.agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
