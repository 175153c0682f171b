"""ML-pipeline building blocks as verifiable queries: k-means iteration,
TF-IDF, Arrow-vectorized UDF path.

These pin down the iterative/feature-engineering surface: the k-means step
proves element-wise vector aggregation (the inner loop of any EM-style
algorithm) is exactly reproducible; TF-IDF is the canonical text-weighting
pipeline; the pandas_udf query proves the Arrow Python path computes the same
numbers as the JVM expression path (both against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.queries.vectors import _DUCK_DOT
from datalakeingestionservice_spark.operators.similarity import cosine


# ---------------------------------------------------------------------------
# q67 — one k-means iteration: assign to centroids, recompute centroids.
# ---------------------------------------------------------------------------
@register(
    "q67_kmeans_iteration",
    tags=("ml", "iterative", "vectors"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 4
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_DOT.format(a='e.embedding', b='c.cv')} DESC, c.cid
           ) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
),
elems AS (
  SELECT cid,
         unnest(range(1, len(embedding) + 1)) AS pos,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM assigned
)
SELECT cid, CAST(pos AS INTEGER) AS pos,
       round(avg(v), 6) AS centroid_val,
       count(*) AS n_members
FROM elems
WHERE pos <= 8
GROUP BY cid, pos
ORDER BY cid, pos
""",
)
def q67_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-algorithm step, pure DataFrame ops: nearest-centroid
    assignment (dot-product argmax, ties on cid) then element-wise mean of
    member vectors via posexplode + groupBy(cluster, position). First 8
    dimensions emitted. Iterating this = distributed k-means with no ML-lib
    dependency; every step stays two shuffles (assign is broadcast-only)."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    centroids = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    from datalakeingestionservice_spark.operators.similarity import dot
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cid"))
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "cid",
            dot("embedding", "cv").alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    elems = assigned.select(
        "cid",
        F.posexplode(F.col("embedding")).alias("pos0", "v"),
    ).select(
        "cid",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("v").cast("double").alias("v"),
    )
    return (
        elems.filter(F.col("pos") <= 8)
        .groupBy("cid", "pos")
        .agg(
            F.round(F.avg("v"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("cid", "pos")
    )


# ---------------------------------------------------------------------------
# q68 — TF-IDF.
# ---------------------------------------------------------------------------
@register(
    "q68_tfidf",
    tags=("ml", "text", "tfidf"),
    oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < 100
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY doc_id, tok
),
df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM tokens GROUP BY tok
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tokens)
SELECT t.doc_id AS doc_id, t.tok AS tok, t.tf AS tf, d.df AS df,
       round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS tfidf
FROM tf t JOIN df d ON t.tok = d.tok CROSS JOIN n
WHERE t.tf >= 3
ORDER BY doc_id, tok
""",
)
def q68_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency per doc x inverse document frequency, built-in
    expressions only. The document-frequency table is broadcast back (vocab
    is small relative to the corpus — the standard asymmetry)."""
    env = Env(spark, sf_dir)
    tokens = (
        env.t("documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    tf = tokens.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tokens.select("doc_id").distinct().count()
    return (
        tf.join(F.broadcast(df), "tok")
        .filter(F.col("tf") >= 3)
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "tok")
    )


# ---------------------------------------------------------------------------
# q69 — Arrow-vectorized pandas UDF, oracle-verified.
# ---------------------------------------------------------------------------
@register(
    "q69_pandas_udf_norm",
    tags=("udf", "pandas-udf", "vectors"),
    oracle=f"""
SELECT vec_id,
       round(sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}), 4) AS l2_norm,
       label
FROM embeddings
WHERE vec_id < 500
ORDER BY vec_id
""",
)
def q69_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm via @pandas_udf + numpy (Arrow batches, vectorized in C) —
    hash-verified against the same math in SQL. This is the sanctioned shape
    for Python logic the built-ins can't express: per-batch numpy, never
    per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No annotations: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint resolver can't evaluate for pd.* in this scope.
    @pandas_udf("double")
    def l2_norm(embs):
        return embs.map(
            lambda v: float(
                np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2))
            )
        )

    env = Env(spark, sf_dir)
    return (
        env.t("embeddings")
        .filter(F.col("vec_id") < 500)
        .select(
            "vec_id",
            F.round(l2_norm("embedding"), 4).alias("l2_norm"),
            "label",
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q107 — two chained k-means iterations (update feeds the next assignment).
# ---------------------------------------------------------------------------
@register(
    "q107_kmeans_two_steps",
    tags=("ml", "iterative", "vectors"),
    oracle="""
WITH pts AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, pos, v AS cv FROM pts WHERE vec_id < 4),
s1 AS (
  SELECT p.vec_id AS vec_id, c.cid AS cid, sum(p.v * c.cv) AS score
  FROM pts p JOIN c0 c USING (pos) GROUP BY p.vec_id, c.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
    FROM s1
  ) WHERE rn = 1
),
c1 AS (
  SELECT a1.cid AS cid, p.pos AS pos, avg(p.v) AS cv
  FROM pts p JOIN a1 ON p.vec_id = a1.vec_id
  GROUP BY a1.cid, p.pos
),
s2 AS (
  SELECT p.vec_id AS vec_id, c.cid AS cid, sum(p.v * c.cv) AS score
  FROM pts p JOIN c1 c USING (pos) GROUP BY p.vec_id, c.cid
),
a2 AS (
  SELECT vec_id, cid, score FROM (
    SELECT vec_id, cid, score,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
    FROM s2
  ) WHERE rn = 1
)
SELECT cid, count(*) AS n_members, round(avg(score), 6) AS avg_score
FROM a2 GROUP BY cid ORDER BY cid
""",
)
def q107_kmeans_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained Lloyd iterations entirely in exploded-coordinate form:
    assignment is a broadcast join on dimension position + one (vec, cid)
    aggregate (never a |vectors| x |vectors| product), the centroid update is
    a (cid, pos) mean, and iteration 2 consumes iteration 1's OUTPUT — the
    EM-style loop PageRank (q103) pins for graphs, here for vector
    clustering. At 100 TB: pts scale linearly (rows x dims), centroids stay
    broadcast-sized, every stage is a hash-aggregate."""
    env = Env(spark, sf_dir)
    from pyspark.sql.window import Window

    pts = env.t("embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "v0")
    ).select("vec_id", "pos", F.col("v0").cast("double").alias("v"))

    def assign(centroids: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cid"))
        return (
            pts.join(F.broadcast(centroids), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum(F.col("v") * F.col("cv")).alias("score"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "score")
        )

    c0 = pts.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "pos", F.col("v").alias("cv")
    )
    a1 = assign(c0)
    c1 = (
        pts.join(a1.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "pos")
        .agg(F.avg("v").alias("cv"))
    )
    a2 = assign(c1)
    return (
        a2.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("cid")
    )
