"""Capstone: the end-to-end training-data curation pipeline as ONE lazy plan.

quality filter -> exact dedup (fingerprint) -> fuzzy dedup (Jaccard pairs ->
connected components -> survivors) -> corpus stats. Every stage is the
already-verified operator; this query proves they COMPOSE — one Catalyst plan,
one oracle, exact hash match. This is the pipeline a 100 TB pretraining-data
team runs nightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.dedup import (
    exact_dedup,
    fingerprint,
    jaccard_pairs,
    word_shingles,
)
from datalakeingestionservice_spark.operators.graph import dedup_survivors
from datalakeingestionservice_spark.operators.text import (
    lexical_diversity,
    n_tokens,
)
from datalakeingestionservice_spark.queries.registry import register


def _input_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a source table (file or part-file dir) — the
    statistic a cluster would read from table metadata."""
    import os

    path = os.path.join(sf_dir, name)
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for base, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(base, f)) for f in files)
    return total


class _gram_scaled_shuffle:
    """Scale ``spark.sql.shuffle.partitions`` to the gram passes'
    expected shuffle volume for the duration of a capstone run, then
    restore (VERDICT r12 #2: fixed 32 partitions made q195's three
    corpus-sized gram groupBys the steepest curve in the repo — each
    partition must hold corpus_grams/32 rows however big the corpus).

    Sizing: on-disk parquet bytes × a gram blow-up factor (shingle
    explosion ≈ tokens × shingle width, and parquet is ~4× compressed
    vs the in-memory strings), one shuffle partition per ~64 MB —
    Spark's default partition sizing target. Never shrinks below the
    session's configured value (small SFs keep their plan exactly),
    capped at 2048 (beyond that task-launch overhead dominates on any
    realistic executor count). AQE still coalesces small outputs, so
    over-provisioning costs only scheduler overhead, while
    under-provisioning costs spill — the asymmetry that makes scaling
    UP with input the right default."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        table: str = "documents.parquet",
        blowup: int | None = None,
        target_bytes: int = 64 << 20,
        cap: int = 2048,
    ):
        import os

        if blowup is None:
            blowup = int(os.environ.get("SPARK_GRAFT_GRAM_BLOWUP", "32"))
        self.spark = spark
        self.scaled = max(
            1,
            min(
                cap,
                (_input_bytes(sf_dir, table) * blowup + target_bytes - 1)
                // target_bytes,
            ),
        )

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        try:
            prev_n = int(self.prev)
        except ValueError:  # e.g. conf set to 'auto' on some hosts
            prev_n = int(self.scaled)
        n = max(prev_n, int(self.scaled))
        self.spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return n

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


@register(
    "q79_training_data_pipeline",
    headline=True,
    tags=("capstone", "dedup", "quality", "text"),
    oracle="""
WITH RECURSIVE
feats AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
),
quality AS (
  SELECT doc_id, text, lang, n_tokens FROM feats
  WHERE n_tokens >= 20 AND diversity >= 0.25
),
fp AS (
  SELECT doc_id, text, lang, n_tokens,
         sha256(lower(trim(text))) AS fingerprint
  FROM quality
),
exact_kept AS (
  SELECT doc_id, text, lang, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact_kept),
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM words WHERE len(w) >= 3
  )
),
sh_freq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
pruned AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN sh_freq f USING (shingle) WHERE f.df <= 20
),
doc_sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a JOIN pruned b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM pair_common p
  JOIN doc_sizes sa ON p.doc_a = sa.doc_id
  JOIN doc_sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
losers AS (SELECT node FROM labels WHERE node <> component),
final AS (
  SELECT * FROM exact_kept WHERE doc_id NOT IN (SELECT node FROM losers)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 2) AS avg_tokens,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM final
GROUP BY lang
ORDER BY lang
""",
)
def q79_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality-filter -> fingerprint exact dedup -> Jaccard near-dup
    clustering -> survivors -> per-language corpus stats, composed from the
    operators library into one lazy plan."""
    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text", "lang")

    # Stage 1: quality filter (built-in expressions, pushes into the scan).
    quality = (
        docs.withColumn("n_tokens", n_tokens("text"))
        .withColumn("diversity", lexical_diversity("text"))
        .filter((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.25))
        .drop("diversity")
    )

    # Stage 2: exact dedup on the normalized fingerprint, min-id survivor.
    # Persisted: this subtree (scan -> quality exprs -> sha256 -> dedup
    # window) feeds the shingle explode AND the survivor anti-join AND
    # the final aggregate — without the cache it re-executes ~4x.
    # Measured with the shingle persist below: 5.96 s -> 2.48 s at
    # sf0.1, 8.39 s -> 4.25 s at the sf1 probe (2.0-2.4x end-to-end).
    # MEMORY_AND_DISK, so an oversized corpus spills instead of OOMing.
    exact_kept = exact_dedup(
        fingerprint(quality, "text"), keys=["fingerprint"], tiebreaker="doc_id"
    ).drop("fingerprint").persist()

    # Stage 3: fuzzy dedup — shingle Jaccard pairs -> components -> survivors.
    # Stop-shingle pruning ON: a shingle in > max_shingle_freq docs feeds the
    # candidate join quadratically while carrying no similarity signal; at
    # 100 TB an unpruned ubiquitous shingle is the job-killer. Safety
    # condition: the threshold must exceed the largest duplicate-cluster size
    # (a k-doc cluster's shared shingles have df = k). 20 clears this corpus's
    # clusters with margin — measured pair recall vs unpruned is 1.0 at sf0.1
    # (tests/test_operators.py::test_stop_shingle_pruning_recall pins both
    # the rule and the failure mode below it).
    shingles = word_shingles(
        exact_kept, "doc_id", "text", n=3, max_shingle_freq=20
    )
    # Strategy measured at sf0.1: the self-join (3.7-4.0 s end-to-end)
    # beats grouped pair-generation (5.2-5.6 s) — collect_list + nested
    # pair transform costs more than the shuffle it saves at this scale.
    # `strategy="grouped"` remains available for regimes where the join's
    # extra posting-subtree evaluation dominates. persist=True: the
    # pruned posting list feeds sizes + both join sides (same economics
    # as q45 — see the measurement on exact_kept above).
    pairs = jaccard_pairs(
        shingles, id_col="doc_id", threshold=0.4, persist=True
    ).select("doc_a", "doc_b")
    final = dedup_survivors(exact_kept, pairs)

    # Stage 4: corpus report.
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q169 — the capstone v2 (VERDICT r9 #1): the SAME nightly curation pipeline
# with the strongest dedup class the engine has composed into the ladder —
# quality -> exact dedup -> EXACT-SUBSTRING SCRUB (Lee et al. 2022
# ExactSubstr, the literal-shared-bytes class q79's fuzzy stage only
# approximates) -> hollow-doc cut -> fuzzy Jaccard clustering over the
# SCRUBBED text -> survivors -> per-language stats, still ONE lazy plan.
# Scrubbing before near-dup detection is the recommended order: duplicated
# boilerplate inflates shingle overlap, so removing it first makes the
# fuzzy stage measure genuine content similarity. The oracle recomputes
# the entire composition (including the scrub rebuild and the recursive
# component closure) from raw text.
# ---------------------------------------------------------------------------
_Q169_L = 20          # exact-substring span threshold (tokens), as q162
_Q169_MIN_CLEAN = 10  # drop docs hollowed out by the scrub


@register(
    "q169_curation_pipeline_scrubbed",
    tags=("capstone", "dedup", "exact-substring", "quality", "text"),
    oracle=f"""
WITH RECURSIVE
feats AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
),
quality AS (
  SELECT doc_id, text, lang, n_tokens FROM feats
  WHERE n_tokens >= 20 AND diversity >= 0.25
),
fp AS (
  SELECT doc_id, text, lang, n_tokens,
         sha256(lower(trim(text))) AS fingerprint
  FROM quality
),
exact_kept AS (
  SELECT doc_id, text, lang, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
),
words AS (
  SELECT doc_id, lang, n_tokens, string_split(text, ' ') AS w FROM exact_kept
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q169_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q169_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q169_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
cover AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q169_L - 1})) AS o
  ) v
),
toks AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks t ANTI JOIN cover c ON t.doc_id = c.doc_id AND t.p = c.p
),
agg AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY p), ' ') AS clean_text,
         count(*) AS n_clean
  FROM kept GROUP BY doc_id
),
scrubbed AS (
  SELECT w.doc_id, w.lang,
         coalesce(a.clean_text, '') AS clean_text,
         coalesce(a.n_clean, 0) AS n_clean
  FROM words w LEFT JOIN agg a USING (doc_id)
  WHERE coalesce(a.n_clean, 0) >= {_Q169_MIN_CLEAN}
),
cw AS (SELECT doc_id, string_split(clean_text, ' ') AS w FROM scrubbed),
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cw WHERE len(w) >= 3
  )
),
sh_freq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
pruned AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN sh_freq f USING (shingle) WHERE f.df <= 20
),
doc_sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a JOIN pruned b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM pair_common p
  JOIN doc_sizes sa ON p.doc_a = sa.doc_id
  JOIN doc_sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
losers AS (SELECT node FROM labels WHERE node <> component),
final AS (
  SELECT * FROM scrubbed WHERE doc_id NOT IN (SELECT node FROM losers)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_clean) AS BIGINT) AS total_tokens,
       round(avg(n_clean), 2) AS avg_tokens,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM final
GROUP BY lang
ORDER BY lang
""",
)
def q169_curation_pipeline_scrubbed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """quality filter -> fingerprint exact dedup -> exact-substring
    scrub (every >=20-token exactly-duplicated span cut everywhere) ->
    hollow-doc cut (<10 surviving tokens drops the doc) -> Jaccard
    near-dup clustering over the SCRUBBED text -> survivors ->
    per-language corpus stats. One lazy Catalyst plan; the scrub adds
    one corpus-sized gram-hash groupBy and one doc-keyed rebuild join
    to q79's shape — never a pairwise join (see
    `operators/dedup.py:exact_substring_spans` for the scale shape)."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text", "lang")

    quality = (
        docs.withColumn("n_tokens", n_tokens("text"))
        .withColumn("diversity", lexical_diversity("text"))
        .filter((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.25))
        .drop("diversity")
    )
    # Persisted for the same reason as q79: the exact-kept subtree
    # feeds the scrub's gram table, the scrub's rebuild pass, and the
    # lang/n_tokens join — MEMORY_AND_DISK so oversized corpora spill.
    exact_kept = (
        exact_dedup(
            fingerprint(quality, "text"),
            keys=["fingerprint"],
            tiebreaker="doc_id",
        )
        .drop("fingerprint")
        .persist()
    )

    scrub = exact_substring_scrub(
        exact_kept.select("doc_id", "text"), min_len=_Q169_L
    )
    # n_clean from arithmetic (orig - removed), not re-splitting the
    # rebuilt text: '' would mis-count as one token.
    scrubbed = (
        scrub.join(exact_kept.select("doc_id", "lang", "n_tokens"), "doc_id")
        .withColumn(
            "n_clean",
            (F.col("n_tokens") - F.col("n_removed_tokens")).cast("long"),
        )
        .filter(F.col("n_clean") >= _Q169_MIN_CLEAN)
        .select("doc_id", "lang", "clean_text", "n_clean")
        .persist()
    )

    shingles = word_shingles(
        scrubbed, "doc_id", "clean_text", n=3, max_shingle_freq=20
    )
    pairs = jaccard_pairs(
        shingles, id_col="doc_id", threshold=0.4, persist=True
    ).select("doc_a", "doc_b")
    final = dedup_survivors(scrubbed, pairs)

    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_clean").alias("total_tokens"),
            F.round(F.avg("n_clean"), 2).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q179 — the capstone v3 (round-11 candidate #2, landed early): the FULL
# curation ladder a pretraining-data team runs — content-hash split ->
# quality -> exact dedup -> DECONTAMINATE vs the held-out split (E99) ->
# exact-substring scrub within the corpus (E87) -> hollow-doc cut ->
# fuzzy Jaccard over the cleaned text -> survivors -> per-language stats —
# as ONE lazy plan whose DuckDB oracle recomputes every stage from raw
# text, including both gram passes and the recursive component closure.
# ---------------------------------------------------------------------------
_Q179_L = 20
_Q179_MIN_CLEAN = 10


@register(
    "q179_curation_pipeline_decontaminated",
    tags=("capstone", "dedup", "exact-substring", "decontamination",
          "quality", "text"),
    oracle=f"""
WITH RECURSIVE
assigned AS (
  SELECT doc_id, text, lang,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS b16
  FROM documents
),
train AS (SELECT doc_id, text, lang FROM assigned WHERE b16 < 14),
held AS (SELECT doc_id, text FROM assigned WHERE b16 >= 14),
feats AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM train
),
quality AS (
  SELECT doc_id, text, lang, n_tokens FROM feats
  WHERE n_tokens >= 20 AND diversity >= 0.25
),
fp AS (
  SELECT doc_id, text, lang, n_tokens,
         sha256(lower(trim(text))) AS fingerprint
  FROM quality
),
exact_kept AS (
  SELECT doc_id, text, lang, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
),
words0 AS (
  SELECT doc_id, lang, n_tokens, string_split(text, ' ') AS w
  FROM exact_kept
),
cg0 AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q179_L - 1}], ' ') AS g
  FROM words0
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q179_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q179_L}
),
hw AS (SELECT doc_id, string_split(text, ' ') AS w FROM held),
hg0 AS (
  SELECT DISTINCT array_to_string(w[u.i:u.i + {_Q179_L - 1}], ' ') AS g
  FROM hw
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q179_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q179_L}
),
hits0 AS (SELECT doc_id, pos FROM cg0 JOIN hg0 USING (g)),
cover0 AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits0 h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q179_L - 1})) AS o
  ) v
),
toks0 AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words0
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept0 AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks0 t ANTI JOIN cover0 c ON t.doc_id = c.doc_id AND t.p = c.p
),
agg0 AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY p), ' ') AS t1,
         count(*) AS n1
  FROM kept0 GROUP BY doc_id
),
decon AS (
  SELECT w.doc_id, w.lang,
         coalesce(a.t1, '') AS t1, coalesce(a.n1, 0) AS n1
  FROM words0 w LEFT JOIN agg0 a USING (doc_id)
),
words1 AS (
  SELECT doc_id, string_split(t1, ' ') AS w FROM decon WHERE n1 >= 1
),
cg1 AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q179_L - 1}], ' ') AS g
  FROM words1
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q179_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q179_L}
),
dup1 AS (SELECT g FROM cg1 GROUP BY g HAVING count(*) >= 2),
hits1 AS (SELECT doc_id, pos FROM cg1 JOIN dup1 USING (g)),
cover1 AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits1 h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q179_L - 1})) AS o
  ) v
),
toks1 AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words1
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept1 AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks1 t ANTI JOIN cover1 c ON t.doc_id = c.doc_id AND t.p = c.p
),
agg1 AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY p), ' ') AS t2,
         count(*) AS n2
  FROM kept1 GROUP BY doc_id
),
scrubbed AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.n1 = 0 THEN '' ELSE coalesce(s.t2, '') END AS t2,
         CASE WHEN d.n1 = 0 THEN 0 ELSE coalesce(s.n2, 0) END AS n2
  FROM decon d LEFT JOIN agg1 s USING (doc_id)
  WHERE (CASE WHEN d.n1 = 0 THEN 0 ELSE coalesce(s.n2, 0) END)
        >= {_Q179_MIN_CLEAN}
),
cw AS (SELECT doc_id, string_split(t2, ' ') AS w FROM scrubbed),
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cw WHERE len(w) >= 3
  )
),
sh_freq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
pruned AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN sh_freq f USING (shingle) WHERE f.df <= 20
),
doc_sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a JOIN pruned b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM pair_common p
  JOIN doc_sizes sa ON p.doc_a = sa.doc_id
  JOIN doc_sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
losers AS (SELECT node FROM labels WHERE node <> component),
final AS (
  SELECT * FROM scrubbed WHERE doc_id NOT IN (SELECT node FROM losers)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n2) AS BIGINT) AS total_tokens,
       round(avg(n2), 2) AS avg_tokens,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM final
GROUP BY lang
ORDER BY lang
""",
)
def q179_curation_pipeline_decontaminated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full ladder: content-hash split (train vs held-out test) ->
    quality filter -> fingerprint exact dedup -> exact-substring
    DECONTAMINATION against the held-out split (verbatim eval leakage
    cut, E99) -> exact-substring scrub within the corpus (E87) ->
    hollow-doc cut -> Jaccard clustering over the cleaned text ->
    survivors -> per-language stats. Two gram passes (cross-corpus,
    then within-corpus over the decontaminated text), both
    no-pairwise; three persisted shared subtrees (exact_kept, decon,
    scrubbed — MEMORY_AND_DISK)."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate,
        exact_substring_scrub,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text", "lang").withColumn(
        "__b", b16
    )
    train = docs.filter(F.col("__b") < 14).drop("__b")
    held = docs.filter(F.col("__b") >= 14).select("doc_id", "text")

    quality = (
        train.withColumn("n_tokens", n_tokens("text"))
        .withColumn("diversity", lexical_diversity("text"))
        .filter((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.25))
        .drop("diversity")
    )
    exact_kept = (
        exact_dedup(
            fingerprint(quality, "text"),
            keys=["fingerprint"],
            tiebreaker="doc_id",
        )
        .drop("fingerprint")
        .persist()
    )
    decon = (
        exact_substring_decontaminate(
            exact_kept.select("doc_id", "text"),
            held,
            min_len=_Q179_L,
            out_col="t1",
        )
        .join(exact_kept.select("doc_id", "lang", "n_tokens"), "doc_id")
        .withColumn(
            "n1",
            (F.col("n_tokens") - F.col("n_removed_tokens")).cast("long"),
        )
        .select("doc_id", "lang", "t1", "n1")
        .persist()
    )
    scrubbed = (
        exact_substring_scrub(
            decon.select("doc_id", F.col("t1").alias("text")),
            min_len=_Q179_L,
            out_col="t2",
        )
        .join(decon, "doc_id")
        .withColumn(
            "n2",
            (F.col("n1") - F.col("n_removed_tokens")).cast("long"),
        )
        .filter(F.col("n2") >= _Q179_MIN_CLEAN)
        .select("doc_id", "lang", "t2", "n2")
        .persist()
    )
    shingles = word_shingles(
        scrubbed, "doc_id", "t2", n=3, max_shingle_freq=20
    )
    pairs = jaccard_pairs(
        shingles, id_col="doc_id", threshold=0.4, persist=True
    ).select("doc_a", "doc_b")
    final = dedup_survivors(scrubbed, pairs)

    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n2").alias("total_tokens"),
            F.round(F.avg("n2"), 2).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q195 — the capstone v4: the COMPLETE decontamination family composed into
# the curation ladder — v3's verbatim pass (exact-substring spans vs the
# held-out split) plus the FUZZY pass (E119: MinHash-LSH doc-level removal
# of near-duplicates of held-out docs that the verbatim cut can't see,
# running over the SCRUBBED text). One lazy plan; the DuckDB oracle
# recomputes every stage from raw text including both gram passes, the
# seeded MinHash signatures/bands/candidates, and the recursive closure.
# ---------------------------------------------------------------------------
_Q195_L = 20
_Q195_MIN_CLEAN = 10
_Q195_SIM = 0.4
#: stop-bucket cut for the fuzzy stage (r14, VERDICT r13 #2): corpus
#: band buckets denser than this are dropped before the candidate
#: join — the band analog of q45's df<=20 stop-shingle cut, MIRRORED
#: in the oracle below (cheavy/ckept CTEs). Scale-tuned: toy-SF
#: buckets top out at 2-15 docs (cut never engages; oracle equality
#: is with the cut expressed on both sides), while sf1/sf10 band
#: density reaches 340/1903 docs per bucket and Σcount² — the
#: verification pair mass — drops ~5× under the cut (PERF.md r14).
#: q209 pins the same mirror with a threshold low enough to bite at
#: oracle scale.
_Q195_MAXBF = 16


def _q195_oracle() -> str:
    from datalakeingestionservice_spark.operators.dedup import _MINHASH_P
    from datalakeingestionservice_spark.queries.text import (
        _MH_BAND_SELECTS,
        _MH_SIG_COLS,
    )

    hash_expr = (
        "CAST(list_sum(list_transform(range(1, 9),\n"
        "  i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)\n"
        "       * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)\n"
        f"  % {_MINHASH_P} AS h"
    )
    return f"""
WITH RECURSIVE
assigned AS (
  SELECT doc_id, text, lang,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS b16
  FROM documents
),
train AS (SELECT doc_id, text, lang FROM assigned WHERE b16 < 14),
held AS (SELECT doc_id, text FROM assigned WHERE b16 >= 14),
feats AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM train
),
quality AS (
  SELECT doc_id, text, lang, n_tokens FROM feats
  WHERE n_tokens >= 20 AND diversity >= 0.25
),
fp AS (
  SELECT doc_id, text, lang, n_tokens,
         sha256(lower(trim(text))) AS fingerprint
  FROM quality
),
exact_kept AS MATERIALIZED (
  SELECT doc_id, text, lang, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
),
words0 AS (
  SELECT doc_id, lang, n_tokens, string_split(text, ' ') AS w
  FROM exact_kept
),
cg0 AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q195_L - 1}], ' ') AS g
  FROM words0
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q195_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q195_L}
),
hwv AS (SELECT doc_id, string_split(text, ' ') AS w FROM held),
hg0 AS (
  SELECT DISTINCT array_to_string(w[u.i:u.i + {_Q195_L - 1}], ' ') AS g
  FROM hwv
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q195_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q195_L}
),
hits0 AS (SELECT doc_id, pos FROM cg0 JOIN hg0 USING (g)),
cover0 AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits0 h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q195_L - 1})) AS o
  ) v
),
toks0 AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words0
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept0 AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks0 t ANTI JOIN cover0 c ON t.doc_id = c.doc_id AND t.p = c.p
),
agg0 AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY p), ' ') AS t1,
         count(*) AS n1
  FROM kept0 GROUP BY doc_id
),
decon AS MATERIALIZED (
  SELECT w.doc_id, w.lang,
         coalesce(a.t1, '') AS t1, coalesce(a.n1, 0) AS n1
  FROM words0 w LEFT JOIN agg0 a USING (doc_id)
),
words1 AS (
  SELECT doc_id, string_split(t1, ' ') AS w FROM decon WHERE n1 >= 1
),
cg1 AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q195_L - 1}], ' ') AS g
  FROM words1
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q195_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q195_L}
),
dup1 AS (SELECT g FROM cg1 GROUP BY g HAVING count(*) >= 2),
hits1 AS (SELECT doc_id, pos FROM cg1 JOIN dup1 USING (g)),
cover1 AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits1 h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q195_L - 1})) AS o
  ) v
),
toks1 AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words1
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept1 AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks1 t ANTI JOIN cover1 c ON t.doc_id = c.doc_id AND t.p = c.p
),
agg1 AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY p), ' ') AS t2,
         count(*) AS n2
  FROM kept1 GROUP BY doc_id
),
scrubbed AS MATERIALIZED (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.n1 = 0 THEN '' ELSE coalesce(s.t2, '') END AS t2,
         CASE WHEN d.n1 = 0 THEN 0 ELSE coalesce(s.n2, 0) END AS n2
  FROM decon d LEFT JOIN agg1 s USING (doc_id)
  WHERE (CASE WHEN d.n1 = 0 THEN 0 ELSE coalesce(s.n2, 0) END)
        >= {_Q195_MIN_CLEAN}
),
cws AS (SELECT doc_id, string_split(t2, ' ') AS w FROM scrubbed),
csh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cws WHERE len(w) >= 3
  )
),
hsh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM hwv WHERE len(w) >= 3
  )
),
chashed AS (SELECT doc_id, {hash_expr} FROM csh),
hhashed AS (SELECT doc_id, {hash_expr} FROM hsh),
csigs AS (
  SELECT doc_id,
         {_MH_SIG_COLS}
  FROM chashed GROUP BY doc_id
),
hsigs AS (
  SELECT doc_id,
         {_MH_SIG_COLS}
  FROM hhashed GROUP BY doc_id
),
cbands AS (
  {_MH_BAND_SELECTS.replace("FROM sigs", "FROM csigs")}
),
hbands AS (
  {_MH_BAND_SELECTS.replace("FROM sigs", "FROM hsigs")}
),
cheavy AS (
  SELECT band, sig FROM cbands
  GROUP BY band, sig HAVING count(*) > {_Q195_MAXBF}
),
ckept AS (
  SELECT c.* FROM cbands c
  WHERE NOT EXISTS (
    SELECT 1 FROM cheavy x WHERE x.band = c.band AND x.sig = c.sig
  )
),
fcand AS (
  SELECT DISTINCT c.doc_id AS cid, h.doc_id AS hid
  FROM ckept c JOIN hbands h ON c.band = h.band AND c.sig = h.sig
),
fsz_c AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY doc_id),
fsz_h AS (SELECT doc_id, count(*) AS n_sh FROM hsh GROUP BY doc_id),
fpc AS (
  SELECT p.cid, p.hid, count(*) AS n_common
  FROM fcand p
  JOIN csh a ON a.doc_id = p.cid
  JOIN hsh b ON b.doc_id = p.hid AND b.shingle = a.shingle
  GROUP BY p.cid, p.hid
),
contaminated AS (
  SELECT DISTINCT cid AS doc_id
  FROM fpc p
  JOIN fsz_c sa ON p.cid = sa.doc_id
  JOIN fsz_h sb ON p.hid = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        >= {_Q195_SIM}
),
fclean AS MATERIALIZED (
  SELECT * FROM scrubbed
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
cwf AS (SELECT doc_id, string_split(t2, ' ') AS w FROM fclean),
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cwf WHERE len(w) >= 3
  )
),
sh_freq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
pruned AS (
  SELECT s.doc_id, s.shingle FROM shingles s
  JOIN sh_freq f USING (shingle) WHERE f.df <= 20
),
doc_sizes AS (SELECT doc_id, count(*) AS n_sh FROM pruned GROUP BY doc_id),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM pruned a JOIN pruned b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM pair_common p
  JOIN doc_sizes sa ON p.doc_a = sa.doc_id
  JOIN doc_sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        >= {_Q195_SIM}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
losers AS (SELECT node FROM labels WHERE node <> component),
final AS (
  SELECT * FROM fclean WHERE doc_id NOT IN (SELECT node FROM losers)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n2) AS BIGINT) AS total_tokens,
       round(avg(n2), 2) AS avg_tokens,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM final
GROUP BY lang
ORDER BY lang
"""


@register(
    "q195_curation_pipeline_full_decontamination",
    tags=("capstone", "dedup", "exact-substring", "lsh",
          "decontamination", "quality", "text"),
    oracle=_q195_oracle(),
)
def q195_curation_pipeline_full_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capstone v4 — the complete decontamination family in one ladder:
    content-hash split -> quality -> fingerprint exact dedup ->
    exact-substring DECONTAMINATION vs held-out (verbatim leakage cut)
    -> exact-substring scrub within the corpus -> hollow-doc cut ->
    FUZZY MinHash decontamination vs held-out over the scrubbed text
    (near-duplicate leakage the verbatim pass can't see, doc-level) ->
    Jaccard clustering -> survivors -> per-language stats. Three gram
    passes, all no-pairwise (two exact-substring, one banded MinHash
    with the held-out side broadcast); four persisted shared subtrees."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate,
        exact_substring_scrub,
        minhash_decontaminate,
    )
    from datalakeingestionservice_spark.queries.text import (
        _MH_BANDS,
        _MH_K,
        _MH_SEED,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text", "lang").withColumn(
        "__b", b16
    )
    train = docs.filter(F.col("__b") < 14).drop("__b")
    held = docs.filter(F.col("__b") >= 14).select("doc_id", "text")

    quality = (
        train.withColumn("n_tokens", n_tokens("text"))
        .withColumn("diversity", lexical_diversity("text"))
        .filter((F.col("n_tokens") >= 20) & (F.col("diversity") >= 0.25))
        .drop("diversity")
    )
    # The three gram passes below each shuffle ~corpus_tokens×shingle
    # rows; scale the partition count with the input (VERDICT r12 #2 —
    # fixed 32 partitions was the steepest curve in the repo at sf10).
    # Every gram-heavy stage MATERIALIZES inside this block (persist
    # fill / localCheckpoint), so the scaled setting governs exactly
    # the shuffles that need it; the post-block survivors join + final
    # stats run over checkpointed, already-reduced rows.
    with _gram_scaled_shuffle(spark, sf_dir):
        exact_kept = (
            exact_dedup(
                fingerprint(quality, "text"),
                keys=["fingerprint"],
                tiebreaker="doc_id",
            )
            .drop("fingerprint")
            .persist()
        )
        decon = (
            exact_substring_decontaminate(
                exact_kept.select("doc_id", "text"),
                held,
                min_len=_Q195_L,
                out_col="t1",
            )
            .join(exact_kept.select("doc_id", "lang", "n_tokens"), "doc_id")
            .withColumn(
                "n1",
                (F.col("n_tokens") - F.col("n_removed_tokens")).cast("long"),
            )
            .select("doc_id", "lang", "t1", "n1")
            .persist()
        )
        scrubbed = (
            exact_substring_scrub(
                decon.select("doc_id", F.col("t1").alias("text")),
                min_len=_Q195_L,
                out_col="t2",
            )
            .join(decon, "doc_id")
            .withColumn(
                "n2",
                (F.col("n1") - F.col("n_removed_tokens")).cast("long"),
            )
            .filter(F.col("n2") >= _Q195_MIN_CLEAN)
            .select("doc_id", "lang", "t2", "n2")
            # localCheckpoint, not persist: the fuzzy stage references this
            # tier through 8 banded union branches plus the verify sets, and
            # the jaccard stage through two more — on the two-gram-pass
            # LINEAGE that makes a ~23M-char logical plan. Caching alone
            # does not help (substitution happens after ANALYSIS, and
            # re-analyzing the giant tree per action cost ~70 s of the 86 s
            # at sf0.01); checkpointing truncates the plan to the stored
            # partitions (86 s -> ~14 s, same results). At 100 TB this is
            # the standard stage boundary — a real ladder materializes the
            # scrubbed corpus between major phases anyway.
            .localCheckpoint()
        )
        fuzzy_survivor_ids = minhash_decontaminate(
            scrubbed.select("doc_id", F.col("t2").alias("text")),
            held,
            n=3,
            num_hashes=_MH_K,
            bands=_MH_BANDS,
            min_sim=_Q195_SIM,
            seed=_MH_SEED,
            # stop-bucket cut (oracle-mirrored in cheavy/ckept): dense
            # band buckets are the measured super-linear verification
            # term at 10x volume; see _Q195_MAXBF
            max_band_freq=_Q195_MAXBF,
        ).select("doc_id")
        fclean = scrubbed.join(
            fuzzy_survivor_ids, "doc_id", "leftsemi"
        ).localCheckpoint()  # same lineage cut for the clustering tier
        shingles = word_shingles(
            fclean, "doc_id", "t2", n=3, max_shingle_freq=20,
            # row-side dedup measured faster for THIS tier at sf10
            # (26.1 s vs 33.9 r13 with the global distinct): fclean is
            # a checkpointed, already-reduced corpus, and the scaled
            # shuffle width makes the recomputed explode cheaper than
            # the exchange. q45's bench-scale measurement went the
            # other way — per-site choice, not a global default.
            per_doc_dedup=True,
        )
        pairs = (
            # strategy stays "join": the fused variant (length filter +
            # folded sizes) won its STANDALONE probe on raw documents
            # (−28% at sf1, probe_jaccard_variants) but LOST in-pipeline
            # here (full q195 same-host A/B: sf1 13.8→15.0, sf10
            # 72.7→79.3) — the scrubbed corpus is shorter and uniformly
            # sized, so the length filter removes little while the
            # window's doc-keyed exchange+sort is a new corpus-sized
            # cost under the scaled partition count. Measured, rejected.
            jaccard_pairs(
                shingles, id_col="doc_id", threshold=_Q195_SIM, persist=True
            )
            .select("doc_a", "doc_b")
            # force the third gram pass to EXECUTE under the scaled
            # partition count (persist alone is lazy — it would
            # otherwise materialize at the caller's collect, after the
            # setting is restored); pairs are a tiny edge list
            .localCheckpoint()
        )
    final = dedup_survivors(fclean, pairs)

    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n2").alias("total_tokens"),
            F.round(F.avg("n2"), 2).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )
