"""Corpus-curation queries (q108-q112): the corpus-level stages of an LLM
training-data pipeline — decontamination, stratified sampling, per-group
quality cuts, sequence packing, repetition filtering — each paired with a
DuckDB oracle over the same `documents` table.

These extend the reference's row-level transformation surface
(`src/Infrastructure/Transformation/TransformationEngine.cs:21-69`) with the
operations a 100 TB training corpus actually needs; see
`operators/curation.py` for the scale analysis of each plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.curation import (
    decontaminate,
    hash_fraction,
    pack_sequences,
    quality_top_p,
    repetition_metrics,
    stratified_sample,
)
from datalakeingestionservice_spark.operators.text import (
    STOPWORDS,
    n_tokens,
    quality_score,
)
from datalakeingestionservice_spark.queries.registry import register

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


# ---------------------------------------------------------------------------
# q108 — benchmark decontamination (n-gram overlap vs a held-out set).
# ---------------------------------------------------------------------------
@register(
    "q108_decontaminate",
    tags=("curation", "dedup", "llm", "decontamination"),
    oracle="""
WITH sh AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w) - 2),
                               i -> array_to_string(w[i:i+3], ' '))) AS shingle
  FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
contam AS (
  SELECT DISTINCT doc_id FROM sh
  WHERE source <> 'src0' AND shingle IN (SELECT shingle FROM bench)
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM contam)
ORDER BY d.doc_id
""",
)
def q108_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage guard: drop every training doc sharing any 4-word
    shingle with the benchmark slice (source 'src0' stands in for the eval
    set). Benchmark shingles broadcast (eval sets are MBs against a TB
    corpus), so the corpus side is a scan + semi-join with no text shuffle;
    only contaminated ids cross the wire for the anti-join."""
    env = Env(spark, sf_dir)
    docs = env.t("documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    clean = decontaminate(train, bench, "doc_id", "text", n=4)
    return clean.select("doc_id", "lang", "source").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q109 — deterministic stratified sampling by language.
# ---------------------------------------------------------------------------
@register(
    "q109_stratified_sample",
    tags=("curation", "sampling", "llm"),
    oracle="""
WITH hashed AS (
  SELECT doc_id, lang,
         CAST(CAST(concat('0x', substr(sha256(lower(trim(text))), 1, 8))
                   AS BIGINT) AS DOUBLE) / 4294967296.0 AS frac
  FROM documents
)
SELECT doc_id, lang, frac
FROM hashed
WHERE frac < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.4 ELSE 0.25 END
ORDER BY doc_id
""",
)
def q109_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing downsample: keep 50% of English, 40% of Chinese,
    25% of the rest — decided by a content-hash fraction, so the sample is
    identical across runs, clusters, and partitionings (rand() is none of
    those). Pure scan-side filter: zero shuffles, pushdown-friendly. The
    fraction is k/2^32 (exact dyadic), so Spark and DuckDB compare
    bit-identical doubles."""
    env = Env(spark, sf_dir)
    docs = env.t("documents")
    key = F.lower(F.trim(F.col("text")))
    sampled = stratified_sample(
        docs,
        "lang",
        {"en": 0.5, "zh": 0.4},
        key,
        default_rate=0.25,
    )
    return sampled.select(
        "doc_id", "lang", hash_fraction(key).alias("frac")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q110 — top-p quality cut per language.
# ---------------------------------------------------------------------------
@register(
    "q110_quality_top_p",
    tags=("curation", "quality", "window", "llm"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
               + 0.3 * least(CAST(len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOP_SQL}))) AS DOUBLE)
                             / len(string_split(text, ' ')) * 5.0, 1.0)
               + 0.3 * CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE)
                       / len(string_split(text, ' ')), 4) AS q
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, q,
         cume_dist() OVER (PARTITION BY lang ORDER BY q DESC, doc_id ASC)
           AS cd
  FROM scored
)
SELECT doc_id, lang, q AS quality_score
FROM ranked WHERE cd <= 0.3
ORDER BY doc_id
""",
)
def q110_quality_top_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the best 30% of each language by heuristic quality score — the
    per-group quality cut of corpus assembly. Ranking on the 4dp-rounded
    score with a doc_id tie-break makes the cut deterministic and
    cross-engine stable; cume_dist <= p keeps exactly floor(p * group_size)
    rows. One shuffle (on lang); at 100 TB the sort runs within language
    partitions."""
    env = Env(spark, sf_dir)
    scored = env.t("documents").select(
        "doc_id",
        "lang",
        F.round(quality_score("text"), 4).alias("quality_score"),
    )
    return quality_top_p(
        scored, "lang", "quality_score", p=0.3, id_col="doc_id"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q111 — token-budget sequence packing (context-window assembly).
# ---------------------------------------------------------------------------
@register(
    "q111_pack_sequences",
    tags=("curation", "packing", "window", "llm"),
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
offsets AS (
  SELECT doc_id, lang, n_tok,
         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tok AS bin_offset
  FROM toks
)
SELECT lang,
       CAST(floor(bin_offset / 256.0) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens
FROM offsets
GROUP BY lang, CAST(floor(bin_offset / 256.0) AS BIGINT)
ORDER BY lang, bin_id
""",
)
def q111_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each language's docs into 256-token context bins by offset
    packing: a doc joins the bin its cumulative start offset falls into, so
    the whole assignment is ONE window (single shuffle on lang) with no
    sequential bin dependence — bins overflow by at most one doc, the
    streaming-friendly relaxation of greedy packing (exact greedy is
    `pack_sequences_greedy`, applyInPandas per partition)."""
    env = Env(spark, sf_dir)
    toks = env.t("documents").select(
        "doc_id", "lang", n_tokens("text").alias("n_tok")
    )
    packed = pack_sequences(toks, "lang", "doc_id", "n_tok", budget=256)
    return (
        packed.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# q112 — repetition filter (Gopher-style degeneracy signals).
# ---------------------------------------------------------------------------
@register(
    "q112_repetition_filter",
    tags=("curation", "quality", "repetition", "llm"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
base AS (
  SELECT doc_id, len(w) AS n_tokens,
         CASE WHEN len(w) > 1 THEN
           1.0 - CAST(len(list_distinct(
                   list_transform(range(1, len(w)),
                                  i -> array_to_string(w[i:i+1], ' '))))
                 AS DOUBLE) / (len(w) - 1)
         ELSE 0.0 END AS dup_bigram_frac
  FROM toks
),
counts AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
  GROUP BY doc_id, tok
),
topcnt AS (
  SELECT doc_id, max(cnt) AS top_token_count FROM counts GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, t.top_token_count,
       round(CAST(t.top_token_count AS DOUBLE) / b.n_tokens, 4)
         AS top_token_ratio,
       round(b.dup_bigram_frac, 4) AS dup_bigram_frac,
       (CAST(t.top_token_count AS DOUBLE) / b.n_tokens > 0.2
        OR b.dup_bigram_frac > 0.3) AS is_repetitive
FROM base b JOIN topcnt t USING (doc_id)
ORDER BY b.doc_id
""",
)
def q112_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021, table A1):
    most-frequent-token ratio and duplicate-bigram fraction, with the
    degeneracy flag at the published-style thresholds (top token > 20% of
    doc, or > 30% of bigrams duplicated). Token counts shuffle (doc_id,
    token) pairs — never text payloads; the bigram fraction is a codegen
    array expression at scan time."""
    env = Env(spark, sf_dir)
    m = repetition_metrics(env.t("documents"), "doc_id", "text")
    return m.select(
        "doc_id",
        "n_tokens",
        "top_token_count",
        F.round("top_token_ratio", 4).alias("top_token_ratio"),
        F.round("dup_bigram_frac", 4).alias("dup_bigram_frac"),
        (
            (F.col("top_token_ratio") > 0.2)
            | (F.col("dup_bigram_frac") > 0.3)
        ).alias("is_repetitive"),
    ).orderBy("doc_id")


@register(
    "q142_pii_scrub",
    tags=("curation", "pii", "redaction", "llm"),
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@corp.example.com or 555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || CASE WHEN doc_id % 2 = 0 THEN
                   ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                    || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
),
staged AS (
  SELECT doc_id, text,
    regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
      '[REDACTED]', 'g') AS after_email
  FROM aug
),
staged2 AS (
  SELECT *, regexp_replace(after_email,
      '\\d{3}-\\d{2}-\\d{4}', '[REDACTED]', 'g') AS after_ssn
  FROM staged
),
scrubbed AS (
  SELECT doc_id,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
    len(regexp_extract_all(after_email,
        '\\d{3}-\\d{2}-\\d{4}')) AS n_ssns,
    len(regexp_extract_all(after_ssn,
        '\\d{3}-\\d{3}-\\d{4}')) AS n_phones,
    regexp_replace(after_ssn,
      '\\d{3}-\\d{3}-\\d{4}', '[REDACTED]', 'g') AS text_scrubbed
  FROM staged2
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(n_ssns) AS BIGINT) AS total_ssns,
       CAST(sum(n_phones) AS BIGINT) AS total_phones,
       CAST(sum(length(text_scrubbed)) AS BIGINT) AS total_len,
       CAST(sum(CASE WHEN n_emails + n_ssns + n_phones > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_touched
FROM scrubbed
""",
)
def q142_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (`operators/curation.py scrub_pii` — the
    Dolma/C4-style redaction tagger): the documents corpus is augmented
    IN-PLAN with deterministic synthetic PII (email + phone per doc, SSN
    on even ids — both engines build the identical strings from doc_id),
    then scrubbed. Per-type counts come from the original text and the
    redacted corpus is value-checked via total length — a regex-semantics
    divergence between Spark's Java regex and DuckDB's RE2, or a
    missed/doubled replacement, shifts the totals. The operator is a
    map-only JVM projection (regexp_count/regexp_replace): at 100 TB it
    pipelines into the curation pass with zero shuffles."""
    from datalakeingestionservice_spark.operators.curation import (
        scrub_pii,
    )

    env = Env(spark, sf_dir)
    d = F.col("doc_id")
    pad = lambda m, w: F.lpad((d % m).cast("string"), w, "0")  # noqa: E731
    aug = env.t("documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@corp.example.com or 555-"),
            pad(1000, 3),
            F.lit("-"),
            pad(10000, 4),
            F.when(
                d % 2 == 0,
                F.concat(
                    F.lit(" ssn "),
                    pad(1000, 3),
                    F.lit("-"),
                    pad(100, 2),
                    F.lit("-"),
                    pad(10000, 4),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    s = scrub_pii(aug, "text")
    return s.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_ssns").alias("total_ssns"),
        F.sum("n_phones").alias("total_phones"),
        F.sum(F.length("text_scrubbed")).alias("total_len"),
        F.sum(
            (F.col("n_redactions") > 0).cast("bigint")
        ).alias("docs_touched"),
    )
