"""Text-analysis and deduplication operators over `documents` (SURVEY.md C1/C2/C5).

LLM-training-data-pipeline ops the reference lacks entirely: exact dedup,
n-gram Jaccard near-dup, MinHash LSH, fingerprinting, token statistics,
quality scoring, language-ID heuristics. Everything except the LSH model is
expressed in engine-portable SQL semantics so DuckDB verifies it exactly.

Scale posture: all dedup paths avoid O(n^2) — exact dedup is a hash groupBy on
the text (or fingerprint) key; near-dup goes through shingle inverted-index
joins or LSH banding, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.operators.dedup import (
    _MINHASH_P,
    _minhash_coeffs,
    dup_groups,
    jaccard_pairs,
    minhash_neardup_pairs,
    simhash16,
    word_shingles,
)
from datalakeingestionservice_spark.operators.text import STOPWORDS, token_stats
from datalakeingestionservice_spark.queries.registry import register

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


# ---------------------------------------------------------------------------
# q40 — corpus statistics per language.
# ---------------------------------------------------------------------------
@register(
    "q40_doc_lang_stats",
    tags=("text", "groupby"),
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       count(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def q40_doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile."""
    env = Env(spark, sf_dir)
    return (
        env.t("documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q41 — per-document token statistics (whitespace tokenization).
# ---------------------------------------------------------------------------
@register(
    "q41_doc_token_stats",
    headline=True,
    tags=("text", "tokenize"),
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS len_chars,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS avg_token_len,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       round(CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ({_STOP_SQL}))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS stopword_ratio
FROM documents
ORDER BY doc_id
""",
)
def q41_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity + stopword ratio, all with built-in
    higher-order array functions (zero Python in the hot path)."""
    env = Env(spark, sf_dir)
    return token_stats(env.t("documents")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q42 — document quality scoring.
# ---------------------------------------------------------------------------
@register(
    "q42_doc_quality_score",
    tags=("text", "quality"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({_STOP_SQL}))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       round(stop_ratio, 4) AS stop_ratio,
       round(diversity, 4) AS diversity,
       round(0.4 * least(n_tokens / 50.0, 1.0)
             + 0.3 * least(stop_ratio * 5.0, 1.0)
             + 0.3 * diversity, 4) AS quality_score
FROM scored
ORDER BY doc_id
""",
)
def q42_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from length, stopword presence, and lexical
    diversity — the filter stage of a training-data pipeline."""
    env = Env(spark, sf_dir)
    stop_array = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = F.split(F.col("text"), " ")
    base = env.t("documents").select(
        "doc_id",
        "lang",
        F.size(words).alias("n_tokens"),
        (
            F.expr(
                f"size(filter(split(text, ' '), w -> w IN ({stop_array})))"
            ).cast("double")
            / F.size(words)
        ).alias("stop_ratio_raw"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias(
            "diversity_raw"
        ),
    )
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round("stop_ratio_raw", 4).alias("stop_ratio"),
        F.round("diversity_raw", 4).alias("diversity"),
        F.round(
            0.4 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
            + 0.3 * F.least(F.col("stop_ratio_raw") * 5.0, F.lit(1.0))
            + 0.3 * F.col("diversity_raw"),
            4,
        ).alias("quality_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q43 — document fingerprinting (sha256 of normalized text).
# ---------------------------------------------------------------------------
@register(
    "q43_doc_fingerprint",
    tags=("text", "dedup", "hash"),
    oracle="""
SELECT doc_id,
       sha256(lower(trim(text))) AS fingerprint,
       substr(sha256(lower(trim(text))), 1, 8) AS shard_key
FROM documents
ORDER BY doc_id
""",
)
def q43_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint: the exact-dedup key at 100 TB (dedup on
    a 32-byte hash, never on the raw text). sha256 hex matches across engines."""
    env = Env(spark, sf_dir)
    fp = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        env.t("documents")
        .select(
            "doc_id",
            fp.alias("fingerprint"),
            F.substring(fp, 1, 8).alias("shard_key"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q44 — exact deduplication (hash groupBy, deterministic survivor).
# ---------------------------------------------------------------------------
@register(
    "q44_exact_dedup",
    headline=True,
    tags=("text", "dedup"),
    oracle="""
WITH dup_corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 5 = 0
)
SELECT min(doc_id) AS keep_id,
       count(*) AS n_copies,
       length(text) AS text_len
FROM dup_corpus
GROUP BY text
ORDER BY keep_id
""",
)
def q44_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic survivor (min doc_id) — NOT
    dropDuplicates, whose survivor is partition-order-dependent. The duplicated
    corpus is constructed in-query (every 5th doc re-inserted under a new id)
    so the op provably collapses real duplicates."""
    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    groups = dup_groups(docs.unionByName(dups), keys=["text"], id_col="doc_id")
    return groups.select(
        "keep_id", "n_copies", F.length("text").alias("text_len")
    ).orderBy("keep_id")


# ---------------------------------------------------------------------------
# q45 — n-gram Jaccard near-duplicate pairs (inverted-index join, no O(n^2)).
# ---------------------------------------------------------------------------
@register(
    "q45_ngram_jaccard_neardup",
    headline=True,
    tags=("text", "dedup", "similarity"),
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
all_shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM words WHERE len(w) >= 3
  )
),
-- stop-shingle pruning, SAME df cut as the engine (max_shingle_freq=50):
-- a shingle in more than 50 docs contributes C(df,2) candidate pairs of
-- near-zero signal; at the test SFs max df is ~25 so nothing is pruned
-- (results identical to the unpruned form), while at 10x+ volume the cut
-- bounds the quadratic term.
stop AS (
  SELECT shingle FROM all_shingles GROUP BY shingle HAVING count(*) > 50
),
shingles AS (
  SELECT s.doc_id, s.shingle FROM all_shingles s
  WHERE s.shingle NOT IN (SELECT shingle FROM stop)
),
doc_sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM pair_common p
JOIN doc_sizes sa ON p.doc_a = sa.doc_id
JOIN doc_sizes sb ON p.doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def q45_ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over 3-word shingles via an inverted-index self-join:
    candidate pairs only where a shingle co-occurs, so cost is driven by
    posting-list sizes, not |docs|^2 — bounded by stop-shingle pruning
    (`max_shingle_freq=50`, mirrored in the DuckDB oracle so the query
    stays hash-checked): a shingle in >50 docs adds C(df,2) candidate
    pairs of near-zero signal, the quadratic term that made the unpruned
    form 15.5x at the sf1 probe. At the test SFs max df is ~25, so the
    cut prunes nothing and results are identical to the unpruned form;
    pruned-vs-unpruned recall is pinned 1.0 in pytest at an aggressive
    cut (tests/test_operators.py)."""
    env = Env(spark, sf_dir)
    shingles = word_shingles(
        env.t("documents"), "doc_id", "text", n=3, max_shingle_freq=50
    )
    # persist=True: with pruning in front, the pruned posting list
    # feeds sizes + both self-join sides, and recomputing it now costs
    # an extra aggregate + anti-join per consumer — measured 2.2x
    # (sf0.1) / 2.6x (sf1 probe) faster cached. MEMORY_AND_DISK, so a
    # huge posting list spills rather than OOMs at scale.
    # strategy="fused" (optimization r14): the PPJoin length filter +
    # folded sizes drop both pair-sized size joins from the plan —
    # alternating warm A/B on THIS shape (tools/probe_q45_fused.py):
    # sf0.1 3.10 -> 2.49 s (−20%), sf1 a statistical wash (join
    # 14.59/14.95 min/med vs fused 14.01/15.42 over 4 rounds);
    # identical rows asserted in the probe and pinned in pytest.
    pairs = jaccard_pairs(
        shingles, id_col="doc_id", threshold=0.5, persist=True,
        strategy="fused",
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# q46 — MinHash LSH near-dup candidates. Native seeded permutation hashes
# (engine-owned, sha256-derived — see operators/dedup.py) make the WHOLE
# pipeline — signatures, bands, candidates, exact-Jaccard verify — exactly
# recomputable by DuckDB, so q46 is hash-checked like every other query.
# ---------------------------------------------------------------------------
_MH_K, _MH_BANDS, _MH_SEED = 16, 8, 42
_MH_ROWS = _MH_K // _MH_BANDS
_MH_COEFFS = _minhash_coeffs(_MH_K, _MH_SEED)
_MH_SIG_COLS = ",\n         ".join(
    f"min(({a} * h + {b}) % {_MINHASH_P}) AS mh{k}"
    for k, (a, b) in enumerate(_MH_COEFFS)
)
_MH_BAND_SELECTS = "\n  UNION ALL\n  ".join(
    "SELECT doc_id, {bd} AS band, concat_ws(',', {cols}) AS sig FROM sigs".format(
        bd=bd,
        cols=", ".join(
            f"mh{bd * _MH_ROWS + j}" for j in range(_MH_ROWS)
        ),
    )
    for bd in range(_MH_BANDS)
)


@register(
    "q46_minhash_lsh_neardup",
    tags=("text", "dedup", "lsh"),
    oracle=f"""
WITH words AS (
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
hashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {_MINHASH_P} AS h
  FROM shingles
),
sigs AS (
  SELECT doc_id,
         {_MH_SIG_COLS}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {_MH_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
doc_sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
),
pair_common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4)
         AS jaccard_sim
FROM pair_common p
JOIN doc_sizes sa ON p.doc_a = sa.doc_id
JOIN doc_sizes sb ON p.doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.4
ORDER BY doc_a, doc_b
""",
)
def q46_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH over 3-word shingles: the sub-quadratic scale path for
    fuzzy dedup. Native seeded permutation family h_k = (a_k*h + b_k) mod p
    over sha256-derived shingle hashes — pure JVM expressions, one aggregate
    for the K-wide signature, banded equi-join for candidates, exact Jaccard
    verification on the (sparse) candidate set only. Deterministic AND
    engine-portable: DuckDB recomputes the identical signatures from the
    same embedded (a_k, b_k) literals, so the oracle hash-matches.
    Candidate recall vs the q45 exact anchor pinned >= 0.95 in pytest
    (tests/test_operators.py::test_minhash_recall_vs_exact_anchor)."""
    env = Env(spark, sf_dir)
    pairs = minhash_neardup_pairs(
        env.t("documents"),
        n=3,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        min_sim=0.4,
        seed=_MH_SEED,
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard_sim", 4).alias("jaccard_sim")
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# q95 — deterministic train/val/test split by content hash.
# ---------------------------------------------------------------------------
@register(
    "q95_hash_split",
    tags=("text", "sampling", "split", "llm"),
    oracle="""
WITH assigned AS (
  SELECT doc_id, lang,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS bucket16
  FROM documents
),
split AS (
  SELECT doc_id, lang,
         CASE WHEN bucket16 < 12 THEN 'train'
              WHEN bucket16 < 14 THEN 'val'
              ELSE 'test' END AS split
  FROM assigned
)
SELECT lang, split, count(*) AS n_docs
FROM split
GROUP BY lang, split
ORDER BY lang, split
""",
)
def q95_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 75/12.5/12.5 train/val/test split keyed on the CONTENT
    fingerprint, not row position: stable under reshuffles, re-ingestion, and
    corpus growth, and duplicate texts always land in the same split (no
    train/test leakage through near-copies of the exact kind dedup catches).
    The first fingerprint nibble gives 16 uniform buckets -> 12/2/2."""
    env = Env(spark, sf_dir)
    bucket16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    assigned = env.t("documents").select(
        "doc_id",
        "lang",
        F.when(bucket16 < 12, F.lit("train"))
        .when(bucket16 < 14, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return (
        assigned.groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )


#: DuckDB SimHash16 computation (mirrors operators.dedup.simhash16) — shared
#: by q48 (fingerprints) and q88 (Hamming-band near-dup join).
_SIMHASH_SQL = """
tokens AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  )
),
bits AS (
  SELECT doc_id, tok,
         (strpos('0123456789abcdef', substr(sha256(tok), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(sha256(tok), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(sha256(tok), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256(tok), 4, 1)) - 1) AS h
  FROM tokens
),
votes AS (
  SELECT doc_id, b.bit AS bit,
         sum(CASE WHEN (h // CAST(pow(2, b.bit) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM bits CROSS JOIN (SELECT unnest(range(0, 16)) AS bit) b
  GROUP BY doc_id, b.bit
),
simhashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash16
  FROM votes GROUP BY doc_id
)
"""


# ---------------------------------------------------------------------------
# q88 — SimHash Hamming-band near-dup join.
# ---------------------------------------------------------------------------
@register(
    "q88_simhash_neardup",
    tags=("text", "dedup", "hash", "lsh"),
    oracle=f"""
WITH
{_SIMHASH_SQL},
banded AS (
  SELECT s.doc_id, s.simhash16, b.band,
         (s.simhash16 >> (b.band * 4)) & 15 AS band_val
  FROM simhashes s CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash16, b.simhash16)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
FROM candidates
WHERE hamming <= 1
ORDER BY doc_a, doc_b
""",
)
def q88_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded SimHash near-dup join: 4 bands of 4 bits — pigeonhole
    guarantees distance<=3 pairs collide in >=1 band, so candidates come from
    a band equi-join (the bitwise analog of MinHash banding), then exact
    popcount(XOR) filters."""
    from datalakeingestionservice_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    env = Env(spark, sf_dir)
    pairs = simhash_neardup_pairs(env.t("documents"), max_hamming=1)
    return pairs.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# q85 — BPE-style regex pre-tokenization (token counting beyond whitespace).
# ---------------------------------------------------------------------------
@register(
    "q85_bpe_pretokenize",
    tags=("text", "tokenize", "llm"),
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, ' ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(list_distinct(regexp_extract_all(text,
           ' ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS n_unique_bpe,
       regexp_extract_all(text, ' ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^A-Za-z0-9 ]+')[3]
         AS third_token
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q85_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-tokenization: the space-prefixed word/number/punct
    regex split that precedes BPE merges — token counting that tracks real
    tokenizer behavior far better than whitespace. Pure regexp_extract_all
    (JVM regex), pattern restricted to the RE2-compatible subset so the
    DuckDB oracle matches token-for-token."""
    env = Env(spark, sf_dir)
    pattern = " ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^A-Za-z0-9 ]+"
    toks = F.expr(f"regexp_extract_all(text, '{pattern}', 0)")
    return (
        env.t("documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(toks).alias("n_bpe_tokens"),
            F.size(F.split("text", " ")).alias("n_ws_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
            F.element_at(toks, 3).alias("third_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q84 — context-window chunking (overlapping token windows).
# ---------------------------------------------------------------------------
@register(
    "q84_text_chunking",
    tags=("text", "chunking", "llm"),
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200
),
starts AS (
  SELECT doc_id, toks,
         range(1, greatest(len(toks) - 16, 1) + 1, 48) AS start_list
  FROM w
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, len(start_list))) AS chunk_idx,
         unnest(list_transform(start_list,
                               s -> array_to_string(toks[s:s+63], ' '))) AS chunk_text
  FROM starts
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text,
       len(string_split(chunk_text, ' ')) AS n_chunk_tokens
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def q84_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap (stride 48) — the context-window
    prep op; executor-side fan-out via sequence+slice+posexplode, no Python."""
    from datalakeingestionservice_spark.operators.text import chunk_text

    env = Env(spark, sf_dir)
    docs = env.t("documents").filter(F.col("doc_id") < 200)
    return chunk_text(docs, chunk_tokens=64, overlap_tokens=16).orderBy(
        "doc_id", "chunk_idx"
    )


# ---------------------------------------------------------------------------
# q47 — language-ID heuristic + confusion profile.
# ---------------------------------------------------------------------------
@register(
    "q47_langid_heuristic",
    tags=("text", "langid"),
    oracle=f"""
WITH feats AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({_STOP_SQL}))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(text, ' ')) AS avg_wlen
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
         CASE WHEN stop_ratio >= 0.08 THEN 'en'
              WHEN avg_wlen >= 5.5 THEN 'de'
              ELSE 'other' END AS lang_pred
  FROM feats
)
SELECT lang, lang_pred, count(*) AS n_docs
FROM pred
GROUP BY lang, lang_pred
ORDER BY lang, lang_pred
""",
)
def q47_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-threshold language-ID (stopword ratio, mean word length) plus
    the confusion matrix against the labeled lang column. On synthetic text the
    accuracy is meaningless; the operator shape (featurize -> classify ->
    evaluate) is what scales to a real fastText-style scorer via pandas UDF."""
    env = Env(spark, sf_dir)
    stop_array = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = F.split(F.col("text"), " ")
    feats = env.t("documents").select(
        "doc_id",
        "lang",
        (
            F.expr(
                f"size(filter(split(text, ' '), w -> w IN ({stop_array})))"
            ).cast("double")
            / F.size(words)
        ).alias("stop_ratio"),
        (
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / F.size(words)
        ).alias("avg_wlen"),
    )
    pred = feats.select(
        "lang",
        F.when(F.col("stop_ratio") >= 0.08, F.lit("en"))
        .when(F.col("avg_wlen") >= 5.5, F.lit("de"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


# ---------------------------------------------------------------------------
# q48 — SimHash (64-bit) fingerprints via engine-portable arithmetic.
# ---------------------------------------------------------------------------
@register(
    "q48_simhash",
    tags=("text", "dedup", "hash"),
    oracle="""
WITH tokens AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  )
),
bits AS (
  SELECT doc_id, tok,
         -- 16-bit token hash from sha256 hex (engine-portable):
         (strpos('0123456789abcdef', substr(sha256(tok), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(sha256(tok), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(sha256(tok), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256(tok), 4, 1)) - 1) AS h
  FROM tokens
),
votes AS (
  SELECT doc_id, b.bit AS bit,
         sum(CASE WHEN (h // CAST(pow(2, b.bit) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM bits CROSS JOIN (SELECT unnest(range(0, 16)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash16
FROM votes
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q48_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over distinct tokens: per-bit majority vote of token-hash bits.
    Token hash = first 16 bits of sha256 hex, so Spark and DuckDB agree bit-for-
    bit. (Production width is 64 bits via xxhash64; 16 here keeps the oracle
    arithmetic in exact-int range in both engines.)"""
    env = Env(spark, sf_dir)
    return simhash16(env.t("documents"), "doc_id", "text").orderBy("doc_id")


@register(
    "q118_bm25_ranking",
    tags=("text", "search", "bm25", "ranking"),
    oracle="""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM documents
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM documents
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'vector', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score
FROM sc
ORDER BY round(s, 4) DESC, doc_id
LIMIT 20
""",
)
def q118_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the query {spark, vector, stream} over
    `documents` (`operators/text.py:bm25_rank`). The corpus tokenizes
    once and shrinks to query-term hits before any shuffle; N/avgdl and
    the df table are broadcast; ranking is TakeOrderedAndProject. Scores
    round to 4dp BEFORE ordering so the cutoff is engine-reproducible.
    Full-text relevance is a capability the reference punts to its RDBMS
    and loses on the lake side entirely."""
    from datalakeingestionservice_spark.operators.text import bm25_rank

    env = Env(spark, sf_dir)
    return bm25_rank(
        env.t("documents"), ["spark", "vector", "stream"], top_k=20
    )


@register(
    "q125_bm25_phrase_and",
    tags=("text", "search", "bm25", "phrase", "ranking"),
    oracle="""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM documents
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM documents
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('big', 'data', 'vector')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
hasall AS (
  SELECT doc_id FROM tf GROUP BY doc_id HAVING count(DISTINCT term) = 3
),
norm AS (
  SELECT doc_id,
         ' ' || array_to_string(
           list_filter(string_split_regex(lower(text), '[^a-z]+'),
                       x -> x <> ''), ' ') || ' ' AS stream
  FROM documents
),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT sc.doc_id, round(s, 4) AS score
FROM sc
JOIN hasall ON sc.doc_id = hasall.doc_id
JOIN norm ON sc.doc_id = norm.doc_id
WHERE contains(norm.stream, ' big data ')
ORDER BY round(s, 4) DESC, sc.doc_id
LIMIT 20
""",
)
def q125_bm25_phrase_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with AND + phrase semantics: docs must contain ALL of
    {big, data, vector} AND the consecutive phrase "big data" (checked on
    the normalized token stream, so punctuation can't break a match);
    scoring stays per-term BM25. Both constraints evaluate inside the
    tokenize-once projection — same zero-data-shuffle plan as q118, the
    filter just tightens. idf/avgdl remain corpus-wide (a filter narrows
    the result set, not the collection statistics), matching Lucene's
    treatment of filter clauses."""
    from datalakeingestionservice_spark.operators.text import bm25_rank

    env = Env(spark, sf_dir)
    return bm25_rank(
        env.t("documents"),
        ["big", "data", "vector"],
        require_all=True,
        phrase=["big", "data"],
        top_k=20,
    )


@register(
    "q126_bm25f_field_weights",
    tags=("text", "search", "bm25", "fields", "ranking"),
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS tt
  FROM documents
),
f AS (SELECT doc_id, tt, list_slice(tt, 1, 5) AS title FROM toks),
feat AS (
  SELECT doc_id,
         2.0 * len(title) + 1.0 * len(tt) AS dl,
         2.0 * len(list_filter(title, x -> x = 'spark'))
           + 1.0 * len(list_filter(tt, x -> x = 'spark')) AS tf0,
         2.0 * len(list_filter(title, x -> x = 'vector'))
           + 1.0 * len(list_filter(tt, x -> x = 'vector')) AS tf1
  FROM f
),
st AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS dft0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS dft1
  FROM feat
),
sc AS (
  SELECT doc_id,
         ln(1.0 + (n_docs - dft0 + 0.5) / (dft0 + 0.5))
           * (tf0 * (1.2 + 1))
           / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
       + ln(1.0 + (n_docs - dft1 + 0.5) / (dft1 + 0.5))
           * (tf1 * (1.2 + 1))
           / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
  FROM feat CROSS JOIN st
)
SELECT doc_id, round(s, 4) AS score
FROM sc
WHERE s > 0
ORDER BY round(s, 4) DESC, doc_id
LIMIT 20
""",
)
def q126_bm25f_field_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F-style weighted fields (Robertson's weighted concatenation): a
    synthetic title (the doc's first 5 tokens) at weight 2 plus the body at
    weight 1 share ONE length normalization — a title hit counts double
    without double-counting idf. The weighted tf/dl fold into the same
    tokenize-once projection and 1-row broadcast stats aggregate as q118;
    field weighting adds zero shuffles."""
    from datalakeingestionservice_spark.operators.text import bm25_rank

    env = Env(spark, sf_dir)
    wtoks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    docs = env.t("documents").withColumn(
        "title", F.array_join(F.slice(wtoks, 1, 5), " ")
    )
    return bm25_rank(
        docs,
        ["spark", "vector"],
        fields=[("title", 2.0), ("text", 1.0)],
        top_k=20,
    )


# ---------------------------------------------------------------------------
# q160 — winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
# the MOSS algorithm): positional k-gram rolling hashes -> per-window minima
# -> fingerprint-set overlap. The contamination/plagiarism detector that
# works at corpus scale because storage is ~2/(window+1) of the gram set.
# ---------------------------------------------------------------------------
@register(
    "q160_winnow_fingerprint_overlap",
    tags=("text", "dedup", "fingerprint", "winnowing"),
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+3], ' ') AS g
  FROM words, UNNEST(range(1, greatest(len(w) - 3, 1) + 1)) AS t(i)
),
hashed AS (
  SELECT doc_id, pos,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(g), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {_MINHASH_P} AS h
  FROM grams
),
mins AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM hashed
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM mins
  WHERE pos <= greatest(n - 5, 0) + 1
),
kept AS (
  SELECT doc_id, fp FROM fps
  WHERE fp NOT IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 50)
),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE)
             / (sa.n_fp + sb.n_fp - n_common), 4) AS overlap
FROM common c
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_fp + sb.n_fp - n_common) >= 0.5
ORDER BY doc_a, doc_b
""",
)
def q160_winnow_fingerprint_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WINNOWING (the MOSS fingerprinting algorithm): hash every
    positional 4-token gram with the portable sha256-derived family,
    keep each 5-gram window's MINIMUM, and score document pairs by
    Jaccard overlap of their fingerprint SETS through the same
    inverted-index join as q45 — with the same df>50 stop cut applied
    identically in the oracle. The winnowing guarantee makes this the
    scale answer for contamination detection: any shared run of at
    least window+k-1 = 8 tokens contributes a common fingerprint, at
    ~2/(window+1) = 1/3 the storage of the full gram set, and the pair
    join runs over the SAMPLED minima instead of every gram. The
    DuckDB oracle recomputes grams, hashes, window minima, the
    completeness cut, the frequency cut, and the overlap join — the
    full algorithm is value-checked, not just its output shape."""
    from datalakeingestionservice_spark.operators.dedup import (
        jaccard_pairs,
        winnow_fingerprints,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    fps = winnow_fingerprints(docs, k=4, window=5)
    sh = fps.select("doc_id", F.col("fp").alias("shingle"))
    ubiquitous = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > 50)
        .select("shingle")
    )
    kept = sh.join(ubiquitous, "shingle", "left_anti")
    pairs = jaccard_pairs(
        kept, id_col="doc_id", threshold=0.5, persist=True
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("overlap")
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# q162 — exact-substring duplicate spans (Lee et al. 2022, arXiv:2107.06499,
# the ExactSubstr family): the one dedup class shingle/MinHash/SimHash/
# winnowing only approximate — literal shared runs of >= L tokens, with
# maximal per-document boundaries. The oracle recomputes the WHOLE
# definition from raw text (grams -> corpus-wide multiplicity -> islands),
# so the value check covers the algorithm, not just its output shape.
# ---------------------------------------------------------------------------
_Q162_L = 20

@register(
    "q162_exact_substring_spans",
    tags=("text", "dedup", "exact-substring"),
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q162_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q162_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q162_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {_Q162_L - 1} AS span_end,
       max(pos) + {_Q162_L - 1} - min(pos) + 1 AS n_tokens
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
""",
)
def q162_exact_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-SUBSTRING dedup spans (Lee et al. 2022): every maximal
    run of >= 20 tokens whose exact text occurs at least twice in the
    corpus (across documents or self-repeated), reported with 1-based
    inclusive token boundaries. The paper builds a corpus-wide suffix
    array; the distributed formulation (`exact_substring_spans`) needs
    NO pairwise join: positional L-gram HASHES (tokens pre-hashed, 8
    bytes per position) feed one hash-keyed groupBy whose >=2 groups
    are the candidates, candidates alone rejoin their documents for a
    true-text collision screen, and a per-doc gaps-and-islands window
    merges consecutive starts into maximal spans. The only corpus-
    sized shuffle is the gram-hash groupBy (map-side partial counts);
    everything after runs on the duplicated fraction."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_spans,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    return exact_substring_spans(docs, min_len=_Q162_L).orderBy(
        "doc_id", "span_start"
    )


# ---------------------------------------------------------------------------
# q163 — exact-substring scrub: the removal half of q162 (scrub-all policy —
# every token covered by a duplicated >=L-token span is cut from EVERY
# occurrence). The oracle rebuilds every document's cleaned text from raw
# tokens, so the value check covers the rewrite, not just the span finder.
# ---------------------------------------------------------------------------
@register(
    "q163_exact_substring_scrub",
    tags=("text", "dedup", "exact-substring", "curation"),
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q162_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q162_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q162_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
cover AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q162_L - 1})) AS o
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
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       len(w.w) - coalesce(a.n_kept, 0) AS n_removed_tokens
FROM words w LEFT JOIN agg a USING (doc_id)
ORDER BY w.doc_id
""",
)
def q163_exact_substring_scrub(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-SUBSTRING SCRUB (`exact_substring_scrub`): remove every
    token covered by a >=20-token exactly-duplicated span from every
    document — the well-defined scrub-all curation policy (boilerplate
    and licence blocks vanish everywhere; Lee et al.'s keep-one-copy
    variant needs cross-occurrence span clustering, documented on the
    operator). Plan shape: the span set is candidate-sized, aggregates
    to one array per affected doc, joins back by id, and the token
    filter is a JVM-side exists() per token — one extra doc-keyed
    join over q162, no second corpus pass, no Python."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    return (
        exact_substring_scrub(docs, min_len=_Q162_L)
        .select(
            "doc_id",
            "clean_text",
            F.col("n_removed_tokens").cast("long").alias(
                "n_removed_tokens"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q166 — exact-substring KEEP-ONE-COPY removal (the Lee et al. policy the
# scrub-all variant q163 documents as needing cross-occurrence clustering):
# span occurrences cluster transitively by shared duplicated gram text, the
# first occurrence per cluster survives, every other is cut. The oracle
# recomputes the clustering with a recursive-CTE min-label propagation —
# the full algorithm (grams -> multiplicity -> islands -> star edges ->
# components -> keeper -> rebuild) is value-checked, not just its shape.
# ---------------------------------------------------------------------------
@register(
    "q166_exact_substring_keep_first",
    tags=("text", "dedup", "exact-substring", "graph", "curation"),
    oracle=f"""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q162_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q162_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q162_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
occ AS (SELECT doc_id, pos, g FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos, g,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM occ
),
spans AS (
  SELECT doc_id, grp, min(pos) AS span_start,
         max(pos) + {_Q162_L - 1} AS span_end
  FROM isl GROUP BY doc_id, grp
),
soc AS (
  SELECT DISTINCT i.g, s.doc_id, s.span_start, s.span_end,
         s.doc_id::VARCHAR || ':' || s.span_start::VARCHAR AS uid
  FROM isl i JOIN spans s ON i.doc_id = s.doc_id AND i.grp = s.grp
),
nodes AS (SELECT DISTINCT uid, doc_id, span_start, span_end FROM soc),
anchors AS (
  -- star center per gram: ANY deterministic member works (the star
  -- only carries connectivity; component membership is center-choice
  -- invariant) — plain string-min here, min-(doc,start) in the engine
  SELECT g, min(uid) AS a FROM soc GROUP BY g
),
star AS (
  SELECT DISTINCT s.uid AS x, a.a AS y
  FROM (SELECT DISTINCT g, uid FROM soc) s JOIN anchors a USING (g)
),
edges AS (SELECT x, y FROM star UNION SELECT y, x FROM star),
reach AS (
  SELECT uid AS node, uid AS label FROM nodes
  UNION
  SELECT e.y, r.label FROM reach r JOIN edges e ON e.x = r.node
),
comp AS (SELECT node, min(label) AS c FROM reach GROUP BY node),
ranked AS (
  -- keeper = FIRST occurrence by (doc id, span start), rank-1 per
  -- component (NB: min(x ORDER BY ...) would silently ignore the
  -- ordering — min is order-insensitive; the window rank is explicit)
  SELECT comp.c, n.doc_id, n.span_start, n.span_end,
         row_number() OVER (
           PARTITION BY comp.c ORDER BY n.doc_id, n.span_start
         ) AS rn
  FROM comp JOIN nodes n ON n.uid = comp.node
),
cut AS (
  SELECT doc_id, span_start, span_end FROM ranked WHERE rn > 1
),
cover AS (
  SELECT DISTINCT c.doc_id, u2.p
  FROM cut c
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(c.span_start, c.span_end)) AS p
  ) u2
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
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       len(w.w) - coalesce(a.n_kept, 0) AS n_removed_tokens
FROM words w LEFT JOIN agg a USING (doc_id)
ORDER BY w.doc_id
""",
)
def q166_exact_substring_keep_first(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KEEP-ONE-COPY exact-substring dedup
    (`exact_substring_keep_first`): duplicated >=20-token span
    occurrences cluster transitively by SHARED duplicated gram text —
    the construction that makes occurrences with DIFFERING maximal
    extents (doc A's longer span containing doc B's shorter maximal
    span) one cluster, where a naive keep-first over exact span text
    would keep both. Each cluster keeps its first occurrence (min
    (doc id, span start)); every other occurrence is cut whole. Star
    edges (span -> its gram's min span) keep the graph linear in
    occurrences — never the per-gram clique — and components run
    through the engine's hybrid min-label machinery. The DuckDB oracle
    recomputes the clustering with a recursive-CTE label propagation,
    so the transitive closure itself is value-checked."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_keep_first,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    return (
        exact_substring_keep_first(docs, min_len=_Q162_L)
        .select(
            "doc_id",
            "clean_text",
            F.col("n_removed_tokens").cast("long").alias(
                "n_removed_tokens"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q168 — normalized exact-substring spans: Lee et al.'s normalization knob.
# Matching runs over per-token lowercased/punct-stripped text; positions
# stay ORIGINAL (token-wise normalization is position-preserving). The
# oracle mirrors the normalization with DuckDB's regexp_replace('g').
# ---------------------------------------------------------------------------
@register(
    "q168_exact_substring_normalized",
    tags=("text", "dedup", "exact-substring", "normalization"),
    oracle=f"""
WITH words AS (
  SELECT doc_id,
         list_transform(
           string_split(text, ' '),
           t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '', 'g'))
         ) AS w
  FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q162_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q162_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q162_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {_Q162_L - 1} AS span_end,
       max(pos) + {_Q162_L - 1} - min(pos) + 1 AS n_tokens
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
""",
)
def q168_exact_substring_normalized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NORMALIZED exact-substring spans (`exact_substring_spans(
    normalize=True)`): duplicates that differ only in case or
    punctuation — retyped quotes, trailing commas, capitalization —
    match, because hashing AND the true-text collision screen run over
    per-token lowercased/alphanumeric-stripped tokens; reported
    positions (and any downstream scrub) stay on the ORIGINAL text,
    which token-wise normalization makes safe by construction (token
    count is invariant — there is no offset mapping to get wrong).
    Same no-pairwise plan as q162. The normalization class is plain
    ASCII in BOTH engines (Spark and DuckDB regexp_replace agree
    byte-for-byte), so the oracle recomputes the whole normalized
    definition."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_spans,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    return exact_substring_spans(
        docs, min_len=_Q162_L, normalize=True
    ).orderBy("doc_id", "span_start")


# ---------------------------------------------------------------------------
# q172 — exact-substring DECONTAMINATION (E99): the cross-corpus use of the
# ExactSubstr machinery — find every maximal train-corpus span whose exact
# text appears anywhere in the held-out split (the verbatim eval-leakage E1's
# n-gram decontamination only approximates). Corpus/held-out come from the
# q95 content-hash split, so the partition itself is engine-reproducible;
# the oracle recomputes split, grams, cross-corpus membership, and islands
# from raw text.
# ---------------------------------------------------------------------------
_Q172_L = 20

@register(
    "q172_exact_substring_decontamination",
    tags=("text", "dedup", "exact-substring", "decontamination", "curation"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, text,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS bucket16
  FROM documents
),
cw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 < 14
),
hw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 >= 14
),
cg AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q172_L - 1}], ' ') AS g
  FROM cw
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q172_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q172_L}
),
hg AS (
  SELECT DISTINCT array_to_string(w[u.i:u.i + {_Q172_L - 1}], ' ') AS g
  FROM hw
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q172_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q172_L}
),
hits AS (SELECT doc_id, pos FROM cg JOIN hg USING (g)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {_Q172_L - 1} AS span_end,
       max(pos) + {_Q172_L - 1} - min(pos) + 1 AS n_tokens
FROM isl
GROUP BY doc_id, grp
ORDER BY doc_id, span_start
""",
)
def q172_exact_substring_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contamination spans of the held-out split inside the train
    corpus: the q95 content-hash split carves documents 14/16 train+val
    vs 2/16 test, and `exact_substring_decontaminate_spans` reports
    every maximal >=20-token train-side run whose exact text occurs
    anywhere in the test side. Plan shape: both sides project gram
    HASHES, the corpus grams semi-join the held-out hash set (the one
    corpus-sized shuffle), the true-text screen runs on candidates only
    (held-side text computed only for hash-colliding positions), one
    per-doc window merges islands — never a pairwise join."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate_spans,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text").withColumn(
        "__b", b16
    )
    corpus = docs.filter(F.col("__b") < 14).drop("__b")
    heldout = docs.filter(F.col("__b") >= 14).drop("__b")
    return exact_substring_decontaminate_spans(
        corpus, heldout, min_len=_Q172_L
    ).orderBy("doc_id", "span_start")


# ---------------------------------------------------------------------------
# q191 — FUZZY decontamination vs the held-out split (E119): the near-dup
# complement of q172's verbatim pass — corpus docs whose n-gram Jaccard
# against ANY held-out doc reaches the threshold, candidates via the seeded
# MinHash LSH banding family (engine-portable sha256-derived hashes, the
# q46 machinery applied CROSS-corpus). Reworded eval leakage that no
# exact-substring scan can see. Oracle recomputes split, shingles,
# signatures, bands, candidates, and exact Jaccard from raw text.
# ---------------------------------------------------------------------------
_Q191_SIM = 0.4

@register(
    "q191_minhash_decontamination",
    tags=("text", "dedup", "lsh", "decontamination", "curation"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, text,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS bucket16
  FROM documents
),
cwords AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 < 14
),
hwords AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 >= 14
),
cshingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cwords WHERE len(w) >= 3
  )
),
hshingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM hwords WHERE len(w) >= 3
  )
),
chashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {_MINHASH_P} AS h
  FROM cshingles
),
hhashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {_MINHASH_P} AS h
  FROM hshingles
),
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
cand AS (
  SELECT DISTINCT c.doc_id AS cid, h.doc_id AS hid
  FROM cbands c JOIN hbands h
    ON c.band = h.band AND c.sig = h.sig
),
csizes AS (SELECT doc_id, count(*) AS n_sh FROM cshingles GROUP BY doc_id),
hsizes AS (SELECT doc_id, count(*) AS n_sh FROM hshingles GROUP BY doc_id),
pair_common AS (
  SELECT p.cid, p.hid, count(*) AS n_common
  FROM cand p
  JOIN cshingles a ON a.doc_id = p.cid
  JOIN hshingles b ON b.doc_id = p.hid AND b.shingle = a.shingle
  GROUP BY p.cid, p.hid
)
SELECT cid AS doc_id, hid AS heldout_id,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4)
         AS jaccard_sim
FROM pair_common p
JOIN csizes sa ON p.cid = sa.doc_id
JOIN hsizes sb ON p.hid = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
      >= {_Q191_SIM}
ORDER BY doc_id, heldout_id
""",
)
def q191_minhash_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy contamination pairs across the q95 content-hash split:
    corpus (buckets 0-13) docs near-duplicating held-out (14-15) docs
    at 3-gram Jaccard >= 0.4, found by cross-corpus MinHash LSH. The
    held-out side broadcasts (banded signatures AND shingle sets); the
    corpus pays one shingle projection + one signature aggregate, and
    exact-Jaccard verification touches candidate docs only. The
    doc-level scrub (`minhash_decontaminate`) anti-joins these ids;
    its survivor-count invariant is pinned in pytest."""
    from datalakeingestionservice_spark.operators.dedup import (
        minhash_contamination_pairs,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text").withColumn(
        "__b", b16
    )
    corpus = docs.filter(F.col("__b") < 14).drop("__b")
    heldout = docs.filter(F.col("__b") >= 14).drop("__b")
    pairs = minhash_contamination_pairs(
        corpus, heldout, n=3, num_hashes=_MH_K, bands=_MH_BANDS,
        min_sim=_Q191_SIM, seed=_MH_SEED,
    )
    return pairs.select(
        "doc_id", "heldout_id",
        F.round("jaccard_sim", 4).alias("jaccard_sim"),
    ).orderBy("doc_id", "heldout_id")


# ---------------------------------------------------------------------------
# q209 — fuzzy decontamination with the STOP-BUCKET cut (r14, VERDICT r13
# #2): q191's cross-corpus MinHash banding with over-dense (band, sig)
# buckets dropped before the candidate join — the band-bucket analog of
# q45's stop-shingle df cut. Dense buckets are boilerplate signatures;
# each contributes |bucket|² candidate verifications, the measured
# super-linear term in q195's fuzzy stage at 10× volume. Cutting them is
# a DETECTION-SEMANTICS change (a doc whose every matching band is
# boilerplate-dense escapes), so the threshold lives in the oracle too:
# DuckDB recomputes bands, the heavy-bucket set (HAVING count > K), the
# cut, candidates, and exact Jaccard. The threshold here is deliberately
# LOW (1) so the cut ENGAGES at oracle scale — proving the mirror bites,
# not just parses; q195 runs the same code path with the scale-tuned
# threshold (16, where toy-SF buckets never reach it and density at
# sf1/sf10 does — PERF.md r14).
# ---------------------------------------------------------------------------
_Q209_MAXBF = 1

@register(
    "q209_minhash_decontamination_stop_buckets",
    tags=("text", "dedup", "lsh", "decontamination", "curation"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, text,
         strpos('0123456789abcdef', substr(sha256(lower(trim(text))), 1, 1)) - 1
           AS bucket16
  FROM documents
),
cwords AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 < 14
),
hwords AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM assigned
  WHERE bucket16 >= 14
),
cshingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM cwords WHERE len(w) >= 3
  )
),
hshingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))) AS shingle
    FROM hwords WHERE len(w) >= 3
  )
),
chashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {{_MINHASH_P}} AS h
  FROM cshingles
),
hhashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9),
           i -> (strpos('0123456789abcdef', substr(sha256(shingle), i, 1)) - 1)
                * (1::BIGINT << ((8 - i) * 4)))) AS BIGINT)
           % {{_MINHASH_P}} AS h
  FROM hshingles
),
csigs AS (
  SELECT doc_id,
         {{_MH_SIG_COLS}}
  FROM chashed GROUP BY doc_id
),
hsigs AS (
  SELECT doc_id,
         {{_MH_SIG_COLS}}
  FROM hhashed GROUP BY doc_id
),
cbands AS (
  {{_MH_BAND_SELECTS_C}}
),
hbands AS (
  {{_MH_BAND_SELECTS_H}}
),
cheavy AS (
  SELECT band, sig FROM cbands
  GROUP BY band, sig HAVING count(*) > {_Q209_MAXBF}
),
ckept AS (
  SELECT c.* FROM cbands c
  WHERE NOT EXISTS (
    SELECT 1 FROM cheavy x WHERE x.band = c.band AND x.sig = c.sig
  )
),
cand AS (
  SELECT DISTINCT c.doc_id AS cid, h.doc_id AS hid
  FROM ckept c JOIN hbands h
    ON c.band = h.band AND c.sig = h.sig
),
csizes AS (SELECT doc_id, count(*) AS n_sh FROM cshingles GROUP BY doc_id),
hsizes AS (SELECT doc_id, count(*) AS n_sh FROM hshingles GROUP BY doc_id),
pair_common AS (
  SELECT p.cid, p.hid, count(*) AS n_common
  FROM cand p
  JOIN cshingles a ON a.doc_id = p.cid
  JOIN hshingles b ON b.doc_id = p.hid AND b.shingle = a.shingle
  GROUP BY p.cid, p.hid
)
SELECT cid AS doc_id, hid AS heldout_id,
       round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4)
         AS jaccard_sim
FROM pair_common p
JOIN csizes sa ON p.cid = sa.doc_id
JOIN hsizes sb ON p.hid = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
      >= {{_Q191_SIM}}
ORDER BY doc_id, heldout_id
""".format(
        _MINHASH_P=_MINHASH_P,
        _MH_SIG_COLS=_MH_SIG_COLS,
        _MH_BAND_SELECTS_C=_MH_BAND_SELECTS.replace("FROM sigs", "FROM csigs"),
        _MH_BAND_SELECTS_H=_MH_BAND_SELECTS.replace("FROM sigs", "FROM hsigs"),
        _Q191_SIM=_Q191_SIM,
    ),
)
def q209_minhash_decontamination_stop_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q191's fuzzy contamination pairs with over-dense corpus band
    buckets cut (`max_band_freq=1` — low on purpose, so the cut
    engages at oracle scale and the mirrored HAVING threshold is
    PROVEN, not assumed). Plan shape unchanged: the heavy-bucket list
    is a map-side-combined groupBy broadcast into an anti-join —
    no new corpus-sized shuffle; candidate verification then pays
    only surviving buckets' pairs."""
    from datalakeingestionservice_spark.operators.dedup import (
        minhash_contamination_pairs,
    )

    env = Env(spark, sf_dir)
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    docs = env.t("documents").select("doc_id", "text").withColumn(
        "__b", b16
    )
    corpus = docs.filter(F.col("__b") < 14).drop("__b")
    heldout = docs.filter(F.col("__b") >= 14).drop("__b")
    pairs = minhash_contamination_pairs(
        corpus, heldout, n=3, num_hashes=_MH_K, bands=_MH_BANDS,
        min_sim=_Q191_SIM, seed=_MH_SEED, max_band_freq=_Q209_MAXBF,
    )
    return pairs.select(
        "doc_id", "heldout_id",
        F.round("jaccard_sim", 4).alias("jaccard_sim"),
    ).orderBy("doc_id", "heldout_id")


# ---------------------------------------------------------------------------
# q199 — INCREMENTALLY-MAINTAINED BM25 INDEX from the change feed (E128,
# r12): the text twin of the IVF index (q182). bm25_rank recomputes
# corpus statistics per query — the right shape ad-hoc, the wrong one
# for a 100 TB corpus under streaming ingest. Here per-term document
# frequencies, per-(term,doc) term frequencies (+ denormalized doc
# lengths), and the corpus scalars are MAINTAINED versioned state fed
# by the documents table's CDC: updates unwind their OLD text's
# postings (the feed carries it — no index lookup), df hits zero drop
# the term row, zero-token docs still count in N. ONE incremental
# refresh (∝ |Δ|, no corpus rescan — spy-pinned in
# tests/test_bm25_index.py) then serving reads ONLY term-pruned
# postings. The oracle recomputes BM25 over the mutated corpus from
# scratch in DuckDB.
# ---------------------------------------------------------------------------
@register(
    "q199_incremental_bm25_index",
    tags=("text", "search", "bm25", "incremental-view", "cdf"),
    oracle="""
WITH docs1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN 'spark streams quickly ' || text
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 1
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text || ' vector vector' AS text
  FROM documents WHERE doc_id % 10 = 2
),
tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM docs1
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM docs1
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'vector', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score
FROM sc
ORDER BY round(s, 4) DESC, doc_id
LIMIT 20
""",
)
def q199_incremental_bm25_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BM25 index maintained from DML, then served: copy documents
    into a versioned table, bootstrap the index, mutate the corpus
    (prefix every %10=0 text with query terms — tf/dl/df all move;
    delete %10=1 — dfs decrement, terms can die; insert %10=2 clones
    under new ids with extra 'vector' tokens), ONE incremental
    refresh, and rank {spark, vector, stream} from the MAINTAINED
    postings — same formula, same 4dp-then-rank ordering as the
    bm25_rank recompute (q118)."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_bm25idx_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    src = VersionedTable.create(spark, os.path.join(base, "docs"), docs)
    idx = IncrementalBM25Index(
        spark, src.root, os.path.join(base, "idx")
    )
    assert idx.refresh() == 1  # bootstrap at v1

    clones = docs.filter(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" vector vector")).alias("text"),
    )
    src.update_where(
        F.col("doc_id") % 10 == 0,
        {"text": F.concat(F.lit("spark streams quickly "), F.col("text"))},
    )
    src.delete_where(F.col("doc_id") % 10 == 1)
    src.append(clones)
    assert idx.refresh() == 4  # ONE incremental refresh drains all 3
    assert idx.refresh() is None  # idempotent

    return idx.rank(["spark", "vector", "stream"], top_k=20)


# ---------------------------------------------------------------------------
# q201 — the SEARCH INDEX statement surface (r12): the E129 maintained
# BM25 index driven entirely through SQL text — CREATE SEARCH INDEX
# bootstraps + persists _bm25.json, DML statements mutate the corpus,
# ONE REFRESH SEARCH INDEX drains the feed, and SEARCH ... FOR ...
# REQUIRE ALL serves AND-semantics ranking from the maintained
# postings. Oracle recomputes AND-filtered BM25 over the mutated
# corpus in DuckDB.
# ---------------------------------------------------------------------------
@register(
    "q201_search_index_statements",
    tags=("text", "search", "bm25", "sql", "incremental-view", "cdf"),
    oracle="""
WITH docs1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' shared spark stream'
              ELSE text END AS text
  FROM documents WHERE doc_id % 9 <> 4
),
tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM docs1
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM docs1
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s,
         count(*) AS nt
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score
FROM sc WHERE nt = 2
ORDER BY round(s, 4) DESC, doc_id
LIMIT 15
""",
)
def q201_search_index_statements(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE SEARCH INDEX -> UPDATE/DELETE statements -> REFRESH
    SEARCH INDEX -> SEARCH ... FOR 'spark stream' TOP 15 REQUIRE ALL,
    all through execute_sql."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_sidx_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    src = VersionedTable.create(
        spark,
        os.path.join(base, "docs"),
        env.t("documents").select("doc_id", "text"),
    )
    tables = {"docs": src}
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX docs_fts ON docs (doc_id, text) "
        f"LOCATION '{os.path.join(base, 'idx')}'",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE docs SET text = concat(text, ' shared spark stream') "
        "WHERE doc_id % 7 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM docs WHERE doc_id % 9 = 4", tables)
    execute_sql(spark, "REFRESH SEARCH INDEX docs_fts", tables)
    return execute_sql(
        spark,
        "SEARCH docs_fts FOR 'spark stream' TOP 15 REQUIRE ALL",
        tables,
    )


# ---------------------------------------------------------------------------
# q202 — MAINTAINED BM25 INDEX SERVES LIKE AN INDEX (r13): the serving
# half of E129 under the plan audit. postings/ and terms/ are laid out
# `bucket(16, term)` (hidden partitioning), and rank() plans its scan
# through `read(predicates=[("term", "in", terms)])` — so a SEARCH
# derives LEAF pruning from its term list and scans ~|terms|/16 of the
# index instead of all of it, the query-side twin of refresh ∝ |Δ|.
# The ranking itself sits behind the oracle (DuckDB recomputes BM25
# over the mutated corpus); the pruning facts ride as boolean columns
# computed from the SAME prune_info the planner uses (the q129/q137
# pattern — the oracle can't hash buckets, so it pins TRUE):
#   search_pruned_ok  — more postings leaves skipped than scanned
#   scan_minority_ok  — a 3-term SEARCH plans a strict-minority scan
# ---------------------------------------------------------------------------
@register(
    "q202_bm25_index_serving_prune",
    tags=("text", "search", "bm25", "lake", "data-skipping"),
    oracle="""
WITH docs1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN 'spark streams quickly ' || text
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 1
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text || ' vector vector' AS text
  FROM documents WHERE doc_id % 10 = 2
),
tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM docs1
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM docs1
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'vector', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score,
       TRUE AS search_pruned_ok, TRUE AS scan_minority_ok
FROM sc
ORDER BY round(s, 4) DESC, doc_id
LIMIT 20
""",
)
def q202_bm25_index_serving_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q199's maintain-then-serve pipeline with the serving PLAN under
    test: bootstrap the bucketed index, mutate the corpus (update /
    delete / insert), ONE incremental refresh, then rank {spark,
    vector, stream} — and pin, from the same prune_info the pruned
    read plans with, that the SEARCH skipped more postings leaves than
    it scanned and scanned a strict minority of the index."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_bm25prune_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    src = VersionedTable.create(spark, os.path.join(base, "docs"), docs)
    idx = IncrementalBM25Index(
        spark, src.root, os.path.join(base, "idx"), buckets=16
    )
    idx.refresh()

    clones = docs.filter(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" vector vector")).alias("text"),
    )
    src.update_where(
        F.col("doc_id") % 10 == 0,
        {"text": F.concat(F.lit("spark streams quickly "), F.col("text"))},
    )
    src.delete_where(F.col("doc_id") % 10 == 1)
    src.append(clones)
    idx.refresh()

    terms = ["spark", "vector", "stream"]
    info = idx.serving_prune_info(terms)
    total = info["n_scanned"] + info["n_skipped"]
    return idx.rank(terms, top_k=20).select(
        "doc_id",
        "score",
        F.lit(
            info["n_skipped"] > info["n_scanned"] > 0
        ).alias("search_pruned_ok"),
        F.lit(info["n_scanned"] * 2 < total).alias("scan_minority_ok"),
    )


# ---------------------------------------------------------------------------
# q205 — SEARCH composes with SQL in ONE statement (r13): the
# `search_index('<idx>', '<terms>' [, k])` table function in FROM
# position — the hits table (doc_id, score) of the MAINTAINED BM25
# index joins straight back to its documents and filters, where the
# standalone SEARCH statement needed a second step. The full life
# cycle stays statement-shaped: CREATE SEARCH INDEX (bucketed) → DML
# on the corpus → REFRESH → one SELECT joining the top-k hits to the
# mutated documents with a WHERE over the joined row. Oracle
# recomputes BM25 over the mutated corpus, cuts the SAME top-25 (4dp
# score, doc_id ties), then joins + filters identically.
# ---------------------------------------------------------------------------
@register(
    "q205_search_index_tvf_join",
    tags=("text", "search", "bm25", "sql", "incremental-view"),
    oracle="""
WITH docs1 AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 6 = 0
              THEN text || ' shared spark stream'
              ELSE text END AS text
  FROM documents WHERE doc_id % 9 <> 5
),
tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM docs1
  ) WHERE t <> ''
),
dl AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '')) AS dl
  FROM docs1
),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
),
hits AS (
  SELECT doc_id, round(s, 4) AS score FROM sc
  ORDER BY round(s, 4) DESC, doc_id
  LIMIT 25
)
SELECT h.doc_id AS doc_id, d.lang AS lang, h.score AS score
FROM hits h JOIN docs1 d USING (doc_id)
WHERE d.lang <> 'de'
ORDER BY h.score DESC, h.doc_id
""",
)
def q205_search_index_tvf_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE SEARCH INDEX ... BUCKETS 8 -> DML -> REFRESH -> ONE
    SELECT: FROM search_index('fts', 'spark stream', 25) h JOIN docs d
    ON h.doc_id = d.doc_id WHERE d.lang <> 'de'."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_tvf_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    src = VersionedTable.create(
        spark,
        os.path.join(base, "docs"),
        env.t("documents").select("doc_id", "text", "lang"),
    )
    tables = {"docs": src}
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX fts ON docs (doc_id, text) "
        f"LOCATION '{os.path.join(base, 'idx')}' BUCKETS 8",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE docs SET text = concat(text, ' shared spark stream') "
        "WHERE doc_id % 6 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM docs WHERE doc_id % 9 = 5", tables)
    execute_sql(spark, "REFRESH SEARCH INDEX fts", tables)
    return execute_sql(
        spark,
        "SELECT d.doc_id AS doc_id, d.lang AS lang, h.score AS score "
        "FROM search_index('fts', 'spark stream', 25) h "
        "JOIN docs d ON h.doc_id = d.doc_id "
        "WHERE d.lang <> 'de' "
        "ORDER BY h.score DESC, h.doc_id",
        tables,
    )


# ---------------------------------------------------------------------------
# q206 — PHRASE SEARCH FROM THE MAINTAINED INDEX (r13): positional
# postings (CREATE ... WITH POSITIONS) make `SEARCH idx FOR '"exact
# phrase"'` index-servable — each posting keeps the term's sorted
# token offsets, and adjacency is the classic positional-index check
# (fold array_intersect over offsets shifted by phrase position).
# Scoring stays per-term BM25, exactly `bm25_rank(phrase=)`. DML
# plants the phrase in some docs ("shared spark stream" suffix) and
# removes others before ONE refresh. Oracle recomputes per-term BM25
# over the mutated corpus and applies the phrase constraint on the
# same normalized token stream (space-padded substring match).
# ---------------------------------------------------------------------------
@register(
    "q206_phrase_search_positional_index",
    tags=("text", "search", "bm25", "phrase", "sql", "incremental-view"),
    oracle="""
WITH docs1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' shared spark stream'
              ELSE text END AS text
  FROM documents WHERE doc_id % 9 <> 4
),
norm AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS toks
  FROM docs1
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM norm
),
dl AS (SELECT doc_id, len(toks) AS dl FROM norm),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('spark', 'stream')
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
phrased AS (
  SELECT doc_id FROM norm
  WHERE ' ' || array_to_string(toks, ' ') || ' '
        LIKE '% spark stream %'
),
sc AS (
  SELECT tf.doc_id,
         sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ) AS s
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
)
SELECT sc.doc_id AS doc_id, round(s, 4) AS score
FROM sc JOIN phrased USING (doc_id)
ORDER BY round(s, 4) DESC, sc.doc_id
LIMIT 15
""",
)
def q206_phrase_search_positional_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE SEARCH INDEX ... WITH POSITIONS -> DML -> REFRESH ->
    SEARCH idx FOR '"spark stream"' TOP 15, all through execute_sql."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_phr_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    src = VersionedTable.create(
        spark,
        os.path.join(base, "docs"),
        env.t("documents").select("doc_id", "text"),
    )
    tables = {"docs": src}
    execute_sql(
        spark,
        f"CREATE SEARCH INDEX pfts ON docs (doc_id, text) "
        f"LOCATION '{os.path.join(base, 'idx')}' BUCKETS 8 "
        f"WITH POSITIONS",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE docs SET text = concat(text, ' shared spark stream') "
        "WHERE doc_id % 7 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM docs WHERE doc_id % 9 = 4", tables)
    execute_sql(spark, "REFRESH SEARCH INDEX pfts", tables)
    return execute_sql(
        spark,
        "SEARCH pfts FOR '\"spark stream\"' TOP 15",
        tables,
    )
