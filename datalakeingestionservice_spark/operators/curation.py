"""Corpus-curation operators for LLM training-data pipelines.

The reference stops at row-level cleansing (its transformation fold,
`src/Infrastructure/Transformation/TransformationEngine.cs:21-69`); a
lake-scale training pipeline adds corpus-LEVEL curation stages on top:
benchmark decontamination, deterministic stratified sampling, per-group
quality filtering, token-budget sequence packing, and repetition filters
(Gopher-style, Rae et al. 2021). Every operator here is pure DataFrame —
no Python in hot paths, no driver-side data — so each one scales with
executors, not with the driver.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.dedup import word_shingles

#: 2^32 — denominator turning a 8-hex-digit prefix into an exact dyadic
#: fraction in [0, 1). Exactly representable as a double in BOTH engines,
#: so cross-engine comparisons against it are bit-identical.
_HASH_DENOM = 4294967296.0


def hash_fraction(key: Column) -> Column:
    """Deterministic uniform fraction in [0, 1) from a key column.

    sha256's first 8 hex digits -> 32-bit int / 2^32. Content-keyed, so the
    decision survives reshuffles, re-ingestion, and corpus growth — the
    property that makes sampling reproducible at 100 TB (rand() is neither
    reproducible across runs nor stable under repartitioning).
    """
    return (
        F.conv(F.substring(F.sha2(key, 256), 1, 8), 16, 10).cast("double")
        / F.lit(_HASH_DENOM)
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop training docs sharing ANY n-word shingle with a benchmark set.

    The eval-set leakage guard of every serious training corpus. Plan shape:
    shingle both sides (explode, executor-side), semi-join train shingles
    against the benchmark shingle set to find contaminated ids, anti-join
    those ids back onto the full rows. Benchmark sets are tiny relative to
    the corpus (MBs vs TBs), so the shingle set broadcasts and the scan-side
    semi-join never shuffles the corpus; the final anti-join shuffles ids
    only, never text payloads.
    """
    # per_doc_dedup: each side feeds exactly one consumer (the
    # semi-join / the broadcast set) — no exchange to amortize
    t_sh = word_shingles(
        train, id_col, text_col, n=n, per_doc_dedup=True
    )
    b_sh = word_shingles(
        benchmark, id_col, text_col, n=n, per_doc_dedup=True
    ).select("shingle").distinct()
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    contaminated = (
        t_sh.join(b_sh, "shingle", "left_semi").select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key: Column,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its content-hash
    fraction falls under its stratum's rate.

    The language/source-rebalancing stage of corpus assembly (e.g. keep 50%
    of English, 25% of everything else). Unlike `df.sampleBy`, the decision
    is a pure function of content — reproducible across runs, clusters, and
    partitionings, and duplicate texts always get the same verdict. No
    shuffle at all: a scan-side filter.
    """
    rate_expr: Column = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(strata_col) == stratum, F.lit(float(rate))
        ).otherwise(rate_expr)
    return df.filter(hash_fraction(key) < rate_expr)


def quality_top_p(
    df: DataFrame,
    group_col: str,
    score_col: str,
    p: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top-p fraction of rows per group by score.

    The per-language quality cut of a training pipeline ("best 30% of each
    language by model/heuristic score"). Total order (score desc, id asc)
    makes the cut deterministic under ties; cume_dist <= p keeps exactly
    floor(p * group_size) rows. One shuffle on the group key; at 100 TB the
    window sorts within language partitions — for pathological single-group
    skew, pre-aggregate an approx score threshold per group instead.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__cd", F.cume_dist().over(w))
        .filter(F.col("__cd") <= p)
        .drop("__cd")
    )


def pack_sequences(
    df: DataFrame,
    part_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign docs to fixed-token-budget bins (context-window packing).

    Offset packing: within each partition, docs in id order; a doc joins the
    bin its cumulative START offset falls into (`floor(offset / budget)`).
    Bins may overflow by at most one doc — the streaming-friendly relaxation
    of greedy packing that is expressible as ONE window (a single shuffle on
    the partition column), with no sequential dependence between bins. For
    exact greedy semantics (never exceed budget) see
    :func:`pack_sequences_greedy`.

    Returns the input plus `bin_id` and `bin_offset` (start offset within the
    partition's token stream).
    """
    w = Window.partitionBy(part_col).orderBy(F.col(id_col).asc())
    offset = F.sum(token_col).over(w) - F.col(token_col)
    return df.select(
        "*",
        offset.alias("bin_offset"),
        F.floor(offset / F.lit(budget)).cast("bigint").alias("bin_id"),
    )


def pack_sequences_greedy(
    df: DataFrame,
    part_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Exact greedy packing: a doc that would overflow the current bin starts
    a new one, so no bin exceeds `budget` (docs longer than the budget get a
    bin of their own).

    Greedy packing is inherently sequential WITHIN a partition, so it runs as
    `applyInPandas` per partition key — partitions pack in parallel, Arrow
    moves columnar batches, and nothing touches the driver. Use when bins
    feed fixed-size context windows that must never overflow; use
    :func:`pack_sequences` when the one-doc overflow relaxation is acceptable
    and a pure-window plan is preferred.
    """
    import pandas as pd

    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        + ", bin_id bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, cur_bin, cur_tokens = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if cur_tokens > 0 and cur_tokens + t > budget:
                cur_bin += 1
                cur_tokens = 0
            bins.append(cur_bin)
            cur_tokens += t
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(part_col).applyInPandas(pack, schema=schema)


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signals (Gopher-style, Rae et al. 2021 table A1):

    - `top_token_ratio`: most-frequent-token count / token count — catches
      "the the the ..." degeneracy.
    - `dup_bigram_frac`: 1 - distinct bigrams / total bigrams — catches
      looping phrase repetition.

    Token counting goes through explode + two hash aggregations (shuffle
    carries (doc_id, token) pairs, never full texts); the bigram fraction is
    a pure array expression evaluated in codegen at scan time. Join back is
    on doc_id only.
    """
    words = F.split(F.col(text_col), " ")
    bigrams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, 2)))"
    )
    # Guard on token count, not on the bigram array: sequence(1, 0) is a
    # DESCENDING [1, 0] in Spark and slice(start=0) then errors at runtime.
    base = df.select(
        id_col,
        F.size(words).alias("n_tokens"),
        F.when(
            F.size(words) > 1,
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double")
            / F.size(bigrams),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )
    tok_counts = (
        df.select(id_col, F.explode(words).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_token_count"))
    )
    return base.join(tok_counts, id_col).select(
        id_col,
        "n_tokens",
        "top_token_count",
        (F.col("top_token_count").cast("double") / F.col("n_tokens")).alias(
            "top_token_ratio"
        ),
        "dup_bigram_frac",
    )


#: PII patterns shared by the Spark operator and its DuckDB oracle —
#: plain character classes + quantifiers only, so Java regex (Spark) and
#: RE2 (DuckDB) agree character-for-character. Order matters: emails
#: redact first, then SSNs (\d3-\d2-\d4), then phones (\d3-\d3-\d4) —
#: SSN/phone-shaped runs inside an email are consumed by the email
#: stage (counts are staged accordingly in `scrub_pii`).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN = r"\d{3}-\d{2}-\d{4}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """PII redaction for training-data curation (the Dolma/C4-style
    tagger step): emails, US SSNs, and US phone numbers redact in
    sequence, appending `{text_col}_scrubbed`, `n_emails`, `n_ssns`,
    `n_phones`, `n_redactions`. Each count is taken on the text AS THE
    PREVIOUS STAGE LEFT IT, so the counts equal the replacements
    actually applied — a phone-shaped digit run INSIDE an email address
    (`555-123-4567@corp.example.com`) is consumed by the email redaction
    and never double-counted as a phone (the replacement token contains
    no digits or '@', so redaction can't mint new matches either). Pure
    JVM `regexp_count`/`regexp_replace` projections — zero shuffles,
    zero Python; at 100 TB this is a map-only pass that pipelines into
    the surrounding quality filters.

    Reference anchor: the closest reference behavior is the masking
    step (`DataMasking`, SURVEY §2A A23) which blanks whole columns;
    this is the content-level equivalent for free text."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, replacement)
    after_ssn = F.regexp_replace(after_email, PII_SSN, replacement)
    scrubbed = F.regexp_replace(after_ssn, PII_PHONE, replacement)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ssns = F.regexp_count(after_email, F.lit(PII_SSN))
    n_phones = F.regexp_count(after_ssn, F.lit(PII_PHONE))
    return df.select(
        "*",
        scrubbed.alias(f"{text_col}_scrubbed"),
        n_emails.alias("n_emails"),
        n_ssns.alias("n_ssns"),
        n_phones.alias("n_phones"),
        (n_emails + n_ssns + n_phones).alias("n_redactions"),
    )
