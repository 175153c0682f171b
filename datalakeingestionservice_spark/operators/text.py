"""Text-analysis operators (SURVEY.md C5): token stats, quality scoring,
language-ID features — all built-in column expressions (no UDFs).

The expression builders return Columns so callers compose them into a single
select (one codegen stage) rather than stacking withColumn projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def words(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def bm25_tokens(col) -> Column:
    """The BM25 normalization shared by :func:`bm25_rank` and the
    incremental index (`sinks/bm25_index.py`): lowercase, split on
    non-letters, drop empties. ONE definition so the maintained index
    and the full-recompute ranker can never tokenize differently."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z]+"), lambda t: t != "")


def n_tokens(text_col: str = "text") -> Column:
    return F.size(words(text_col))


def stopword_count(text_col: str = "text", stopwords=STOPWORDS) -> Column:
    stop_array = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(f"size(filter(split({text_col}, ' '), w -> w IN ({stop_array})))")


def stopword_ratio(text_col: str = "text", stopwords=STOPWORDS) -> Column:
    return stopword_count(text_col, stopwords).cast("double") / n_tokens(text_col)


def lexical_diversity(text_col: str = "text") -> Column:
    """distinct tokens / tokens — crude type-token ratio."""
    return F.size(F.array_distinct(words(text_col))).cast("double") / n_tokens(
        text_col
    )


def avg_token_len(text_col: str = "text") -> Column:
    return F.length(
        F.regexp_replace(F.col(text_col), " ", "")
    ).cast("double") / n_tokens(text_col)


def quality_score(text_col: str = "text") -> Column:
    """Composite [0,1] quality signal: length, stopword presence, diversity —
    the filter stage of a training-data pipeline."""
    return (
        0.4 * F.least(n_tokens(text_col) / 50.0, F.lit(1.0))
        + 0.3 * F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
        + 0.3 * lexical_diversity(text_col)
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation op of an LLM data pipeline.

    One row per chunk: (id, chunk_idx, chunk_text, n_chunk_tokens). Stride =
    chunk_tokens - overlap_tokens; the final partial chunk is kept. Pure
    higher-order array expressions (sequence + slice + explode): fan-out
    happens executor-side with no Python, so a 100 TB corpus chunks at scan
    speed.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    # Chunk start positions: 1, 1+stride, ... while start <= max(n - overlap, 1)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap_tokens), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(w, s, chunk_tokens)),
    )
    exploded = df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.size(F.split("chunk_text", " ")).alias("n_chunk_tokens"),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        id_col,
        n_tokens(text_col).alias("n_tokens"),
        F.length(text_col).alias("len_chars"),
        F.round(avg_token_len(text_col), 4).alias("avg_token_len"),
        F.size(F.array_distinct(words(text_col))).alias("n_unique_tokens"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    require_all: bool = False,
    phrase: list[str] | None = None,
    fields: list[tuple[str, float]] | None = None,
) -> DataFrame:
    """Okapi BM25 relevance ranking of documents against a bag of query
    terms (Lucene's idf variant: ln(1 + (N - df + .5)/(df + .5))).

    Retrieval semantics (all composable, all inside the tokenize-once
    projection — no extra scan or shuffle):

    - `require_all=True`: AND semantics — a doc must contain EVERY query
      term (default is the classic OR: any match scores).
    - `phrase=[t1, t2, ...]`: the doc's PRIMARY field must contain the
      terms consecutively (checked on the normalized token stream, so
      punctuation/case can't break a match). Constraint only — scoring
      stays per-term BM25, like a `"phrase"` filter over a bag query.
    - `fields=[(col, weight), ...]`: BM25F-style weighted-field scoring
      (Robertson's weighted concatenation): tf_i = Σ_f w_f·tf_{f,i} and
      dl = Σ_f w_f·len_f share one length normalization, so a hit in a
      weight-3 title counts triple without triple-counting idf. The first
      field is the primary one for `phrase`. Default: [(text_col, 1.0)].

    Scale shape: NO data-sized shuffle at all. The query bag is a small
    known list, so per-term tf becomes |query| counter columns in a
    tokenize-once projection (no explode, no per-doc groupBy, no
    doc-length join); corpus constants (N, avgdl) and every per-term
    document frequency collapse into ONE 1-row aggregate (map-side
    partial) that comes back via broadcast crossJoin. Two column-pruned
    scans of the corpus remain (stats + scoring) — cheaper at scale than
    materializing the tokenized projection. The only
    ordering work is top-k through TakeOrderedAndProject (per-partition
    heaps, no global sort). Scores are rounded to 4dp BEFORE ranking so
    ordering is reproducible cross-engine. A doc scores only if it matches
    >= 1 term (unmatched terms contribute exactly 0), matching the
    inner-join semantics of the classic explode formulation.
    """
    from pyspark.sql.functions import broadcast

    terms = list(dict.fromkeys(query_terms))  # dedup: no double-counting
    field_specs = list(fields) if fields else [(text_col, 1.0)]

    tok_arrs = [bm25_tokens(c) for c, _ in field_specs]
    dl = None
    for arr, (_, w) in zip(tok_arrs, field_specs):
        piece = F.lit(w) * F.size(arr)
        dl = piece if dl is None else dl + piece
    proj = [F.col(id_col), dl.alias("dl")]
    # NB: single-arg lambda only — a second (defaulted) parameter makes
    # PySpark pick filter's (element, index) variant. The loop variable
    # is safe to close over: F.filter evaluates the lambda eagerly.
    for i, term in enumerate(terms):
        tf = None
        for arr, (_, w) in zip(tok_arrs, field_specs):
            piece = F.lit(w) * F.size(
                F.filter(arr, lambda t: t == F.lit(term))
            )
            tf = piece if tf is None else tf + piece
        proj.append(tf.alias(f"tf_{i}"))
    if phrase:
        # Normalized token stream of the primary field, space-joined and
        # space-padded: a consecutive-token match is a substring match.
        proj.append(
            F.concat(
                F.lit(" "), F.array_join(tok_arrs[0], " "), F.lit(" ")
            )
            .contains(" " + " ".join(phrase) + " ")
            .alias("phrase_ok")
        )
    base = df.select(*proj)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"dft_{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int):
        tf, dft = F.col(f"tf_{i}"), F.col(f"dft_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - dft + 0.5) / (dft + 0.5)
        )
        return idf * (
            (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )

    raw = sum((term_score(i) for i in range(len(terms))), F.lit(0.0))
    cond = raw > 0  # keep only docs matching >= 1 query term
    if require_all:
        for i in range(len(terms)):
            cond = cond & (F.col(f"tf_{i}") > 0)
    if phrase:
        cond = cond & F.col("phrase_ok")
    return (
        base.crossJoin(broadcast(stats))
        .filter(cond)
        .select(F.col(id_col), F.round(raw, 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )
