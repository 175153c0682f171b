"""Deduplication operators (SURVEY.md C1/C2): exact, fingerprint, n-gram
Jaccard, MinHash LSH, SimHash.

Scale design: every path avoids O(n^2) work —

- exact/fingerprint dedup: one hash-aggregate shuffle on the dedup key; at
  100 TB dedup on the 32-byte sha256 fingerprint, never the raw payload.
- n-gram Jaccard: inverted-index self-join on shingles (cost ~ posting-list
  sizes); prune ubiquitous shingles with `max_shingle_freq` to bound the
  quadratic term per shingle.
- MinHash LSH: banding via pyspark.ml approxSimilarityJoin — candidate pairs
  only on band collisions.
- SimHash: near-dups differ in <= k bits; candidate blocking on band
  substrings of the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, keys: list[str], tiebreaker: str
) -> DataFrame:
    """Keep exactly one row per key-set: the row minimizing `tiebreaker`.

    Deterministic survivor selection — unlike `dropDuplicates`, whose survivor
    depends on partition order and differs run to run at scale.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(tiebreaker).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """sha256 of normalized text — the exact-dedup key for 100 TB corpora."""
    return df.withColumn(
        out_col, F.sha2(F.lower(F.trim(F.col(text_col))), 256)
    )


def dup_groups(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Per duplicate group: survivor id (min id) + copy count."""
    return df.groupBy(*keys).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle) posting list.

    `max_shingle_freq` drops shingles appearing in more than that many docs —
    they contribute candidate pairs quadratically while carrying almost no
    similarity signal (the standard stop-shingle pruning at scale).
    """
    words = F.split(F.col(text_col), " ")
    shingles = (
        df.select(
            F.col(id_col),
            words.alias("__w"),
        )
        .filter(F.size("__w") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__w) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(__w, i, {n})))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    if max_shingle_freq is not None:
        freq = shingles.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("__df")
        )
        shingles = (
            shingles.join(
                F.broadcast(freq.filter(F.col("__df") > max_shingle_freq)),
                "shingle",
                "left_anti",
            )
        )
    return shingles


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    persist: bool = False,
    strategy: str = "join",
) -> DataFrame:
    """Exact Jaccard over shingle posting lists.

    Returns (doc_a, doc_b, jaccard) for pairs with jaccard >= threshold.
    Only pairs sharing at least one shingle are ever considered.

    Two physical strategies, same result set:

    - ``"join"`` (default): inverted-index self-join on shingle with
      doc_a < doc_b. Robust to shingle skew — a ubiquitous shingle's pairs
      spread across tasks — so it's the safe default when posting-list
      frequencies are unbounded.
    - ``"grouped"``: groupBy(shingle) -> sorted doc-id array -> explode the
      C(df,2) in-group pairs -> count per pair. One fewer shuffle AND one
      fewer evaluation of the posting-list subtree (the self-join computes
      it for each aliased side; Spark doesn't reuse exchanges across
      aliases). REQUIRES bounded shingle frequency (stop-shingle pruning,
      `word_shingles(max_shingle_freq=K)`): one row holds C(df,2) elements,
      so an unpruned ubiquitous shingle would explode a single task.
      Measured at sf0.1 on the capstone corpus the join wins (collect_list
      + pair transform exceed the saved shuffle) — treat grouped as the
      escape hatch for when the posting subtree is the dominant cost, and
      measure before switching.

    The per-doc size table is broadcast back onto the candidate pairs (one
    row per doc — KBs even at millions of docs). `persist` defaults off:
    measured locally, recomputing the explode+distinct subtree beats the
    cache barrier (cached plans also bypass AQE); flip it on when the
    shingle explode dominates (large corpora, wide shingles).
    """
    if strategy not in ("join", "grouped"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if persist:
        shingles = shingles.persist()
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if strategy == "grouped":
        common = (
            shingles.groupBy("shingle")
            .agg(F.sort_array(F.collect_list(id_col)).alias("__ids"))
            .filter(F.size("__ids") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(sequence(0, size(__ids) - 2),"
                        " i -> transform(sequence(i + 1, size(__ids) - 1),"
                        " j -> struct(__ids[i] AS a, __ids[j] AS b))))"
                    )
                ).alias("__p")
            )
            .groupBy(
                F.col("__p.a").alias("doc_a"), F.col("__p.b").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a, b = shingles.alias("a"), shingles.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        common.join(F.broadcast(sa), F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    max_distance: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """MinHash LSH candidate pairs (Jaccard distance <= max_distance).

    The sub-quadratic scale path: banding buckets near-identical shingle sets
    together; `approxSimilarityJoin` joins only within buckets.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, Tokenizer

    docs = df.select(id_col, text_col)
    tokens = Tokenizer(inputCol=text_col, outputCol="__tokens").transform(docs)
    grams = NGram(n=n, inputCol="__tokens", outputCol="__shingles").transform(tokens)
    grams = grams.filter(F.size("__shingles") > 0)
    cv = CountVectorizer(
        inputCol="__shingles", outputCol="__features", binary=True, minDF=1.0
    ).fit(grams)
    vectors = cv.transform(grams).select(id_col, "__features")
    lsh = MinHashLSH(
        inputCol="__features",
        outputCol="__hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vectors)
    pairs = lsh.approxSimilarityJoin(
        vectors, vectors, max_distance, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (1.0 - F.col("jaccard_dist")).alias("jaccard_sim"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded sub-quadratically.

    Pigeonhole: a 16-bit hash split into 4 bands guarantees any pair within
    Hamming distance 3 shares at least one intact band, so candidates come
    from an equi-join on (band_idx, band_value) — the bitwise analog of
    MinHash banding. Exact Hamming (popcount of XOR) filters candidates.
    """
    hashes = simhash16(df, id_col, text_col)
    band_idx = df.sparkSession.range(0, 4).select(
        F.col("id").cast("int").alias("band")
    )
    banded = hashes.crossJoin(F.broadcast(band_idx)).select(
        id_col,
        "simhash16",
        "band",
        F.expr("(simhash16 >> (band * 4)) & 15").alias("band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.expr("bit_count(a.simhash16 ^ b.simhash16)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash from sha256 token hashes (engine-portable arithmetic;
    production width is 64 via xxhash64 — same plan shape)."""
    tokens = (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .distinct()
    )
    hexmap = "0123456789abcdef"
    sha = F.sha2(F.col("tok"), 256)

    def nib(i: int):
        return F.instr(F.lit(hexmap), F.substring(sha, i, 1)) - 1

    h = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    bits = tokens.select(id_col, h.alias("h"))
    spark = df.sparkSession
    bit_idx = spark.range(0, 16).select(F.col("id").cast("int").alias("bit"))
    votes = (
        bits.crossJoin(F.broadcast(bit_idx))
        .groupBy(id_col, "bit")
        .agg(
            F.sum(
                F.when(
                    (F.col("h").cast("long") / F.pow(2, F.col("bit")).cast("long"))
                    .cast("long")
                    % 2
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias("vote")
        )
    )
    return (
        votes.groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("vote") > 0, F.pow(2, F.col("bit")).cast("long")
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("simhash16")
        )
    )
