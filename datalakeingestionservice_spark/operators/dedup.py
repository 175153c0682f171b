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
    per_doc_dedup: bool = False,
) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle) posting list.

    `max_shingle_freq` drops shingles appearing in more than that many docs —
    they contribute candidate pairs quadratically while carrying almost no
    similarity signal (the standard stop-shingle pruning at scale).

    `per_doc_dedup` picks the physical dedup strategy — both produce
    IDENTICAL rows, because (id, shingle) distinctness is per-doc by
    construction (id is in the key):

    - ``False`` (default): explode then global ``.distinct()`` — one
      corpus-sized exchange whose output Spark REUSES across multiple
      consumers (the inverted-index self-join's two aliases, the df
      table, the sizes table). The right shape when the posting list
      feeds several operators: q45 at bench scale measured 1.19 s
      with the reusable exchange vs 2.05 s recomputing the explode
      per consumer.
    - ``True``: ``array_distinct`` inside the row before the explode —
      ZERO exchange. The right shape when the posting list feeds ONE
      aggregate (the MinHash signature fold): the global distinct was
      the measured 7.6×-at-10×-volume term in the decontamination
      path (long-string shuffle spill, PERF.md r14), and there is no
      second consumer to amortize it.
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), words.alias("__w")).filter(
        F.size("__w") >= n
    )
    gram = (
        f"transform(sequence(1, size(__w) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__w, i, {n})))"
    )
    if per_doc_dedup:
        shingles = base.select(
            id_col,
            F.explode(F.array_distinct(F.expr(gram))).alias("shingle"),
        )
    else:
        shingles = base.select(
            id_col, F.explode(F.expr(gram)).alias("shingle")
        ).distinct()
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

    Three physical strategies, same result set:

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
    - ``"fused"`` (optimization r14): one doc-keyed window attaches n_sh to
      every posting row, the self-join adds the PPJoin LENGTH FILTER
      (least(na,nb)/greatest(na,nb) >= threshold — a necessary condition of
      jaccard >= threshold, written as the same correctly-rounded double
      division as the final filter so float rounding can never drop a
      surviving pair), and the pair groupBy carries first(n_sh) per side —
      the sizes aggregation and BOTH pair-sized size joins vanish from the
      plan. Non-viable pairs die before the pair exchange instead of after
      two joins. Measured (tools/probe_jaccard_variants.py, q195 tier
      profile, idle host): sf0.1 3.64→2.55 s, sf1 17.4→12.6 s (−28%),
      sf10 136.0→125.7 s, identical pair sets at all three scales. A
      PPJoin PREFIX filter (global df-order prefixes + array verify) was
      prototyped in the same probe and LOST at every scale (sf1 21.0 s vs
      17.4 baseline) — the df join, per-doc rank window, and full-set
      verify joins cost more than the candidate cut saves at these
      densities; not adopted.

    The per-doc size table joins back onto the candidate pairs WITHOUT a
    forced broadcast hint: sizes has one row per surviving document, which
    at 100 TB (billions of docs) is far past broadcast limits — a hard
    `F.broadcast` would OOM the driver. AQE sees the actual shuffle size at
    runtime and converts to a broadcast join whenever sizes is genuinely
    small, so the local-scale plan is unchanged while the 1000-executor
    plan stays a safe shuffled join. `persist` defaults off: measured
    locally, recomputing the explode+distinct subtree beats the cache
    barrier (cached plans also bypass AQE); flip it on when the shingle
    explode dominates (large corpora, wide shingles).
    """
    if strategy not in ("join", "grouped", "fused"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "fused":
        from pyspark.sql import Window

        sh = shingles.withColumn(
            "__n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
        if persist:
            sh = sh.persist()
        a, b = sh.alias("a"), sh.alias("b")
        na, nb = F.col("a.__n_sh"), F.col("b.__n_sh")
        jac = F.col("n_common").cast("double") / (
            F.col("na") + F.col("nb") - F.col("n_common")
        )
        return (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                & (
                    F.least(na, nb).cast("double") / F.greatest(na, nb)
                    >= threshold
                ),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_common"),
                F.first(na).alias("na"),
                F.first(nb).alias("nb"),
            )
            .filter(jac >= threshold)
            .select("doc_a", "doc_b", jac.alias("jaccard"))
        )
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
        common.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


_MINHASH_P = 2_147_483_647  # 2^31 - 1, Mersenne prime: universal-hash modulus


def _minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Seeded (a, b) coefficients for the permutation family
    h_k(x) = (a_k * x + b_k) mod p. Deterministic for a given seed, so the
    SAME literals are embedded in the Spark expressions and in the DuckDB
    oracle SQL — the whole signature is engine-portable (the reason the
    pyspark.ml MinHashLSH model, whose hash family is engine-private, was
    replaced)."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MINHASH_P), rnd.randrange(0, _MINHASH_P))
        for _ in range(num_hashes)
    ]


def _shingle_hash32():
    """Portable 32-bit shingle hash: first 8 hex chars of sha256, as an
    integer, reduced mod p. sha256 hex is byte-identical across engines
    (Spark `sha2(x,256)`, DuckDB `sha256(x)`), unlike xxhash64/murmur whose
    seeds are engine-private. Overflow-safe: h < 2^31 after the mod, so
    a*h + b < 2^62 stays inside signed 64-bit in both engines."""
    return (
        F.conv(F.substring(F.sha2(F.col("shingle"), 256), 1, 8), 16, 10)
        .cast("long")
        % _MINHASH_P
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    POSITIONAL k-token gram (order kept, duplicates kept — unlike
    :func:`word_shingles`), slide a window of `window` consecutive
    grams, and keep each window's MINIMUM hash. The selected minima are
    the document's fingerprint set, with the paper's guarantee: any
    shared run of at least `window + k - 1` tokens contributes at least
    one COMMON fingerprint, while storage shrinks ~2/(window+1) of the
    full gram set — the published recipe for contamination / plagiarism
    detection over corpora too large to compare gram-for-gram.

    Hashes are the engine's portable sha256-derived 32-bit family
    (`_shingle_hash32` — byte-identical in DuckDB), so the whole
    pipeline is value-checkable by an exact SQL oracle. Documents
    shorter than `k` tokens fingerprint their whole text; shorter than
    `window` grams yield their single global minimum.

    Scale shape: one map-side gram explode, one per-doc window (the
    only shuffle — partitioned by document, never global), one
    distinct. Output: (id_col, fp long) rows."""
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    # The per-doc gram count is a pure function of the token count —
    # compute it BEFORE the explode (optimization r15, guide §1.2:
    # don't compute things you already know): the previous shape
    # derived it with a count() window over the exploded rows, an
    # extra per-doc window pass whose value equals this expression by
    # construction (the transform emits exactly greatest(n-k+1, 1)
    # grams). Same exchange either way (the min-window below needs the
    # doc partitioning); one Window operator instead of two.
    grams = df.select(
        id_col,
        F.greatest(
            F.size(F.split(F.col(text_col), " ")) - (k - 1), F.lit(1)
        ).alias("__n"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {k - 1}, 1)),"
                f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k})))"
            )
        ).alias("pos", "shingle"),
    )
    h = _shingle_hash32()
    from pyspark.sql import Window as W

    frame = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    return (
        grams.withColumn("__h", h)
        .withColumn("__wmin", F.min("__h").over(frame))
        .filter(
            F.col("pos") <= F.greatest(F.col("__n") - window, F.lit(0))
        )
        .select(id_col, F.col("__wmin").alias("fp"))
        .distinct()
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    normalize: bool = False,
) -> DataFrame:
    """Maximal EXACTLY-duplicated token spans of at least `min_len`
    tokens (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — the ExactSubstr
    family): a token position is duplicated iff it starts a
    `min_len`-token substring whose exact text occurs at least twice
    anywhere in the corpus (any document, any position, self-repeats
    included), and maximal spans are the per-document merges of
    consecutive duplicated starts. This is the dedup class the
    shingle/MinHash/SimHash/winnowing operators only approximate —
    they score documents; this finds the literal shared bytes.

    Returns (id_col, span_start, span_end, n_tokens), token positions
    1-based inclusive; every span has n_tokens >= min_len.

    Scale shape — the paper uses a corpus-wide suffix array; the
    distributed formulation here needs NO pairwise join at all:

    1. one map-side projection materializes per-position L-gram
       HASHES (8 bytes each, never the L-token strings — tokens are
       pre-hashed once so gram hashing touches 8L bytes per position
       regardless of token width);
    2. one hash-keyed groupBy (map-side partial counts) finds hashes
       occurring >= 2 times;
    3. only those candidate positions — a vanishing fraction of the
       corpus — rejoin their documents by id to extract the true gram
       text, and a second small groupBy on the text screens out
       64-bit hash collisions, so the result is EXACT, not
       probabilistic;
    4. one per-document window merges consecutive starts into maximal
       spans (gaps-and-islands; the only other shuffle, keyed by doc).

    Never all-pairs, never a suffix sort: cost is one corpus-sized
    hash shuffle plus candidate-sized verification."""
    occ = _dup_gram_occurrences(
        df, id_col, text_col, min_len, normalize=normalize
    )
    L = int(min_len)
    isl = Window.partitionBy(id_col).orderBy("pos")
    return (
        occ.withColumn(
            "__grp", F.col("pos") - F.row_number().over(isl)
        )
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "n_tokens"
            ),
        )
    )


#: Per-token normalization for `normalize=True` matching: lowercase +
#: strip non-alphanumerics (ASCII class, byte-identical in DuckDB's
#: regexp_replace with the 'g' flag — \\p{L} classes differ across
#: engines). Applied TOKEN-WISE, so token positions are 1:1 with the
#: original text: spans report original positions and scrub cuts
#: original tokens — no offset mapping needed.
_NORM_TOKEN_EXPR = (
    "transform({col}, t -> lower(regexp_replace(t, '[^a-zA-Z0-9]', '')))"
)

#: The corpus-sized caches operators persist for multi-consumer reuse
#: (exact-substring gram-hash tables, simhash banded projections,
#: semantic-dedup assignments — all MEMORY_AND_DISK or default).
#: Bounded to a small FIFO: a composed pipeline
#: (decontaminate -> scrub in ONE plan, q179) legitimately holds a few
#: live gram caches at once — evicting a cache before its plan ever
#: materializes forces the tokenize+hash subtree to recompute per
#: consumer (the 2.2x regression the r9 probe measured) — while the
#: bound still prevents unbounded executor-storage growth across a
#: session (the ADVICE r9 finding).
_GRAM_CACHES: list = []
_MAX_GRAM_CACHES = 4


def _drop_gram_cache(df) -> None:
    """Unpersist an evicted cache, tolerating a STOPPED session: the
    registry is module-level, so after `spark.stop()` + a new session
    (back-to-back probe runs, notebook restarts) it can still hold
    frames whose JVM endpoints are gone — unpersisting those raises
    from deep inside the block manager, and there is nothing to free
    anyway (the storage died with the session)."""
    try:
        df.unpersist()
    except Exception:
        pass


def _register_gram_cache(df) -> None:
    _GRAM_CACHES.append(df)
    while len(_GRAM_CACHES) > _MAX_GRAM_CACHES:
        _drop_gram_cache(_GRAM_CACHES.pop(0))


def release_exact_substring_caches() -> None:
    """Unpersist every gram-hash table cached by previous
    exact_substring_spans / scrub / keep_first / decontaminate calls.
    Safe while lazy results from those calls are still alive: they
    recompute without the cache instead of failing."""
    while _GRAM_CACHES:
        _drop_gram_cache(_GRAM_CACHES.pop())


def _dup_gram_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int,
    normalize: bool = False,
) -> DataFrame:
    """(id, pos, __g) for every VERIFIED duplicated-L-gram start — the
    shared core of the exact-substring family (see
    :func:`exact_substring_spans` for the scale shape).

    The gram-hash table (id, pos, h — 3 longs/row) is PERSISTED
    (MEMORY_AND_DISK): it feeds both the duplicate-hash aggregate and
    the semi-join probe side, and without the cache the whole
    tokenize+hash projection re-evaluates per consumer (Spark reuses
    exchanges, not arbitrary subplans) — measured 2.2× end-to-end on
    the sf1 scale probe. Token hashes are hoisted into their own
    column FIRST, so each position's gram hash slices a ready array of
    longs (O(L) per position); inlining the token-hash transform in
    the per-position lambda re-hashed every token once per position —
    O(n·L) token hashing per document."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2 tokens")
    L = int(min_len)
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).filter(F.size("__w") >= L)
    # With normalize=True, matching (hashes AND the verification text)
    # runs over per-token-normalized tokens while positions — and the
    # scrub rebuild — stay on the original tokens (token-wise
    # normalization is position-preserving).
    match_toks = (
        F.expr(_NORM_TOKEN_EXPR.format(col="__w"))
        if normalize
        else F.col("__w")
    )
    toks = toks.withColumn("__wm", match_toks)
    # (id, pos, h): pos is the 1-based start of the L-token gram.
    grams = (
        toks.withColumn(
            "__wh", F.expr("transform(__wm, t -> xxhash64(t))")
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(__w) - "
                    f"{L - 1}), i -> xxhash64(slice(__wh, i, {L})))"
                )
            ).alias("__p0", "__h"),
        )
        .select(id_col, (F.col("__p0") + 1).alias("pos"), "__h")
    )
    from pyspark import StorageLevel

    # Bounded cache registry (persist is a performance hint — an older
    # lazy result that re-executes after its cache is evicted just
    # recomputes, it never gets wrong). A caller done with results can
    # drop everything via :func:`release_exact_substring_caches`.
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    _register_gram_cache(grams)
    dup_h = (
        grams.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__h")
    )
    cand = grams.join(dup_h, "__h", "semi")
    # Verify candidates against the true MATCHING gram text (collision
    # screen): only docs holding candidates ship their token arrays.
    cand_txt = cand.join(toks, id_col).select(
        id_col,
        "pos",
        F.expr(f"concat_ws(' ', slice(__wm, pos, {L}))").alias("__g"),
    )
    dup_txt = (
        cand_txt.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__g")
    )
    return cand_txt.join(dup_txt, "__g", "semi")


def exact_substring_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    out_col: str = "clean_text",
    normalize: bool = False,
) -> DataFrame:
    """Remove every token covered by an exactly-duplicated span of at
    least `min_len` tokens (:func:`exact_substring_spans`) from every
    document — the scrub-all curation policy (boilerplate and licence
    blocks vanish everywhere). Lee et al.'s tool instead keeps one
    canonical copy per duplicate cluster; that needs cross-occurrence
    clustering of spans whose MAXIMAL extents differ (doc A's 25-token
    span can contain doc B's 22-token maximal span), which a keep-first
    rule over exact span text would silently get wrong — so this
    engine ships the well-defined policy and the spans themselves;
    compose a keep rule downstream when one copy must survive.

    Returns the input rows (id, `out_col`, n_removed_tokens); docs
    without duplicated spans pass through unchanged. Plan shape: the
    span set (already candidate-sized) aggregates to ONE array per
    affected doc, joins back by id, and tokens filter JVM-side via an
    exists() predicate per token — no Python, no second corpus pass."""
    spans = exact_substring_spans(
        df,
        id_col=id_col,
        text_col=text_col,
        min_len=min_len,
        normalize=normalize,
    )
    return _cut_spans(df, spans, id_col, text_col, out_col)


def _cut_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str,
) -> DataFrame:
    """Rebuild every document with the given (id, span_start, span_end)
    token ranges removed; docs without spans pass through unchanged.
    The span set is candidate-sized: it aggregates to ONE array per
    affected doc, joins back by id, and tokens filter JVM-side."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    kept = F.expr(
        "filter(zip_with(__w, sequence(1, size(__w)), "
        "(t, p) -> struct(t AS tok, p AS pos)), "
        "x -> __spans IS NULL OR NOT exists(__spans, "
        "s -> x.pos BETWEEN s.span_start AND s.span_end))"
    )
    return (
        toks.join(per_doc, id_col, "left")
        .withColumn("__kept", kept)
        .select(
            id_col,
            F.expr("array_join(transform(__kept, x -> x.tok), ' ')").alias(
                out_col
            ),
            (F.size("__w") - F.size("__kept")).alias("n_removed_tokens"),
        )
    )


def exact_substring_keep_first(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    out_col: str = "clean_text",
    normalize: bool = False,
) -> DataFrame:
    """Lee et al. 2022's KEEP-ONE-COPY exact-substring removal — the
    policy :func:`exact_substring_scrub` documents as needing
    cross-occurrence clustering: duplicated span occurrences whose
    MAXIMAL extents differ (doc A's 25-token span contains doc B's
    22-token maximal span) still describe the same duplicated content,
    so occurrences cluster by SHARED DUPLICATED GRAM TEXT (transitive),
    each cluster keeps its first occurrence (min (doc id, span start)),
    and every other occurrence is cut whole. A naive keep-first over
    exact span text would keep both A's and B's copies.

    Scale shape on top of :func:`exact_substring_spans`' no-pairwise
    machinery: occurrences attach to their spans via the same per-doc
    window; the cluster graph uses STAR edges (every span of a gram →
    that gram's min-(doc,start) span — linear in occurrences, never the
    per-gram quadratic clique), and components come from
    `operators/graph.py` min-label propagation (driver union-find below
    500k edges, distributed label propagation above — the documented
    hybrid). Edges are candidate-sized: only verified duplicated grams
    produce any.

    Returns (id, out_col, n_removed_tokens); a self-repetitive doc
    whose span matches nothing else keeps its single occurrence."""
    from datalakeingestionservice_spark.operators.graph import (
        connected_components,
    )

    occ = _dup_gram_occurrences(
        df, id_col, text_col, min_len, normalize=normalize
    )
    L = int(min_len)
    isl = Window.partitionBy(id_col).orderBy("pos")
    occ = occ.withColumn(
        "__grp", F.col("pos") - F.row_number().over(isl)
    )
    spans = occ.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(L - 1)).alias("span_end"),
    )
    # String uid keeps node identity EXACT at any id/position magnitude
    # (a numeric composite would overflow; a hash could collide and
    # silently merge clusters — over-removal).
    uid = F.concat_ws(":", F.col(id_col), F.col("span_start"))
    spans = spans.withColumn("__uid", uid)
    soc = occ.join(spans, [id_col, "__grp"]).select(
        "__g", "__uid", id_col, "span_start"
    )
    anchors = soc.groupBy("__g").agg(
        F.min_by(
            "__uid", F.struct(F.col(id_col), F.col("span_start"))
        ).alias("__a")
    )
    edges = (
        soc.select("__g", "__uid")
        .distinct()
        .join(anchors, "__g")
        .select(F.col("__uid").alias("x"), F.col("__a").alias("y"))
        .distinct()
    )
    comps = connected_components(edges, "x", "y")
    members = comps.join(
        spans.select(
            F.col("__uid").alias("node"),
            id_col,
            "span_start",
            "span_end",
        ),
        "node",
    )
    keepers = members.groupBy("component").agg(
        F.min_by(
            "node", F.struct(F.col(id_col), F.col("span_start"))
        ).alias("__keep")
    )
    cut = (
        members.join(keepers, "component")
        .filter(F.col("node") != F.col("__keep"))
        .select(id_col, "span_start", "span_end")
    )
    return _cut_spans(df, cut, id_col, text_col, out_col)


def _gram_tables(
    df: DataFrame, id_col: str, text_col: str, L: int, normalize: bool
) -> tuple[DataFrame, DataFrame]:
    """(toks, grams) for one frame — toks carries the matching token
    array `__wm`, grams is (id, pos, __h) with pre-hoisted token hashes
    (same 8L-bytes-per-position shape as `_dup_gram_occurrences`)."""
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    ).filter(F.size("__w") >= L)
    match_toks = (
        F.expr(_NORM_TOKEN_EXPR.format(col="__w"))
        if normalize
        else F.col("__w")
    )
    toks = toks.withColumn("__wm", match_toks)
    grams = (
        toks.withColumn(
            "__wh", F.expr("transform(__wm, t -> xxhash64(t))")
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(__w) - "
                    f"{L - 1}), i -> xxhash64(slice(__wh, i, {L})))"
                )
            ).alias("__p0", "__h"),
        )
        .select(id_col, (F.col("__p0") + 1).alias("pos"), "__h")
    )
    return toks, grams


def exact_substring_decontaminate_spans(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    normalize: bool = False,
) -> DataFrame:
    """CROSS-CORPUS exact-substring CONTAMINATION spans (the
    decontamination use of Lee et al. 2022's ExactSubstr — the exact
    complement of the eval-leakage problem n-gram decontamination
    approximates): a corpus token position is contaminated iff it
    starts a `min_len`-token substring whose exact text occurs ANYWHERE
    in the held-out set; maximal spans merge consecutive contaminated
    starts per corpus document. Returns (id_col, span_start, span_end,
    n_tokens) over CORPUS documents, 1-based inclusive.

    Scale shape mirrors :func:`exact_substring_spans` — never a
    pairwise join: both sides project per-position gram HASHES (8
    bytes/position), the corpus grams semi-join the held-out hash SET
    (the only corpus-sized shuffle), and the true-text collision screen
    runs on candidates only — held-side text is even narrower, computed
    only for held positions whose hash collided with a corpus
    candidate. The held-out set is typically the small side (an eval
    benchmark), so its distinct-hash set is a fraction of corpus size."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2 tokens")
    from pyspark import StorageLevel

    L = int(min_len)
    ctoks, cg = _gram_tables(corpus, id_col, text_col, L, normalize)
    htoks, hg = _gram_tables(heldout, id_col, text_col, L, normalize)
    # Same bounded-cache discipline as `_dup_gram_occurrences`: the
    # corpus gram table feeds the semi-join AND the candidate rejoin.
    cg = cg.persist(StorageLevel.MEMORY_AND_DISK)
    _register_gram_cache(cg)
    held_hashes = hg.select("__h").distinct()
    cand = cg.join(held_hashes, "__h", "semi")
    cand_txt = cand.join(ctoks, id_col).select(
        id_col,
        "pos",
        F.expr(f"concat_ws(' ', slice(__wm, pos, {L}))").alias("__g"),
    )
    cand_hashes = cand.select("__h").distinct()
    held_txt = (
        hg.join(cand_hashes, "__h", "semi")
        .join(htoks, id_col)
        .select(
            F.expr(f"concat_ws(' ', slice(__wm, pos, {L}))").alias(
                "__g"
            )
        )
        .distinct()
    )
    occ = cand_txt.join(held_txt, "__g", "semi")
    isl = Window.partitionBy(id_col).orderBy("pos")
    return (
        occ.withColumn("__grp", F.col("pos") - F.row_number().over(isl))
        .groupBy(id_col, "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "n_tokens"
            ),
        )
    )


def exact_substring_decontaminate(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    out_col: str = "clean_text",
    normalize: bool = False,
) -> DataFrame:
    """Cut every contaminated span
    (:func:`exact_substring_decontaminate_spans`) from the corpus —
    the train-side scrub that removes verbatim eval/benchmark leakage.
    Returns corpus rows as (id, `out_col`, n_removed_tokens); the
    held-out set is never modified."""
    spans = exact_substring_decontaminate_spans(
        corpus,
        heldout,
        id_col=id_col,
        text_col=text_col,
        min_len=min_len,
        normalize=normalize,
    )
    return _cut_spans(corpus, spans, id_col, text_col, out_col)


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature: mh_k = min over shingles of
    (a_k * h(shingle) + b_k) mod p — ONE hash-aggregate shuffle with
    map-side partial mins (K min-columns ride a single groupBy), entirely
    JVM-side expressions."""
    h = _shingle_hash32()
    coeffs = _minhash_coeffs(num_hashes, seed)
    return shingles.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * h + F.lit(b)) % _MINHASH_P).alias(f"mh{k}")
            for k, (a, b) in enumerate(coeffs)
        ]
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    min_sim: float = 0.4,
    seed: int = 42,
) -> DataFrame:
    """Native deterministic MinHash LSH near-dup pairs.

    Sub-quadratic banding, same plan shape as the former pyspark.ml path
    but with an engine-owned seeded permutation family so DuckDB can
    recompute signatures/bands/candidates EXACTLY (q46 is hash-checked
    against the oracle, not rows-only):

    1. signature: K = `num_hashes` seeded permutation mins per doc
       (one aggregate, JVM expressions — see `minhash_signatures`);
    2. banding: K/bands rows per band, band signature = concatenated mins;
       candidates = equi-join on (band, signature) — pairs are generated
       only on band collisions, never all-pairs. P(candidate) =
       1-(1-s^r)^b: bands=8 x rows=2 gives 0.90 at s=0.5 and >0.9999 at
       s>=0.8 where this corpus's true pairs live.
    3. verify: exact Jaccard on the candidate set only — candidates are
       sparse, so the per-doc shingle-set arrays join against a SMALL
       candidate table (AQE broadcasts the candidate side; the big
       array-bearing side never shuffles).

    Returns (doc_a, doc_b, jaccard_sim) for candidates with exact
    jaccard_sim >= min_sim (the analog of approxSimilarityJoin's
    "distance <= max_distance" post-filter, which also used true distance).
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows = num_hashes // bands
    shingles = word_shingles(df, id_col, text_col, n=n)
    sig = minhash_signatures(shingles, id_col, num_hashes, seed)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bd).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{bd * rows + j}").cast("string")
                        for j in range(rows)
                    ],
                ).alias("sig"),
            )
            for bd in range(bands)
        ]
    )
    banded = sig.select(id_col, F.explode(band_structs).alias("bs")).select(
        id_col,
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sets_ = shingles.groupBy(id_col).agg(
        F.collect_set("shingle").alias("__sh")
    )
    sa, sb = sets_.alias("sa"), sets_.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.__sh"), F.col("sb.__sh")))
    jac = inter.cast("double") / (
        F.size(F.col("sa.__sh")) + F.size(F.col("sb.__sh")) - inter
    )
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", jac.alias("jaccard_sim"))
        .filter(F.col("jaccard_sim") >= min_sim)
    )


def minhash_contamination_pairs(
    corpus: DataFrame,
    held_out: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    min_sim: float = 0.4,
    seed: int = 42,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Cross-corpus FUZZY contamination pairs: (corpus doc, held-out
    doc) whose exact n-gram Jaccard >= `min_sim`, candidates found by
    the engine's seeded MinHash LSH banding family. This is the
    GPT-3/Pile-style decontamination primitive complementing E99:
    `exact_substring_decontaminate` removes VERBATIM eval leakage,
    this finds NEAR-DUPLICATE leakage (reworded or lightly edited
    eval documents) that no exact-substring pass can see.

    Scale shape: the held-out side is an eval set — orders of
    magnitude smaller than the corpus — so its banded signatures and
    shingle sets BROADCAST. The corpus pays one shingle projection and
    one signature aggregate (the only corpus-sized shuffle); candidate
    pairs come from the broadcast band equi-join (never all-pairs), and
    exact-Jaccard verification builds corpus shingle SETS only for
    candidate docs (semi-join before the collect_set).

    `max_band_freq` is the band-bucket analog of the stop-shingle df
    cut (q45's treatment): a (band, sig) bucket holding more than
    this many CORPUS docs is dropped before the candidate join. Dense
    buckets are boilerplate signatures — each contributes
    |bucket_c|·|bucket_h| candidate pairs and, transitively, that
    many exact-Jaccard verifications, the measured super-linear term
    at 10× volume (PERF.md r13 stage audit). A doc cut from one
    over-dense bucket still matches through its other bands, so
    recall degrades only for docs whose EVERY matching band is
    boilerplate-dense. This is a detection-semantics change: queries
    that enable it mirror the same threshold in their oracle (q209),
    never a silent cap. The heavy-bucket list is a partial-aggregated
    groupBy (map-side combine, tiny output — at most
    corpus·bands/threshold rows) broadcast into an anti-join, so the
    cut itself adds no corpus-sized shuffle.

    Returns (id_col, heldout_id, jaccard_sim). Hash family is the
    portable sha256-derived one with embedded (a_k, b_k) literals, so
    a SQL oracle recomputes signatures, bands, candidates, and Jaccard
    EXACTLY (q191 is hash-checked, not rows-only)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    if max_band_freq is not None and max_band_freq < 1:
        raise ValueError(f"max_band_freq must be >= 1, got {max_band_freq}")
    rows = num_hashes // bands
    # per_doc_dedup: the signature fold is the dominant consumer and a
    # single aggregate — the global distinct's exchange was the
    # measured 7.6× super-linear term here (PERF.md r14)
    c_sh = word_shingles(
        corpus, id_col, text_col, n=n, per_doc_dedup=True
    )
    h_sh = word_shingles(
        held_out, id_col, text_col, n=n, per_doc_dedup=True
    )

    def banded(sig: DataFrame, out: str) -> DataFrame:
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{bd * rows + j}").cast("string")
                            for j in range(rows)
                        ],
                    ).alias("sig"),
                )
                for bd in range(bands)
            ]
        )
        return sig.select(
            F.col(id_col).alias(out), F.explode(band_structs).alias("bs")
        ).select(out, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    cb = banded(minhash_signatures(c_sh, id_col, num_hashes, seed), "__cid")
    hb = banded(minhash_signatures(h_sh, id_col, num_hashes, seed), "__hid")
    if max_band_freq is not None:
        # One window over the SLIM banded rows (id, band, sig) — NOT a
        # broadcast of a separate aggregate subtree, which would
        # re-execute cb's lineage (the corpus-sized signature shuffle)
        # a second time just to learn the bucket counts (measured: the
        # aggregate-and-broadcast form cost +40% at sf10). The window
        # shuffles ∝ corpus·bands slim rows, strictly cheaper than
        # re-hashing every shingle.
        from pyspark.sql.window import Window

        wbf = Window.partitionBy("band", "sig")
        cb = (
            cb.withColumn("__bf", F.count(F.lit(1)).over(wbf))
            .filter(F.col("__bf") <= max_band_freq)
            .drop("__bf")
        )
    cand = (
        cb.join(F.broadcast(hb), ["band", "sig"])
        .select("__cid", "__hid")
        .distinct()
    )
    cand_ids = cand.select(F.col("__cid").alias(id_col)).distinct()
    c_sets = (
        c_sh.join(cand_ids, id_col, "leftsemi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("__csh"))
        .select(F.col(id_col).alias("__cid"), "__csh")
    )
    h_sets = (
        h_sh.groupBy(id_col)
        .agg(F.collect_set("shingle").alias("__hsh"))
        .select(F.col(id_col).alias("__hid"), "__hsh")
    )
    inter = F.size(F.array_intersect(F.col("__csh"), F.col("__hsh")))
    jac = inter.cast("double") / (
        F.size("__csh") + F.size("__hsh") - inter
    )
    return (
        cand.join(c_sets, "__cid")
        .join(F.broadcast(h_sets), "__hid")
        .select(
            F.col("__cid").alias(id_col),
            F.col("__hid").alias("heldout_id"),
            jac.alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= min_sim)
    )


def minhash_decontaminate(
    corpus: DataFrame,
    held_out: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Corpus with fuzzy-contaminated documents REMOVED: every doc
    whose n-gram Jaccard against ANY held-out doc reaches `min_sim`
    (see :func:`minhash_contamination_pairs`) is dropped whole —
    doc-level removal is the published posture for near-dup eval
    leakage (unlike verbatim spans, a paraphrased document can't be
    surgically cut). One broadcast anti-join over the corpus."""
    bad = (
        minhash_contamination_pairs(
            corpus, held_out, id_col=id_col, text_col=text_col, **kw
        )
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded sub-quadratically.

    Pigeonhole: a 16-bit hash split into 4 bands guarantees any pair within
    Hamming distance 3 shares at least one intact band, so candidates come
    from an equi-join on (band_idx, band_value) — the bitwise analog of
    MinHash banding. Exact Hamming (popcount of XOR) filters candidates.

    ``persist=False`` opts out of caching the banded projection (symmetry
    with jaccard_pairs/semantic_dedup) for callers managing cache lifetime
    themselves; the projection then recomputes once per self-join side.
    """
    hashes = simhash16(df, id_col, text_col)
    band_idx = df.sparkSession.range(0, 4).select(
        F.col("id").cast("int").alias("band")
    )
    # persist: (id, hash, band, band_val) is 4 tiny rows per document and
    # feeds BOTH self-join aliases — without it each side re-runs the
    # whole tokenize+hash projection over the corpus (optimization r14;
    # simhash16 itself is in-row/zero-exchange, so there is no exchange
    # for ReuseExchange to share across the aliases).
    banded = hashes.crossJoin(F.broadcast(band_idx)).select(
        id_col,
        "simhash16",
        "band",
        F.expr("(simhash16 >> (band * 4)) & 15").alias("band_val"),
    )
    if persist:
        banded = banded.persist()
        _register_gram_cache(banded)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.expr("bit_count(a.simhash16 ^ b.simhash16)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        # Hamming filter BEFORE the dedup exchange (optimization r14):
        # hamming is a pure function of the pair, so filter-then-distinct
        # is row-identical to distinct-then-filter — but the filter is
        # map-side while distinct shuffles, and each far pair would
        # otherwise cross the wire once per colliding band.
        .filter(hamming <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash from sha256 token hashes (engine-portable arithmetic;
    production width is 64 via xxhash64 — same plan shape).

    Edge rows under the in-row rewrite: a NULL ``text_col`` yields a row
    with NULL ``simhash16`` (the legacy explode path dropped it), and
    duplicate ids are no longer collapsed — one output row per input row.
    ``simhash_neardup_pairs`` is unaffected (a NULL band_val never
    equi-joins); direct consumers that need the legacy row set should
    filter NULL text / distinct ids themselves.

    Computed entirely IN-ROW (optimization r14): per-doc distinct tokens via
    `array_distinct`, per-token hash via `transform`, the 16 bit-votes as ONE
    `aggregate` fold carrying a 16-wide vote array, and the final hash as a
    fold over that array. The previous shape (explode -> global distinct ->
    crossJoin x16 bits -> groupBy(doc, bit) -> groupBy(doc)) shuffled
    |corpus_tokens| x 16 rows through THREE exchanges to compute a value
    that only ever depends on one document's own tokens; this one has ZERO
    exchanges (guide §2.4). Value-identical: the vote is an integer sum of
    ±1 over the same per-doc token set (order-independent), and the per-bit
    test reproduces the exact double-division arithmetic the oracle mirrors."""
    hexmap = "0123456789abcdef"

    def tok_h(t):
        sha = F.sha2(t, 256)

        def nib(i: int):
            return F.instr(F.lit(hexmap), F.substring(sha, i, 1)) - 1

        return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)

    seq16 = F.sequence(F.lit(0), F.lit(15))
    hs = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")), tok_h
    )
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 16),
        lambda acc, h: F.zip_with(
            acc,
            seq16,
            lambda a, k: a
            + F.when(
                (
                    h.cast("long") / F.pow(F.lit(2), k).cast("long")
                ).cast("long")
                % 2
                == 1,
                1,
            ).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            votes,
            seq16,
            lambda v, k: F.when(
                v > 0, F.pow(F.lit(2), k).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(id_col, sim.alias("simhash16"))
