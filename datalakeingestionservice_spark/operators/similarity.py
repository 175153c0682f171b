"""Vector similarity operators (SURVEY.md C3/C4): exact cosine, top-k,
blocked near-dup, IVF coarse quantization, sign-random-projection LSH.

All vector math is built-in higher-order functions (`zip_with` + `aggregate`)
over `array<float>` columns — JVM-side, codegen-friendly, no Python in the hot
path. Exact brute force is the correctness baseline; IVF and LSH are the scale
paths (cell/bucket blocking turns corpus-quadratic work into per-block work).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """Double-precision dot product of two float arrays (sequential fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(v: str | Column) -> Column:
    """sqrt(dot(v, v)) — the norm term of :func:`cosine`, as a standalone
    column so pair joins can hoist it to ONE evaluation per row instead of
    one per candidate pair (optimization r14). Bit-identical composition:
    `dot(a,b) / (norm_a * norm_b)` is the same expression tree as
    :func:`cosine` with the sqrt folds evaluated earlier — IEEE doubles are
    deterministic, so hoisting cannot move any value."""
    return F.sqrt(dot(v, v))


def cosine_prenormed(
    a: str | Column, b: str | Column, na: Column, nb: Column
) -> Column:
    """:func:`cosine` where both norms were precomputed with :func:`norm`.

    Per pair this evaluates ONE 64-element fold (the dot) instead of three
    plus two sqrts — the dominant per-row cost of every blocked / broadcast
    pair join at 100 TB, where each row meets many candidates."""
    return dot(a, b) / (na * nb)


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k nearest neighbors of a (broadcast) query vector.

    The orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    then a k-row merge on the driver — no global sort, no full shuffle.
    """
    return (
        emb.crossJoin(F.broadcast(query))
        .select(
            id_col,
            cosine(vec_col, query_vec_col).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def blocked_neardup(
    emb: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs within blocks (label/LSH bucket/IVF cell).

    Per-block quadratic instead of corpus-quadratic; the block column at
    production scale comes from `lsh_bucket` or `ivf_assign` below.
    """
    emb = emb.withColumn("__nrm", norm(vec_col))  # once per row, not per pair
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine_prenormed(
        F.col(f"a.{vec_col}"),
        F.col(f"b.{vec_col}"),
        F.col("a.__nrm"),
        F.col("b.__nrm"),
    )
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(cos >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cos.alias("cos_sim"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids).

    IVF coarse quantization: queries then probe one (or a few) cells instead
    of the corpus. Ties broken on centroid id for determinism.

    Argmin as ONE aggregate (`min_by` over a (-cos, cid) ordering struct),
    not a per-vector `row_number` window. The window shape EXCHANGES all
    |vectors| x |centroids| candidate rows, then sorts them per partition; the
    aggregate gets map-side partial combine, so only |vectors| rows cross the
    wire. (Spark lowers struct-ordered min_by to SortAggregate — the residual
    sort is local, pre-combine, on the single id key.)
    """
    cos = cosine(vec_col, centroid_vec_col)
    order = F.struct(
        (-F.col("cos_sim")).alias("neg_cos"), F.col(centroid_id_col)
    )
    best = F.min_by(
        F.struct(F.col(centroid_id_col), F.col("cos_sim")), order
    )
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select(id_col, vec_col, centroid_id_col, cos.alias("cos_sim"))
        .groupBy(id_col)
        .agg(F.first(vec_col).alias(vec_col), best.alias("__best"))
        .select(
            id_col,
            vec_col,
            F.col(f"__best.{centroid_id_col}"),
            F.col("__best.cos_sim"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    max_cluster_size: int | None = None,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup-shaped embedding dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster every vector to its nearest centroid
    (:func:`ivf_assign`), compute pairwise cosine ONLY within each
    cluster, and greedily drop the higher-id member of every pair at or
    above `threshold` — the keep-lowest-index rule the paper uses, so
    the survivor set is deterministic and an exact-SQL oracle can
    recompute it. Returns `(survivors, dropped)`:

    - `survivors`: (id, vec, cid) rows that remain,
    - `dropped`: (id, cid) rows removed, each with `dup_of` — the
      lowest-id cluster member it collided with (its anchor).

    Scale shape: the cluster equi-join makes cost Σ |cluster|² instead
    of |corpus|² — with k-means centroids at k ≈ √N this is the
    published recipe for trillion-token corpora; centroids are
    broadcast (k rows), the only corpus-sized shuffles are the argmin
    aggregate and the cluster-keyed self-join. A transitive chain
    (a~b, b~c, a≁c) keeps a and drops both b and c — same as the
    greedy pass in the paper; use `connected_components` +
    `dedup_survivors` (operators/graph.py) when component-level
    semantics are wanted instead.

    `max_cluster_size` is the giant-cluster guard: Σ |cluster|² is the
    paper's recipe, but nothing in the recipe bounds |cluster| — a
    degenerate centroid set (k too small, collapsed embeddings)
    silently re-creates the |corpus|² join inside one cluster. With
    the guard set, any cluster larger than the cap is sub-sharded by a
    deterministic secondary hash of the id into ceil(size/cap) shards
    and pairs are compared only WITHIN a shard, bounding per-group
    pairwise work to ~cap² regardless of how badly the centroids fit.
    Documented recall tradeoff: duplicate pairs straddling two shards
    of an oversized cluster are missed — the guard is a cost ceiling
    for unattended runs, not a better clustering; size k properly
    (k ≈ √N) and the guard never fires (clusters at or under the cap
    are left whole, so results are bit-identical to the unguarded
    run). Same posture as q45's `max_shingle_freq` posting-list cap.

    `persist` materializes the assignment once (MEMORY_AND_DISK):
    `assigned` feeds BOTH self-join sides AND the survivor anti-join
    (and often a caller-side members union) — without it each consumer
    re-executes the broadcast-crossJoin + argmin aggregate, the
    corpus-sized subtree (optimization r14: q158 re-ran it 4×)."""
    assigned = ivf_assign(
        emb,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id_col=centroid_id_col,
        centroid_vec_col=centroid_vec_col,
    ).select(id_col, vec_col, centroid_id_col)
    # Norm once per row — the pair join below otherwise folds each side's
    # norm per candidate pair (3 array folds + 2 sqrt per pair -> 1 fold).
    assigned = assigned.withColumn("__nrm", norm(vec_col))
    if persist:
        from datalakeingestionservice_spark.operators.dedup import (
            _register_gram_cache,
        )

        assigned = assigned.persist()
        _register_gram_cache(assigned)
    shard_keys: list[str] = []
    if max_cluster_size is not None:
        if max_cluster_size < 1:
            raise ValueError("max_cluster_size must be >= 1")
        # Cluster sizes are k rows — broadcast, never a data-sized join.
        sizes = assigned.groupBy(centroid_id_col).agg(
            F.count(F.lit(1)).alias("__csz")
        )
        n_shards = F.ceil(
            F.col("__csz") / F.lit(max_cluster_size)
        ).cast("long")
        assigned = (
            assigned.join(F.broadcast(sizes), centroid_id_col)
            .withColumn(
                "__shard",
                F.when(n_shards <= 1, F.lit(0).cast("long")).otherwise(
                    F.pmod(F.xxhash64(F.col(id_col)), n_shards)
                ),
            )
            .drop("__csz")
        )
        shard_keys = ["__shard"]
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = cosine_prenormed(
        F.col(f"a.{vec_col}"),
        F.col(f"b.{vec_col}"),
        F.col("a.__nrm"),
        F.col("b.__nrm"),
    )
    join_cond = (
        F.col(f"a.{centroid_id_col}") == F.col(f"b.{centroid_id_col}")
    ) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for k in shard_keys:
        join_cond = join_cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = (
        a.join(b, join_cond)
        .filter(cos >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("__keep"),
            F.col(f"b.{id_col}").alias("__drop"),
            F.col(f"a.{centroid_id_col}").alias(centroid_id_col),
        )
    )
    dropped = pairs.groupBy("__drop", centroid_id_col).agg(
        F.min("__keep").alias("dup_of")
    )
    survivors = assigned.join(
        dropped.select(F.col("__drop").alias(id_col)),
        id_col,
        "left_anti",
    ).select(id_col, vec_col, centroid_id_col)
    return survivors, dropped.select(
        F.col("__drop").alias(id_col), centroid_id_col, "dup_of"
    )


def lsh_bucket(
    emb: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-random-projection LSH bucket id from fixed hyperplanes.

    len(planes) sign bits -> 2^n buckets; similar vectors collide, candidate
    generation becomes a bucket equi-join (one small-key shuffle).
    """
    bucket: Column = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in row])
        bit = (dot(vec_col, plane) >= 0).cast("long")
        bucket = bucket + bit * (2**i)
    return emb.withColumn(out_col, bucket)


def ivf_recall(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probes: tuple[int, ...] = (1, 3),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    round_dp: int = 6,
) -> DataFrame:
    """Recall@k of IVF probe search against the exact brute-force
    ranking, per query vector and per probe setting — THE number a real
    user sizes `n_probe` with (VERDICT r9 #2). Returns
    (qid, n_probe, n_hits, recall), recall = |approx∩exact| / k.

    Ground truth is unavoidable brute force (that is what recall IS),
    so run this on a SAMPLE of queries — cost is |emb| × |queries|
    through one window, while the IVF side stays cells-probed-sized.
    Both rankings round cosine to `round_dp` before ordering and break
    ties on vector id, making the measurement engine-reproducible
    (recall is intersection-based, so boundary ties would otherwise
    flip membership between engines). Monotone in n_probe by
    construction — probing p+1 cells searches a superset — and probing
    ALL cells degenerates to brute force (recall 1.0); both invariants
    are pinned in pytest."""
    from pyspark.sql import Window as W

    spark = emb.sparkSession
    probes_df = spark.createDataFrame(
        [(int(p),) for p in sorted(probes)], "n_probe int"
    )
    scored_cos = F.round(cosine(vec_col, qvec_col), round_dp)

    # Exact ground truth: top-k per query over the whole corpus.
    exact = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(qid_col))
        .select(qid_col, id_col, scored_cos.alias("__cos"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(qid_col).orderBy(
                    F.desc("__cos"), F.asc(id_col)
                )
            ),
        )
        .filter(F.col("__rn") <= k)
        .select(qid_col, id_col)
    )

    # IVF side: rank centroids per query, probe the top-n_probe cells.
    cent_rank = (
        centroids.crossJoin(F.broadcast(queries))
        .select(
            qid_col,
            "cid",
            F.round(cosine("cv", qvec_col), round_dp).alias("__ccos"),
        )
        .withColumn(
            "__crn",
            F.row_number().over(
                W.partitionBy(qid_col).orderBy(
                    F.desc("__ccos"), F.asc("cid")
                )
            ),
        )
    )
    probe_cells = (
        cent_rank.crossJoin(F.broadcast(probes_df))
        .filter(F.col("__crn") <= F.col("n_probe"))
        .select(qid_col, "n_probe", "cid")
    )
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    approx = (
        assigned.join(F.broadcast(probe_cells), "cid")
        .join(F.broadcast(queries), qid_col)
        .filter(F.col(id_col) != F.col(qid_col))
        .select(qid_col, "n_probe", id_col, scored_cos.alias("__cos"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(qid_col, "n_probe").orderBy(
                    F.desc("__cos"), F.asc(id_col)
                )
            ),
        )
        .filter(F.col("__rn") <= k)
        .select(qid_col, "n_probe", id_col)
    )

    hits = approx.join(exact, [qid_col, id_col]).groupBy(
        qid_col, "n_probe"
    ).agg(F.count(F.lit(1)).alias("__h"))
    grid = queries.select(qid_col).crossJoin(probes_df)
    return (
        grid.join(hits, [qid_col, "n_probe"], "left")
        .select(
            qid_col,
            "n_probe",
            F.coalesce(F.col("__h"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.col("__h"), F.lit(0)) / float(k), 4
            ).alias("recall"),
        )
        .orderBy(qid_col, "n_probe")
    )


def lsh_multiprobe_topk(
    emb: DataFrame,
    query: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    n_flip: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    round_dp: int = 6,
    query_id_col: str | None = None,
) -> DataFrame:
    """Multi-probe sign-LSH top-k (Lv et al. 2007's multi-probe idea on
    the sign-random-projection family): instead of growing table count
    to raise recall, probe the query's OWN bucket plus every bucket
    within Hamming distance `n_flip` of it — near-misses land one sign
    flip away, so probing 1+n flipped buckets recovers most of them at
    1/2^n of the corpus per bucket. Returns (id_col, bucket, cos_sim)
    — the exact rank within the probed candidate set, cosine rounded
    to `round_dp`, ties on id (engine-reproducible, like
    :func:`ivf_recall`).

    Query contract: without `query_id_col` the query frame must hold
    EXACTLY ONE row (enforced) — a global top-k over several queries'
    mixed candidates would silently answer none of them. For a query
    BATCH pass `query_id_col`: ranking becomes per-query (row_number
    partitioned by the id, same cos-desc/id-asc order), and the output
    leads with the query id column.

    Scale shape: bucket ids are JVM sign-bit arithmetic; the probe set
    (1 + n_planes choose <=n_flip buckets) broadcasts; candidates come
    from a bucket equi-join — never a corpus scan per query, never
    all-pairs. Only n_flip <= 1 is implemented (the probe set stays
    linear in planes; deeper flips grow combinatorially and IVF is the
    better tool there)."""
    if n_flip not in (0, 1):
        raise ValueError("n_flip must be 0 or 1")
    if query_id_col is None and query.limit(2).count() != 1:
        raise ValueError(
            "query frame must hold exactly one row; pass query_id_col "
            "to rank a query batch per-query"
        )
    n = len(planes)
    bucketed = lsh_bucket(emb, planes, vec_col=vec_col)
    qb = lsh_bucket(
        query, planes, vec_col=query_vec_col, out_col="__qb"
    )
    flips = [F.col("__qb")] + (
        [
            F.col("__qb").bitwiseXOR(F.lit(2**i))
            for i in range(n)
        ]
        if n_flip >= 1
        else []
    )
    qcols = [query_id_col] if query_id_col else []
    probes = qb.select(
        *qcols,
        query_vec_col,
        F.explode(F.array(*flips)).alias("bucket"),
    )
    cand = bucketed.join(F.broadcast(probes), "bucket")
    scored = cand.select(
        *qcols,
        id_col,
        "bucket",
        F.round(cosine(vec_col, query_vec_col), round_dp).alias(
            "cos_sim"
        ),
    )
    if query_id_col is None:
        return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def semantic_contamination_pairs(
    corpus: DataFrame,
    held_out: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.9,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus SEMANTIC contamination: (corpus id, held-out id)
    pairs whose embedding cosine reaches `min_cos` — the third member
    of the decontamination family (verbatim exact-substring, fuzzy
    lexical MinHash, and this: rephrasings that share no n-grams but
    embed next to the eval document).

    Scale shape: the held-out side is an eval set — tiny next to the
    corpus — so it BROADCASTS whole; the corpus is scanned once, each
    row scoring |held_out| dot products inside whole-stage codegen
    (zip_with + aggregate, no Python). This is the EXACT baseline; at
    corpus sizes where |held_out| per-row scoring is too hot, block
    both sides with :func:`ivf_assign` on shared centroids and join on
    cell first (see :func:`semantic_decontaminate`'s `centroids`).

    With `centroids` (shared k-means centers, broadcast), both sides
    block through :func:`ivf_assign` and only SAME-CELL pairs score —
    the ANN scale path, trading recall at cell boundaries exactly like
    `ivf_topk` (a contaminated pair whose members quantize to
    different cells is missed; the verbatim/near-identical leaks that
    matter most always share a cell).

    Returns (id_col, heldout_id, cos_sim)."""
    if centroids is not None:
        ca = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
        ha = ivf_assign(
            held_out, centroids, id_col=id_col, vec_col=vec_col
        )
        h = ha.select(
            F.col(id_col).alias("heldout_id"),
            F.col(vec_col).alias("__hv"),
            "cid",
        ).withColumn("__hn", norm("__hv"))
        c = ca.select(
            id_col, F.col(vec_col).alias("__cv"), "cid"
        ).withColumn("__cn", norm("__cv"))
        cos = cosine_prenormed("__cv", "__hv", F.col("__cn"), F.col("__hn"))
        return (
            c.join(F.broadcast(h), "cid")
            .select(id_col, "heldout_id", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= min_cos)
        )
    # Norms once per row on BOTH sides (corpus row + broadcast held row),
    # so each of the |corpus| x |held| scored pairs folds one dot product
    # instead of three (optimization r14: q194 -40%).
    h = held_out.select(
        F.col(id_col).alias("heldout_id"), F.col(vec_col).alias("__hv")
    ).withColumn("__hn", norm("__hv"))
    c = corpus.select(id_col, F.col(vec_col).alias("__cv")).withColumn(
        "__cn", norm("__cv")
    )
    cos = cosine_prenormed("__cv", "__hv", F.col("__cn"), F.col("__hn"))
    return (
        c.crossJoin(F.broadcast(h))
        .select(id_col, "heldout_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cos)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    held_out: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.9,
    centroids: DataFrame | None = None,
    emb_corpus: DataFrame | None = None,
    emb_held_out: DataFrame | None = None,
) -> DataFrame:
    """Corpus rows whose embedding cosine against ANY held-out row
    reaches `min_cos` are REMOVED (doc-level, like the fuzzy lexical
    scrub — an embedding-near document has no verbatim span to cut).

    `corpus`/`held_out` carry the embeddings by default; pass
    `emb_corpus`/`emb_held_out` when the payload table is separate
    from the embedding table (joined on `id_col`). With `centroids`
    (shared k-means centers, broadcast), both sides block through
    :func:`ivf_assign` and only same-cell pairs score — the ANN scale
    path, trading recall at cell boundaries exactly like `ivf_topk`."""
    ce = emb_corpus if emb_corpus is not None else corpus
    he = emb_held_out if emb_held_out is not None else held_out
    bad = (
        semantic_contamination_pairs(
            ce, he, id_col=id_col, vec_col=vec_col, min_cos=min_cos,
            centroids=centroids,
        )
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
