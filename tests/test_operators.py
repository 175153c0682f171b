"""Unit tests for the operators library (dedup / similarity / text)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.dedup import (
    exact_dedup,
    fingerprint,
    jaccard_pairs,
    word_shingles,
)
from datalakeingestionservice_spark.operators.similarity import (
    blocked_neardup,
    cosine,
    cosine_topk,
    ivf_assign,
    lsh_bucket,
)
from datalakeingestionservice_spark.operators.text import quality_score, token_stats


def test_exact_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "x"), (5, "y")], ["id", "k"]
    )
    out = exact_dedup(df, keys=["k"], tiebreaker="id")
    assert {(r.k, r.id) for r in out.collect()} == {("x", 1), ("y", 5)}


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("  Hello World ",), ("hello world",)], ["text"])
    fps = [r.fingerprint for r in fingerprint(df, "text").collect()]
    assert fps[0] == fps[1] and len(fps[0]) == 64


def test_word_shingles_and_pruning(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y")], ["doc_id", "text"]
    )
    sh = word_shingles(df, "doc_id", "text", n=3)
    got = {(r.doc_id, r.shingle) for r in sh.collect()}
    assert got == {(1, "a b c"), (1, "b c d"), (2, "a b c"), (2, "b c e")}
    # doc 3 has < 3 words -> no shingles; pruning drops 'a b c' (df=2) at freq 1:
    pruned = word_shingles(df, "doc_id", "text", n=3, max_shingle_freq=1)
    assert "a b c" not in {r.shingle for r in pruned.collect()}


def test_word_shingles_dedup_modes_same_rows_different_plans(spark):
    """r14 (E139): per_doc_dedup=True must emit IDENTICAL rows with
    ZERO exchange (array_distinct is in-row; id is in the dedup key),
    while the default keeps the global distinct whose exchange is
    reusable across consumers. Repeated shingles within a doc are the
    discriminating input."""
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b c")], ["doc_id", "text"]
    )
    legacy = word_shingles(df, "doc_id", "text", n=2)
    rowmode = word_shingles(df, "doc_id", "text", n=2, per_doc_dedup=True)
    key = lambda d: sorted((r.doc_id, r.shingle) for r in d.collect())
    assert key(legacy) == key(rowmode)
    assert "Exchange" in legacy._jdf.queryExecution().executedPlan().toString()
    assert (
        "Exchange"
        not in rowmode._jdf.queryExecution().executedPlan().toString()
    )


def test_stop_shingle_pruning_recall(spark, sf_dir):
    """Stop-shingle pruning safety condition: `max_shingle_freq` must exceed
    the largest duplicate-cluster size. Shingles shared by a whole k-doc dup
    cluster have df = k, so a threshold below k prunes exactly the evidence
    the pairs need (this testdata has a 4-doc cluster: 8/12/120/360). Above
    the cluster size, pruning drops only signal-free ubiquitous shingles and
    pair recall is total. q79 sets 20 at sf0.1 — measured recall 1.0 there."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    full_sh = word_shingles(docs, "doc_id", "text", n=3)
    full = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(full_sh, threshold=0.4).collect()
    }
    assert full, "anchor must be non-empty for recall to mean anything"

    # Safe threshold (>= max cluster size 4): pruning engaged, recall 1.0.
    safe_sh = word_shingles(docs, "doc_id", "text", n=3, max_shingle_freq=4)
    assert safe_sh.count() < full_sh.count()  # actually dropped postings
    safe = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(safe_sh, threshold=0.4).collect()
    }
    assert len(full & safe) / len(full) >= 0.99

    # Below the cluster size the documented failure mode appears: the 4-doc
    # cluster's shared shingles (df=4 > 3) vanish and its pairs are lost.
    tight_sh = word_shingles(docs, "doc_id", "text", n=3, max_shingle_freq=3)
    tight = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(tight_sh, threshold=0.4).collect()
    }
    assert (8, 120) in full and (8, 120) not in tight


def test_q45_production_cut_recall_anchor(spark, sf_dir):
    """q45 ships with stop-shingle pruning `max_shingle_freq=50`
    mirrored in its DuckDB oracle (the fix for the sf1 probe's
    quadratic candidate join). Two pins at sf0.001: (a) the production
    cut prunes NOTHING at test SFs (max df ~9), so the oracle result is
    bit-identical to the historical unpruned form; (b) even an
    AGGRESSIVE cut (5, which does prune the df 6-9 head here) keeps
    pair recall 1.0 at q45's threshold — the cut drops only
    signal-free ubiquitous shingles."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    full_sh = word_shingles(docs, "doc_id", "text", n=3)
    full = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(full_sh, threshold=0.5).collect()
    }
    assert full
    prod_sh = word_shingles(
        docs, "doc_id", "text", n=3, max_shingle_freq=50
    )
    assert prod_sh.count() == full_sh.count()  # (a) no-op at this SF
    aggr_sh = word_shingles(
        docs, "doc_id", "text", n=3, max_shingle_freq=5
    )
    assert aggr_sh.count() < full_sh.count()  # cut actually engaged
    aggr = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(aggr_sh, threshold=0.5).collect()
    }
    assert full <= aggr  # (b) recall 1.0


def test_minhash_recall_vs_exact_anchor(spark, sf_dir):
    """MinHash LSH candidate recall against the exact-Jaccard anchor (the
    q45/q46 pair). Banding theory: P(candidate) = 1-(1-s^r)^b; bands=8 x
    rows=2 gives 0.90 at s=0.5 and >0.9999 at s >= 0.8 — this corpus's
    true pairs sit at s >= 0.96 where collision is near-certain. The native
    permutation family is seeded => the measurement is fully deterministic;
    floor stated at 0.95."""
    from datalakeingestionservice_spark.operators.dedup import (
        minhash_neardup_pairs,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    anchor = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(
            word_shingles(docs, "doc_id", "text", n=3), threshold=0.5
        ).collect()
    }
    assert anchor, "anchor must be non-empty for recall to mean anything"
    cand = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardup_pairs(
            docs, n=3, num_hashes=16, bands=8, min_sim=0.4, seed=42
        ).collect()
    }
    assert len(anchor & cand) / len(anchor) >= 0.95


def test_jaccard_pairs_no_forced_broadcast(spark):
    """The per-doc sizes table must NOT carry a hard broadcast hint: it has
    one row per surviving document, so at billions of docs a forced
    broadcast OOMs. AQE converts to broadcast at runtime when actually
    small — the hint adds nothing locally and kills the plan at scale."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    pairs = jaccard_pairs(word_shingles(df, "doc_id", "text", n=3))
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan


def test_jaccard_fused_matches_join(spark, sf_dir):
    """strategy='fused' (optimization r14) must return the IDENTICAL
    (doc_a, doc_b, jaccard) set as the canonical join strategy — the
    length filter is a necessary condition of jaccard >= t, written as
    the same correctly-rounded double division as the final filter so
    rounding can never disagree between the two."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    sh = word_shingles(
        docs, "doc_id", "text", n=3, max_shingle_freq=20, per_doc_dedup=True
    )
    for threshold in (0.4, 0.8):
        ref = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in jaccard_pairs(sh, threshold=threshold).collect()
        }
        fused = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in jaccard_pairs(
                sh, threshold=threshold, strategy="fused"
            ).collect()
        }
        assert ref, f"threshold {threshold}: anchor must be non-empty"
        assert fused == ref, f"threshold {threshold}"


def test_jaccard_fused_plan_shape(spark):
    """fused plan pins: exactly ONE join (the shingle self-join carrying
    the length filter) — the sizes aggregation and both pair-sized size
    joins are gone — and no forced broadcast anywhere (auto threshold
    off, so any surviving broadcast would be a hint)."""
    import re as _re

    df = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g") for i in range(6)], ["doc_id", "text"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sh = word_shingles(df, "doc_id", "text", n=3)
        fused = jaccard_pairs(sh, threshold=0.4, strategy="fused")
        plan = fused._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    joins = _re.findall(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert len(joins) == 1, joins
    assert "BroadcastHashJoin" not in joins
    assert "least" in plan and "greatest" in plan, (
        "length filter left the join condition"
    )


def test_simhash16_inrow_zero_exchange_and_values(spark):
    """simhash16 is computed in-row (optimization r14): ZERO exchanges in
    its plan, and values bit-identical to the legacy explode -> distinct ->
    crossJoin(bits) -> two-groupBy shape (re-derived here as the reference)."""
    from datalakeingestionservice_spark.operators.dedup import simhash16

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b c"), (3, "x y z w v"), (4, "")],
        ["doc_id", "text"],
    )
    out = simhash16(df, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "simhash16 reacquired a shuffle"

    # Legacy reference shape (the pre-r14 implementation, verbatim math).
    tokens = df.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).distinct()
    sha = F.sha2(F.col("tok"), 256)
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(sha, i, 1)) - 1
    bits = tokens.select(
        "doc_id", (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)).alias("h")
    )
    bit_idx = spark.range(0, 16).select(F.col("id").cast("int").alias("bit"))
    votes = (
        bits.crossJoin(F.broadcast(bit_idx))
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                F.when(
                    (F.col("h").cast("long") / F.pow(2, F.col("bit")).cast("long"))
                    .cast("long") % 2 == 1,
                    1,
                ).otherwise(-1)
            ).alias("vote")
        )
    )
    ref = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.pow(2, F.col("bit")).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ).cast("long").alias("simhash16")
    )
    got = {(r.doc_id, r.simhash16) for r in out.collect()}
    want = {(r.doc_id, r.simhash16) for r in ref.collect()}
    # Doc 4 ("") tokenizes to [""] on both paths; every doc must agree.
    assert got == want and len(got) == 4


def test_cosine_prenormed_bit_identical(spark):
    """cosine_prenormed(a, b, norm(a), norm(b)) must be BIT-identical to
    cosine(a, b) — the r14 hoist only moves when the sqrt folds evaluate,
    never what they evaluate (IEEE doubles are deterministic)."""
    from datalakeingestionservice_spark.operators.similarity import (
        cosine,
        cosine_prenormed,
        norm,
    )

    emb = spark.createDataFrame(
        [
            (1, [0.1, -0.7, 0.3, 0.9]),
            (2, [0.4, 0.2, -0.6, 0.05]),
            (3, [1e-8, 2e8, -3.3, 0.0]),
        ],
        ["vec_id", "embedding"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    a = emb.withColumn("__nrm", norm("embedding")).alias("a")
    b = emb.withColumn("__nrm", norm("embedding")).alias("b")
    joined = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("plain"),
        cosine_prenormed(
            F.col("a.embedding"),
            F.col("b.embedding"),
            F.col("a.__nrm"),
            F.col("b.__nrm"),
        ).alias("pre"),
    )
    import struct

    for r in joined.collect():
        assert struct.pack("<d", r.plain) == struct.pack("<d", r.pre)


def test_semantic_dedup_persist_same_results(spark):
    """persist=True (r14: materialize the 4x-consumed assignment) must not
    change the survivor/dropped sets."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3) + 0.1, 1.0, float(i % 2)]) for i in range(12)],
        ["vec_id", "embedding"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    key = lambda dfs: (
        sorted((r.vec_id, r.cid) for r in dfs[0].collect()),
        sorted((r.vec_id, r.cid, r.dup_of) for r in dfs[1].collect()),
    )
    plain = key(semantic_dedup(emb, cents, threshold=0.9))
    cached = key(semantic_dedup(emb, cents, threshold=0.9, persist=True))
    assert plain == cached
    assert plain[1], "dropped set empty — the pin would be vacuous"


def test_operator_persists_stay_bounded(spark):
    """Cache-registry pin (VERDICT r14 #8): repeated invocations of the
    persisting operators (simhash banding, semantic-dedup assignment)
    must not grow executor storage unboundedly — every persist routes
    through the bounded FIFO registry, so the live set stays at its cap
    no matter how many calls a long-lived session makes."""
    from datalakeingestionservice_spark.operators import dedup as ddp
    from datalakeingestionservice_spark.operators.dedup import (
        simhash_neardup_pairs,
    )
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} common words here") for i in range(6)],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 2), 1.0]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    cents = emb.limit(1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    for _ in range(4):
        simhash_neardup_pairs(docs).count()
        semantic_dedup(emb, cents, persist=True)[0].count()
    assert len(ddp._GRAM_CACHES) <= ddp._MAX_GRAM_CACHES


def test_jaccard_pairs_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    sh = word_shingles(df, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, threshold=0.0).collect()
    # shingle sets: {abc, bcd} vs {abc, bce}: |inter|=1, |union|=3
    assert len(pairs) == 1
    assert pairs[0].doc_a == 1 and pairs[0].doc_b == 2
    assert abs(pairs[0].jaccard - 1 / 3) < 1e-12


def test_cosine_and_topk(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 1.0]),
            (4, [-1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([([1.0, 0.0],)], ["qv"])
    top = cosine_topk(emb, q, k=2).collect()
    assert [r.vec_id for r in top] == [1, 3]
    assert abs(top[0].cos_sim - 1.0) < 1e-12
    assert abs(top[1].cos_sim - 0.7071067811865475) < 1e-9


def test_blocked_neardup_respects_blocks(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [1.0, 0.001], "a"),
            (3, [1.0, 0.0], "b"),  # identical to 1 but different block
        ],
        ["vec_id", "embedding", "label"],
    )
    pairs = blocked_neardup(emb, block_col="label", threshold=0.99).collect()
    assert {(r.vec_a, r.vec_b) for r in pairs} == {(1, 2)}


def test_ivf_assign_nearest_centroid(spark):
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.1])],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "cv"]
    )
    got = {r.vec_id: r.cid for r in ivf_assign(emb, cents).collect()}
    assert got == {10: 0, 11: 1, 12: 0}


def test_winnow_fingerprints_guarantee(spark):
    """The winnowing guarantee (Schleimer et al.): any shared run of at
    least window+k-1 tokens contributes a COMMON fingerprint; identical
    docs fingerprint identically; docs shorter than k tokens (or with
    fewer grams than the window) still yield one fingerprint."""
    from datalakeingestionservice_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),  # identical
            (3, "x y a b c d e f g h i j z"),  # shares a >=8-token run
            (4, "p q r"),  # shorter than k=4 tokens
            (5, "one two three four five"),  # 2 grams < window
            (6, "totally different words entirely here now ok fine"),
        ],
        ["doc_id", "text"],
    )
    fps = {}
    for r in winnow_fingerprints(df, k=4, window=5).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] == fps[2]
    assert fps[1] & fps[3], "shared 10-token run must share a fingerprint"
    assert len(fps[4]) == 1 and len(fps[5]) == 1
    assert not (fps[1] & fps[6])
    # storage bound: far fewer fingerprints than grams (10 tokens -> 7
    # grams -> 3 complete windows -> <= 3 fps)
    assert len(fps[1]) <= 3


def test_winnow_single_window_pass(spark):
    """Plan pin (optimization r15): the per-doc gram count is computed
    BEFORE the explode, so the plan carries exactly ONE Window operator
    (the rolling min) — the count() window over exploded rows is gone —
    and still exactly one Exchange (the doc partitioning both windows
    shared; removing the count must not add a shuffle)."""
    import re as _re

    from datalakeingestionservice_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r")],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=4, window=5)
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"\bWindow\b", plan)) == 1, plan
    # one exchange for the window + one for the final distinct
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_exact_substring_spans_planted(spark):
    """ExactSubstr semantics (Lee et al. 2022) pinned on hand-built
    docs: a run duplicated across two docs is found with EXACT maximal
    boundaries; a within-doc self-repeat counts; near-misses (one token
    differs) do NOT produce a span; docs shorter than min_len are out;
    adjacent duplicated gram starts merge into ONE maximal span."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_spans,
    )

    shared = " ".join(f"s{i}" for i in range(7))  # 7-token planted run
    df = spark.createDataFrame(
        [
            # doc 1: shared run at tokens 3..9 of 12
            (1, f"a1 a2 {shared} b1 b2 b3"),
            # doc 2: same run at tokens 1..7 of 10
            (2, f"{shared} c1 c2 c3"),
            # doc 3: one token mutated inside its own copy of the run
            # (unique framing tokens) -> no shared 5-token window left
            (3, "d1 d2 s0 s1 s2 XX s4 s5 s6 e1 e2 e3"),
            # doc 4: self-repeat of a 5-token phrase, twice in one doc
            (4, "p q r t u zz1 zz2 zz3 p q r t u"),
            # doc 5: shorter than min_len
            (5, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in exact_substring_spans(df, min_len=5).collect()
    }
    # doc1: starts 3..5 are duplicated 5-grams -> one maximal span 3..9
    # doc2: one maximal span 1..7
    # doc4: "p q r t u" at 1..5 and 9..13
    assert spans == {
        (1, 3, 9, 7),
        (2, 1, 7, 7),
        (4, 1, 5, 5),
        (4, 9, 13, 5),
    }
    with pytest.raises(ValueError, match="min_len"):
        exact_substring_spans(df, min_len=1)


def test_exact_substring_scrub(spark):
    """Scrub-all removes every token covered by a duplicated span in
    every occurrence; untouched docs pass through byte-identical."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
    )

    shared = " ".join(f"s{i}" for i in range(6))
    df = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} b1"),
            (2, f"{shared} c1 c2"),
            (3, "completely unrelated text that stays intact here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in exact_substring_scrub(df, min_len=6).collect()
    }
    assert got[1] == ("a1 a2 b1", 6)
    assert got[2] == ("c1 c2", 6)
    assert got[3] == ("completely unrelated text that stays intact here", 0)


def test_exact_substring_keep_first(spark):
    """Keep-one-copy removal (Lee et al.): occurrences cluster by
    SHARED duplicated gram text, so spans with DIFFERING maximal
    extents (doc 1's 8-token span contains doc 2's 6-token maximal
    span) land in one cluster — a naive keep-first over exact span
    text would wrongly keep both. The cluster's first occurrence
    survives whole; every other occurrence is cut; a within-doc
    self-repeat keeps its first copy."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_keep_first,
    )

    shared = " ".join(f"s{i}" for i in range(6))
    df = spark.createDataFrame(
        [
            (1, f"p q {shared} r"),   # maximal span 1..8 (keeper)
            (2, shared),              # maximal span 1..6 (same content)
            (3, f"p q {shared} z"),   # maximal span 1..8
            (4, "p2 q2 r2 t2 u2 zz p2 q2 r2 t2 u2"),  # self-repeat
            (5, "totally unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in exact_substring_keep_first(df, min_len=5).collect()
    }
    assert got[1] == (f"p q {shared} r", 0)  # first occurrence kept
    assert got[2] == ("", 6)
    assert got[3] == ("z", 8)
    assert got[4] == ("p2 q2 r2 t2 u2 zz", 5)
    assert got[5] == ("totally unrelated words here now", 0)


def test_exact_substring_normalize(spark):
    """normalize=True matches on per-token lowercased/punct-stripped
    text while positions — and the scrub rebuild — stay on the ORIGINAL
    tokens (token-wise normalization is position-preserving, so no
    offset mapping exists to get wrong)."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
        exact_substring_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "The Quick, Brown Fox Jumped Over The Lazy Dog!"),
            (2, "the quick brown fox jumped over the lazy dog"),
            (3, "a totally different sentence lives right here now"),
        ],
        ["doc_id", "text"],
    )
    # raw: case/punctuation differences -> no exact 5-token match
    assert exact_substring_spans(df, min_len=5).count() == 0
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substring_spans(
            df, min_len=5, normalize=True
        ).collect()
    }
    assert spans == {(1, 1, 9), (2, 1, 9)}
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in exact_substring_scrub(
            df, min_len=5, normalize=True
        ).collect()
    }
    assert got[1] == ("", 9) and got[2] == ("", 9)
    assert got[3][1] == 0


def test_exact_substring_no_all_pairs_plan(spark):
    """The scale contract (VERDICT r8 #1): NO pairwise join anywhere —
    duplicated grams come from a hash-keyed groupBy, never a self-join
    of positions, so there is no CartesianProduct and no
    BroadcastNestedLoopJoin in the physical plan."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_spans,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(8)],
        ["doc_id", "text"],
    )
    plan = (
        exact_substring_spans(df, min_len=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_greedy_and_cluster_scoped(spark):
    """SemDeDup semantics pinned on a hand-built frame: (a) dedup only
    WITHIN a cluster — identical vectors in different clusters both
    survive; (b) greedy keep-lowest-index — a transitive chain a~b~c
    with a~c below threshold keeps a and drops BOTH b and c, each
    anchored to its lowest-id collision partner."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [
            # cluster 0: chain 10~11 (cos 1.0), 11~12 high, 10~12 lower
            (10, [1.0, 0.0, 0.0]),
            (11, [1.0, 0.0, 0.0]),
            (12, [0.97, 0.0, 0.2431]),
            # cluster 1: identical to vec 10 but nearest to centroid 1
            (13, [0.0, 1.0, 0.0]),
            (14, [0.0, 1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])], ["cid", "cv"]
    )
    survivors, dropped = semantic_dedup(emb, cents, threshold=0.96)
    assert {r.vec_id for r in survivors.collect()} == {10, 13}
    got = {r.vec_id: (r.cid, r.dup_of) for r in dropped.collect()}
    # 11 collides with 10; 12 collides with 10 (cos 0.97) and 11 —
    # anchor is the lowest; 14 collides with 13 in ITS cluster only.
    assert got == {11: (0, 10), 12: (0, 10), 14: (1, 13)}


def test_semantic_dedup_plan_shape(spark):
    """The scale contract: centroid assignment is ONE map-side-combined
    aggregate over a broadcast cross join (never a row_number exchange
    of |vectors| x |centroids| rows), and the pair join is cluster-
    keyed."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "cv"]
    )
    survivors, _ = semantic_dedup(emb, cents, threshold=0.999)
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan  # argmin is min_by, not row_number


def test_semantic_dedup_giant_cluster_guard(spark):
    """VERDICT r8 #2: a degenerate centroid set (everything lands in
    ONE cluster) must not re-create the |corpus|² join —
    `max_cluster_size` sub-shards the oversized cluster so pairwise
    work is bounded per shard. Observable proof with threshold=-1
    (every candidate pair collides): unguarded, one global survivor
    remains (the full N² pairing found everything); guarded, exactly
    one survivor PER SHARD remains, i.e. the join never compared
    across shards."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    n, cap = 60, 10
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) * 1e-6]) for i in range(n)],
        ["vec_id", "embedding"],
    )
    collapsed = spark.createDataFrame([(0, [1.0, 0.0])], ["cid", "cv"])
    unguarded, _ = semantic_dedup(emb, collapsed, threshold=-1.0)
    assert unguarded.count() == 1  # the corpus-quadratic answer
    survivors, dropped = semantic_dedup(
        emb, collapsed, threshold=-1.0, max_cluster_size=cap
    )
    # expected shard count from the same deterministic hash
    n_shards = (
        emb.select(
            F.pmod(F.xxhash64("vec_id"), F.lit(n // cap)).alias("s")
        )
        .distinct()
        .count()
    )
    assert survivors.count() == n_shards  # one survivor per shard only
    assert survivors.count() + dropped.count() == n
    assert survivors.columns == ["vec_id", "embedding", "cid"]
    # clusters at or under the cap are left whole — results identical
    # to the unguarded run (the guard is a no-op until it must fire)
    small = spark.createDataFrame(
        [(i, [1.0, float(i) * 1e-6]) for i in range(5)],
        ["vec_id", "embedding"],
    )
    s1, d1 = semantic_dedup(small, collapsed, threshold=-1.0)
    s2, d2 = semantic_dedup(
        small, collapsed, threshold=-1.0, max_cluster_size=cap
    )
    assert sorted(r.vec_id for r in s1.collect()) == sorted(
        r.vec_id for r in s2.collect()
    )
    assert sorted((r.vec_id, r.dup_of) for r in d1.collect()) == sorted(
        (r.vec_id, r.dup_of) for r in d2.collect()
    )
    with pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup(emb, collapsed, max_cluster_size=0)


def test_lsh_bucket_identical_vectors_collide(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -0.2, 0.8]), (2, [0.5, -0.2, 0.8]), (3, [-0.5, 0.2, -0.8])],
        ["vec_id", "embedding"],
    )
    planes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = {r.vec_id: r.bucket for r in lsh_bucket(emb, planes).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]  # opposite vector flips every sign bit


def test_salted_join_matches_plain_join(spark):
    """Salting only routes rows — output must equal the unsalted join,
    including unmatched-left behavior and rows under a hot key."""
    from datalakeingestionservice_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10.0)] * 50 + [(2, 1.0), (3, 2.0), (9, 5.0)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b")], ["k", "name"])

    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.name)
            for r in salted_join(fact, dim, on="k", n_salts=4, how=how).collect()
        )
        want = sorted(
            (r.k, r.v, r.name) for r in fact.join(dim, "k", how).collect()
        )
        assert got == want, how

    with pytest.raises(ValueError, match="inner|left"):
        salted_join(fact, dim, on="k", how="full")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(fact, fact, on="k")


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], ["doc_id", "text"])
    row = token_stats(df).collect()[0]
    assert row.n_tokens == 6
    assert row.n_unique_tokens == 5
    assert row.stopword_ratio == pytest.approx(3 / 6, abs=1e-4)  # the, on, the
    q = df.select(quality_score("text").alias("q")).collect()[0].q
    assert 0.0 <= q <= 1.0


def test_connected_components_chain_and_isolated(spark):
    from datalakeingestionservice_spark.operators.graph import (
        connected_components,
        dedup_survivors,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        ["doc_a", "doc_b"],
    )
    comps = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 99]],
        ["doc_id", "text"],
    )
    surv = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    assert surv == {1, 10, 20, 99}  # component reps + untouched node


def test_quality_expectations_and_audits(spark):
    from datalakeingestionservice_spark.operators.quality import (
        check_expectations,
        check_referential,
        check_unique_key,
        expect_not_null,
        expect_range,
        profile,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 3.0), (4, None)], ["k", "v"]
    )
    checks = {
        r.expectation: r.n_violations
        for r in check_expectations(
            df, [expect_not_null("v"), expect_range("v", 0.0, 100.0)]
        ).collect()
    }
    assert checks["not_null(v)"] == 1
    assert checks["range(v,0.0,100.0)"] == 2  # -5.0 and the NULL

    uniq = check_unique_key(df, ["k"]).collect()[0]
    assert (uniq.n_keys, uniq.n_duplicate_keys, uniq.n_excess_rows) == (3, 1, 1)

    parent = spark.createDataFrame([(1,), (2,)], ["k"])
    fk = check_referential(df, parent, "k", "k").collect()[0]
    assert (fk.n_child_rows, fk.n_orphans) == (4, 1)

    prof = {r.column: r for r in profile(df).collect()}
    assert prof["v"].n_nulls == 1
    assert prof["v"].min_value == "-5.0" and prof["v"].max_value == "10.0"


# -- BM25 ranking -----------------------------------------------------------


def test_bm25_rank_matches_hand_formula(spark):
    import math

    from datalakeingestionservice_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana"),
            (3, "cherry cherry cherry cherry"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.score
        for r in bm25_rank(docs, ["apple", "banana"]).collect()
    }

    n_docs, avgdl = 3, (3 + 1 + 4) / 3
    k1, b = 1.2, 0.75

    def idf(dft):
        return math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))

    def term_score(tf, dl, dft):
        return idf(dft) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl)
        )

    exp1 = round(term_score(2, 3, 1) + term_score(1, 3, 2), 4)
    exp2 = round(term_score(1, 1, 2), 4)
    assert got == {1: pytest.approx(exp1), 2: pytest.approx(exp2)}
    assert 3 not in got  # no query term -> not ranked


def test_bm25_top_k_and_tiebreak(spark):
    from datalakeingestionservice_spark.operators.text import bm25_rank

    # Identical docs tie on score; order falls back to doc_id ascending.
    docs = spark.createDataFrame(
        [(i, "apple pie") for i in range(10)], "doc_id bigint, text string"
    )
    rows = bm25_rank(docs, ["apple"], top_k=4).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2, 3]
    assert len({r.score for r in rows}) == 1


def test_jaccard_grouped_strategy_equals_join(spark, sf_dir):
    """Both physical strategies must return the identical pair set with
    identical jaccard values (grouped requires bounded shingle df — use
    the pruned posting list, as its contract demands)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    sh = word_shingles(docs, "doc_id", "text", n=3, max_shingle_freq=10)

    def pairs(strategy):
        return {
            (r.doc_a, r.doc_b, round(r.jaccard, 6))
            for r in jaccard_pairs(
                sh, threshold=0.4, strategy=strategy
            ).collect()
        }

    joined, grouped = pairs("join"), pairs("grouped")
    assert joined, "empty anchor proves nothing"
    assert grouped == joined

    import pytest as _pytest

    with _pytest.raises(ValueError):
        jaccard_pairs(sh, strategy="nope")


def test_bm25_require_all_and_phrase(spark):
    from datalakeingestionservice_spark.operators.text import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "big data vector engines"),      # all terms + phrase
            (2, "data big vector"),               # all terms, NO phrase
            (3, "big data lake"),                 # phrase, missing 'vector'
            (4, "Big, Data! vector"),             # punctuation can't break it
            (5, "bigger database vector"),        # substrings must not match
        ],
        "doc_id bigint, text string",
    )
    terms = ["big", "data", "vector"]
    assert {
        r.doc_id for r in bm25_rank(docs, terms, require_all=True).collect()
    } == {1, 2, 4}
    assert {
        r.doc_id
        for r in bm25_rank(docs, terms, phrase=["big", "data"]).collect()
    } == {1, 3, 4}
    assert {
        r.doc_id
        for r in bm25_rank(
            docs, terms, require_all=True, phrase=["big", "data"]
        ).collect()
    } == {1, 4}
    # OR baseline still matches any-term docs (5 tokenizes to 'bigger',
    # 'database' — substrings of query terms must not count).
    assert {r.doc_id for r in bm25_rank(docs, terms).collect()} == {
        1, 2, 3, 4, 5,
    }  # doc 5 matches via the standalone token 'vector' only


def test_bm25f_field_weights_shift_ranking(spark):
    import math

    from datalakeingestionservice_spark.operators.text import bm25_rank

    # Same body length; doc 2 has the term in its (short) title field.
    docs = spark.createDataFrame(
        [
            (1, "apple", "pear plum cherry"),
            (2, "other", "apple plum cherry"),
        ],
        "doc_id bigint, title string, text string",
    )
    rows = {
        r.doc_id: r.score
        for r in bm25_rank(
            docs, ["apple"], fields=[("title", 3.0), ("text", 1.0)]
        ).collect()
    }
    # Hand formula: dl = 3*len(title) + len(text); tf weighted the same.
    n_docs, k1, b = 2, 1.2, 0.75
    dls = {1: 3 * 1 + 3, 2: 3 * 1 + 3}
    avgdl = sum(dls.values()) / 2
    idf = math.log(1.0 + (n_docs - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4
        )

    assert rows[1] == score(3.0, dls[1])  # title hit, weight 3
    assert rows[2] == score(1.0, dls[2])  # body hit, weight 1
    assert rows[1] > rows[2]


def test_exact_substring_gram_cache_bounded(spark):
    """ADVICE r9 low: each exact-substring call persists a corpus-sized
    gram table; repeated calls must not accumulate cached RDDs — the
    registry is a bounded FIFO (small enough to cap storage, big
    enough that a composed pipeline's few live caches survive until
    they materialize), releasable explicitly, and an older lazy result
    still computes correctly after its cache is evicted (persist is a
    hint, never a correctness dependency)."""
    from pyspark import StorageLevel

    from datalakeingestionservice_spark.operators import dedup

    dedup.release_exact_substring_caches()  # other tests may have filled it
    base = "the quick brown fox jumps over the lazy dog today"
    df = spark.createDataFrame(
        [("a", base + " alpha"), ("b", base + " beta"), ("c", "unique words only here")],
        "doc_id string, text string",
    )
    r1 = dedup.exact_substring_spans(df, min_len=5)
    n1 = r1.count()
    assert len(dedup._GRAM_CACHES) == 1
    first_cache = dedup._GRAM_CACHES[0]
    # different params each time -> DIFFERENT gram plans (an identical
    # plan would re-hit the same CacheManager entry and prove nothing)
    for L in (6, 7, 8, 9):
        dedup.exact_substring_spans(df, min_len=L).count()
    # bounded: the registry never exceeds the cap, and the OLDEST
    # cache was evicted (its storage actually released)
    assert len(dedup._GRAM_CACHES) == dedup._MAX_GRAM_CACHES
    assert first_cache.storageLevel == StorageLevel.NONE
    # stale lazy result recomputes identically without its cache
    assert r1.count() == n1
    dedup.release_exact_substring_caches()
    assert dedup._GRAM_CACHES == []


def test_ivf_recall_monotone_in_probes(spark, sf_dir):
    """Recall@k invariants (q170's quality surface): per query vector,
    recall is NON-DECREASING in n_probe (probing p+1 cells searches a
    strict superset of candidates), and probing ALL cells degenerates
    to brute force — recall exactly 1.0."""
    from datalakeingestionservice_spark.catalog import Env
    from datalakeingestionservice_spark.operators.similarity import (
        ivf_recall,
    )

    emb = Env(spark, sf_dir).t("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    rows = ivf_recall(
        emb, centroids, queries, k=10, probes=(1, 2, 4, 8)
    ).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append((r.n_probe, r.recall))
    assert len(by_q) == 4
    for qid, seq in by_q.items():
        seq.sort()
        rec = [x[1] for x in seq]
        assert rec == sorted(rec), (qid, seq)  # monotone in n_probe
        assert rec[-1] == 1.0, (qid, seq)  # all cells == brute force


def test_exact_substring_decontaminate_planted(spark):
    """Cross-corpus decontamination (q172's operator): a train doc
    carrying a verbatim copy of a held-out passage gets exactly that
    span back (1-based inclusive, maximal); near-misses (one token
    differs) and same-corpus duplicates (train-train only) produce
    NOTHING — contamination is strictly train-vs-heldout. The scrub
    variant cuts the span and only the span."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate,
        exact_substring_decontaminate_spans,
    )

    leak = " ".join(f"w{i}" for i in range(1, 13))  # 12 tokens
    near = " ".join(
        f"w{i}" if i != 6 else "DIFF" for i in range(1, 13)
    )
    dup = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    corpus = spark.createDataFrame(
        [
            ("t1", "pre alpha " + leak + " post omega"),
            ("t2", "clean " + near + " tail"),
            ("t3", dup + " aa"),
            ("t4", dup + " bb"),  # train-train dup: NOT contamination
        ],
        "doc_id string, text string",
    )
    heldout = spark.createDataFrame(
        [("h1", "eval question " + leak + " eval answer")],
        "doc_id string, text string",
    )
    spans = exact_substring_decontaminate_spans(
        corpus, heldout, min_len=12
    ).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_tokens) for r in spans] == [
        ("t1", 3, 14, 12)
    ]
    clean = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in exact_substring_decontaminate(
            corpus, heldout, min_len=12
        ).collect()
    }
    assert clean["t1"] == ("pre alpha post omega", 12)
    assert clean["t2"][1] == 0 and clean["t3"][1] == 0
    assert clean["t4"][1] == 0


def test_decontaminate_no_all_pairs_plan(spark):
    """The cross-corpus variant inherits the scale contract: corpus
    grams SEMI-join the held-out hash set, never a position self-join —
    no CartesianProduct, no BroadcastNestedLoopJoin."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_decontaminate_spans,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}_{j}" for j in range(30))) for i in range(8)],
        ["doc_id", "text"],
    )
    held = spark.createDataFrame(
        [(i, " ".join(f"h{i}_{j}" for j in range(30))) for i in range(4)],
        ["doc_id", "text"],
    )
    plan = (
        exact_substring_decontaminate_spans(corpus, held, min_len=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_multiprobe_superset_and_recall(spark, sf_dir):
    """Multi-probe LSH invariants: the flip-1 probe set strictly
    contains the single-bucket candidates, so multiprobe top-k recall
    vs the exact ranking is >= single-bucket recall; n_flip outside
    {0,1} refuses."""
    from datalakeingestionservice_spark.operators.similarity import (
        cosine_topk,
        lsh_multiprobe_topk,
    )
    from datalakeingestionservice_spark.queries.vectors import (
        _hyperplanes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact = {
        r.vec_id for r in cosine_topk(corpus, q, k=10).collect()
    }
    single = {
        r.vec_id
        for r in lsh_multiprobe_topk(
            corpus, q, _hyperplanes(), k=10, n_flip=0
        ).collect()
    }
    multi = {
        r.vec_id
        for r in lsh_multiprobe_topk(
            corpus, q, _hyperplanes(), k=10, n_flip=1
        ).collect()
    }
    assert len(exact & multi) >= len(exact & single)
    assert len(multi) >= len(single)
    with pytest.raises(ValueError, match="n_flip"):
        lsh_multiprobe_topk(corpus, q, _hyperplanes(), n_flip=2)


def test_lsh_multiprobe_query_batch_contract(spark, sf_dir):
    """Query-frame contract: multiple query rows without a query id
    REFUSE (a global top-k over mixed candidates answers no query);
    with `query_id_col` the ranking is per-query — each query's rows
    equal the single-query call's rows."""
    from datalakeingestionservice_spark.operators.similarity import (
        lsh_multiprobe_topk,
    )
    from datalakeingestionservice_spark.queries.vectors import (
        _hyperplanes,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") > 1)
    batch = emb.filter(F.col("vec_id") <= 1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    with pytest.raises(ValueError, match="exactly one row"):
        lsh_multiprobe_topk(corpus, batch, _hyperplanes(), k=5)

    got = lsh_multiprobe_topk(
        corpus, batch, _hyperplanes(), k=5, query_id_col="qid"
    ).collect()
    assert got and got[0].__fields__[0] == "qid"
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, set()).add((r.vec_id, r.cos_sim))
    for qid in (0, 1):
        solo = {
            (r.vec_id, r.cos_sim)
            for r in lsh_multiprobe_topk(
                corpus,
                batch.filter(F.col("qid") == qid).drop("qid"),
                _hyperplanes(),
                k=5,
            ).collect()
        }
        assert by_q[qid] == solo, qid


def test_minhash_decontaminate_scrubs_near_dup_leakage(spark, sf_dir):
    """Fuzzy decontamination (E119): a held-out document injected
    VERBATIM into the corpus under a new id must be caught (jaccard
    1.0) and scrubbed; survivors = corpus minus exactly the distinct
    contaminated ids; no contaminated id survives."""
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.operators.dedup import (
        minhash_contamination_pairs,
        minhash_decontaminate,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    b16 = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.sha2(F.lower(F.trim(F.col("text"))), 256), 1, 1),
        )
        - 1
    )
    d = docs.withColumn("__b", b16)
    corpus = d.filter(F.col("__b") < 14).drop("__b")
    held = d.filter(F.col("__b") >= 14).drop("__b")
    # verbatim leak: one held-out doc re-enters the corpus as a new id
    leak = (
        held.orderBy("doc_id")
        .limit(1)
        .select(F.lit(-999).cast("long").alias("doc_id"), "text")
    )
    corpus = corpus.unionByName(leak)

    pairs = minhash_contamination_pairs(corpus, held, min_sim=0.4)
    got = {
        (r.doc_id, round(r.jaccard_sim, 4)) for r in pairs.collect()
    }
    assert (-999, 1.0) in got

    bad_ids = {r.doc_id for r in pairs.select("doc_id").distinct().collect()}
    survivors = minhash_decontaminate(corpus, held, min_sim=0.4)
    assert survivors.count() == corpus.count() - len(bad_ids)
    assert (
        survivors.filter(F.col("doc_id").isin(list(bad_ids))).count() == 0
    )


def test_semantic_decontaminate_scrubs_embedding_neighbors(spark, sf_dir):
    """Semantic decontamination (E122): a held-out embedding
    re-injected verbatim under a new id is caught at cosine 1.0 and
    scrubbed; survivors = corpus minus exactly the distinct
    contaminated ids; the IVF-blocked scale path finds a SUBSET of the
    exact pairs (cell-boundary recall), and with a single cell it
    equals the exact path."""
    from pyspark.sql import functions as F

    from datalakeingestionservice_spark.operators.similarity import (
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 8 != 0)
    held = emb.filter(F.col("vec_id") % 8 == 0)
    leak = (
        held.orderBy("vec_id")
        .limit(1)
        .select(F.lit(-999).cast("long").alias("vec_id"), "embedding")
    )
    corpus = corpus.unionByName(leak)

    pairs = semantic_contamination_pairs(corpus, held, min_cos=0.4)
    got = {(r.vec_id, round(r.cos_sim, 4)) for r in pairs.collect()}
    assert (-999, 1.0) in got

    bad = {r.vec_id for r in pairs.select("vec_id").distinct().collect()}
    survivors = semantic_decontaminate(corpus, held, min_cos=0.4)
    assert survivors.count() == corpus.count() - len(bad)
    assert survivors.filter(F.col("vec_id").isin(list(bad))).count() == 0

    # IVF-blocked path: one cell == exact; several cells == subset
    dim = len(emb.select("embedding").first()[0])
    one = spark.createDataFrame(
        [(0, [0.1] * dim)], "cid bigint, cv array<float>"
    )
    surv_one = semantic_decontaminate(
        corpus, held, min_cos=0.4, centroids=one
    )
    assert {r.vec_id for r in surv_one.collect()} == {
        r.vec_id for r in survivors.collect()
    }
    cents = spark.createDataFrame(
        [
            (i, [(1.0 if j % 4 == i else -0.5) for j in range(dim)])
            for i in range(4)
        ],
        "cid bigint, cv array<float>",
    )
    surv_blocked = semantic_decontaminate(
        corpus, held, min_cos=0.4, centroids=cents
    )
    # blocked removes a SUBSET of what exact removes -> survivors are
    # a SUPERSET of the exact survivors
    exact_surv = {r.vec_id for r in survivors.collect()}
    blocked_surv = {r.vec_id for r in surv_blocked.collect()}
    assert exact_surv <= blocked_surv
    assert -999 not in blocked_surv  # the verbatim leak shares a cell
