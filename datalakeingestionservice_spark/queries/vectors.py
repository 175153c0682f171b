"""Vector similarity search + multimodal columns (SURVEY.md C3/C4/C6).

Embeddings live as `array<float>` columns; similarity math uses built-in
higher-order functions (zip_with + aggregate) so the dot products run inside
whole-stage codegen — no Python on the hot path. The LSH variant covers the
100 TB posture where brute force is impossible.

All cosine outputs are rounded to 4 dp in both engines; the sums are 64-element
sequential folds, so Spark and DuckDB agree at that precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register

from datalakeingestionservice_spark.operators.similarity import (
    cosine as _cosine,
    dot as _dot,
    ivf_assign,
    lsh_bucket,
)

#: DuckDB-side double dot product of two float lists (sequential fold order) —
#: mirrors operators.similarity.dot exactly.
_DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


def _duck_cosine(a: str, b: str) -> str:
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


# ---------------------------------------------------------------------------
# q50 — brute-force cosine top-k (the exact baseline ANN answers are judged by).
# ---------------------------------------------------------------------------
@register(
    "q50_cosine_topk",
    headline=True,
    tags=("vectors", "similarity", "topk"),
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id, e.label AS label,
       round({_duck_cosine('e.embedding', 'q.qv')}, 4) AS cos_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
)
def q50_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 nearest neighbors of vector 0: broadcast the query vector,
    one scan, TakeOrderedAndProject — per-partition top-k then merge, never a
    global sort of all scores."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine("embedding", "qv"), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q51 — blocked near-duplicate pairs (embedding cosine, label as blocking key).
# ---------------------------------------------------------------------------
@register(
    "q51_embedding_neardup",
    tags=("vectors", "dedup", "similarity"),
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round({_duck_cosine('a.embedding', 'b.embedding')}, 4) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= 0.3
ORDER BY vec_a, vec_b
""",
)
def q51_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, blocked on label so the join is
    per-block quadratic instead of corpus-quadratic — the blocking-key pattern
    that makes semantic dedup tractable at scale (blocks from LSH/IVF in prod)."""
    from datalakeingestionservice_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    env = Env(spark, sf_dir)
    # Norm once per row: each row meets ~|block| candidate pairs, and the
    # per-pair cosine otherwise folds both sides' norms every time
    # (3 array folds + 2 sqrt -> 1 fold; bit-identical — optimization r14).
    emb = env.t("embeddings").withColumn("__nrm", norm("embedding"))
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine_prenormed(
        F.col("a.embedding"),
        F.col("b.embedding"),
        F.col("a.__nrm"),
        F.col("b.__nrm"),
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.3)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# q52 — IVF-style ANN: coarse quantize to centroids, search within the probe cell.
# ---------------------------------------------------------------------------
@register(
    "q52_ivf_ann",
    tags=("vectors", "similarity", "ann"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, label, cid, cos_sim FROM (
    SELECT e.vec_id AS vec_id, e.label AS label, c.cid AS cid,
           {_duck_cosine('e.embedding', 'c.cv')} AS cos_sim,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                                       c.cid) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
)
SELECT cid, count(*) AS n_members,
       round(avg(cos_sim), 4) AS avg_centroid_sim,
       min(vec_id) AS min_member, max(vec_id) AS max_member
FROM assigned
GROUP BY cid
ORDER BY cid
""",
)
def q52_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest of 8 fixed
    centroids (deterministic 'training': vec_id < 8). Queries then scan one
    cell (~n/8 vectors) instead of the corpus — the inverted-file ANN scheme.
    Output: per-cell occupancy stats proving the assignment."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assigned = ivf_assign(emb, centroids)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("cos_sim"), 4).alias("avg_centroid_sim"),
            F.min("vec_id").alias("min_member"),
            F.max("vec_id").alias("max_member"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# q89 — IVF probe-k search with exact re-ranking (the full ANN query path).
# ---------------------------------------------------------------------------
@register(
    "q89_ivf_probe_rank",
    tags=("vectors", "ann", "ivf", "topk"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probe_cells AS (
  SELECT cid FROM centroids CROSS JOIN q
  ORDER BY {_duck_cosine('cv', 'qv')} DESC, cid
  LIMIT 2
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                                       c.cid) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
)
SELECT a.vec_id AS vec_id, a.cid AS cell,
       round({_duck_cosine('a.embedding', 'q.qv')}, 4) AS cos_sim
FROM assigned a
JOIN probe_cells p ON a.cid = p.cid
CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
""",
)
def q89_ivf_probe_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete IVF ANN query: rank centroids against the query, probe the
    top-2 cells (~n/4 of the corpus), exact-rank only within them. Recall
    tunes with probe count; cost is cells-probed, not corpus size."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .orderBy(F.desc(_cosine("cv", "qv")), F.asc("cid"))
        .limit(2)
        .select("cid")
    )
    assigned = ivf_assign(emb, centroids)
    return (
        assigned.join(F.broadcast(probe_cells), "cid")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.col("cid").alias("cell"),
            F.round(_cosine("embedding", "qv"), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q53 — random-hyperplane LSH bucketing (deterministic planes => oracle-able).
# ---------------------------------------------------------------------------
def _hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: unit-ish vectors from a fixed
    integer recurrence (no numpy at import time; same literals in both engines)."""
    planes = []
    state = 1234567
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % 2147483648
            row.append(round((state / 2147483648.0) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes


def _planes_sql() -> str:
    rows = []
    for i, row in enumerate(_hyperplanes()):
        arr = ", ".join(repr(v) for v in row)
        rows.append(f"SELECT {i} AS plane_id, [{arr}]::DOUBLE[] AS plane")
    return " UNION ALL ".join(rows)


@register(
    "q53_lsh_buckets",
    tags=("vectors", "lsh", "ann"),
    oracle=f"""
WITH planes AS ({_planes_sql()}),
signs AS (
  SELECT e.vec_id AS vec_id, p.plane_id AS plane_id,
         CASE WHEN {_DUCK_DOT.format(a='e.embedding', b='p.plane')} >= 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
buckets AS (
  SELECT vec_id,
         CAST(sum(bit * CAST(pow(2, plane_id) AS BIGINT)) AS BIGINT) AS bucket
  FROM signs GROUP BY vec_id
)
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec
FROM buckets
GROUP BY bucket
ORDER BY bucket
""",
)
def q53_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH: 8 fixed hyperplanes -> 8 sign bits -> 256
    buckets. Similar vectors collide; candidate generation is then a bucket
    equi-join (shuffle on a byte) instead of any pairwise work. Hyperplanes are
    deterministic literals, so DuckDB reproduces the bucketing exactly."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    return (
        lsh_bucket(emb, _hyperplanes())
        .select("vec_id", "bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q90 — product quantization: encode + asymmetric-distance ranking.
# ---------------------------------------------------------------------------
_PQ_DUCK_SUBDOT = (
    "list_sum(list_transform(list_zip({a}[{lo}:{hi}], {b}[{lo}:{hi}]),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


@register(
    "q90_product_quantization",
    tags=("vectors", "ann", "pq"),
    oracle=f"""
WITH codebook AS (
  SELECT vec_id AS code, embedding FROM embeddings WHERE vec_id < 4
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
encoded AS (
  SELECT vec_id, c1, c2 FROM (
    SELECT e.vec_id AS vec_id, cb1.code AS c1, cb2.code AS c2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_PQ_DUCK_SUBDOT.format(a='e.embedding', b='cb1.embedding', lo=1, hi=32)} DESC,
                      cb1.code
           ) AS rn1,
           row_number() OVER (
             PARTITION BY e.vec_id, cb1.code
             ORDER BY {_PQ_DUCK_SUBDOT.format(a='e.embedding', b='cb2.embedding', lo=33, hi=64)} DESC,
                      cb2.code
           ) AS rn2
    FROM embeddings e
    CROSS JOIN codebook cb1 CROSS JOIN codebook cb2
  ) WHERE rn1 = 1 AND rn2 = 1
),
adc AS (
  SELECT enc.vec_id AS vec_id, enc.c1 AS c1, enc.c2 AS c2,
         round({_PQ_DUCK_SUBDOT.format(a='cb1.embedding', b='q.qv', lo=1, hi=32)}
               + {_PQ_DUCK_SUBDOT.format(a='cb2.embedding', b='q.qv', lo=33, hi=64)}, 4)
           AS approx_dot
  FROM encoded enc
  JOIN codebook cb1 ON enc.c1 = cb1.code
  JOIN codebook cb2 ON enc.c2 = cb2.code
  CROSS JOIN q
)
SELECT c1, c2, count(*) AS n_vectors, round(avg(approx_dot), 4) AS avg_approx_dot
FROM adc
GROUP BY c1, c2
ORDER BY c1, c2
""",
)
def q90_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim vectors split into two 32-dim subspaces,
    each encoded to its nearest of 4 sub-codebook entries (here: subvectors of
    vecs 0-3 as the deterministic 'trained' codebook) — 2 bytes per vector.
    Query-time ADC: the query's dot with each codeword is computed ONCE (a
    16-entry table), then every vector's approximate score is a 2-term table
    lookup — memory-bandwidth search over compressed codes. Output: code-cell
    occupancy + mean approximate score per cell."""
    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    sub1 = lambda c: F.slice(F.col(c), 1, 32)  # noqa: E731
    sub2 = lambda c: F.slice(F.col(c), 33, 32)  # noqa: E731

    codebook = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("code"), F.col("embedding").alias("cv")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    cb1 = codebook.select("code", sub1("cv").alias("cw1"))
    cb2 = codebook.select(F.col("code").alias("code2"), sub2("cv").alias("cw2"))

    from pyspark.sql.window import Window

    scored = (
        emb.crossJoin(F.broadcast(cb1))
        .crossJoin(F.broadcast(cb2))
        .select(
            "vec_id",
            "code",
            "code2",
            _dot(sub1("embedding"), F.col("cw1")).alias("d1"),
            _dot(sub2("embedding"), F.col("cw2")).alias("d2"),
        )
    )
    w1 = Window.partitionBy("vec_id").orderBy(F.desc("d1"), F.asc("code"))
    w2 = Window.partitionBy("vec_id", "code").orderBy(
        F.desc("d2"), F.asc("code2")
    )
    encoded = (
        scored.withColumn("rn1", F.row_number().over(w1))
        .withColumn("rn2", F.row_number().over(w2))
        .filter((F.col("rn1") == 1) & (F.col("rn2") == 1))
        .select("vec_id", F.col("code").alias("c1"), F.col("code2").alias("c2"))
    )
    # ADC table: query dot each codeword (broadcast; 16 entries at 4x4 codes).
    adc1 = cb1.crossJoin(F.broadcast(q)).select(
        "code", _dot("cw1", sub1("qv")).alias("t1")
    )
    adc2 = cb2.crossJoin(F.broadcast(q)).select(
        "code2", _dot("cw2", sub2("qv")).alias("t2")
    )
    return (
        encoded.join(F.broadcast(adc1), encoded.c1 == adc1.code)
        .join(F.broadcast(adc2), encoded.c2 == adc2.code2)
        .select(
            "vec_id", "c1", "c2",
            F.round(F.col("t1") + F.col("t2"), 4).alias("approx_dot"),
        )
        .groupBy("c1", "c2")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("approx_dot"), 4).alias("avg_approx_dot"),
        )
        .orderBy("c1", "c2")
    )


# ---------------------------------------------------------------------------
# q54 — multimodal metadata over opaque binary payloads.
# ---------------------------------------------------------------------------
@register(
    "q54_multimodal_binary_meta",
    tags=("multimodal", "binary"),
    oracle="""
SELECT source,
       count(*) AS n_blobs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT sha256(text)) AS n_unique_blobs,
       round(avg(octet_length(encode(text))), 2) AS avg_bytes
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q54_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal data model: payloads as opaque `binary` columns with typed
    metadata alongside. Byte length + content hash + per-source stats — the
    manifest pass of an image/audio pipeline (decode stage: see
    operators/multimodal.py, exercised by q55)."""
    env = Env(spark, sf_dir)
    blob = F.col("text").cast("binary")
    return (
        env.t("documents")
        .select("source", blob.alias("payload"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.countDistinct(F.sha2("payload", 256)).alias("n_unique_blobs"),
            F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q55 — multimodal decode → resize → feature-extract, REAL kernels end to
# end: deterministic P6 PPM images synthesized per doc_id (encoder), parsed
# by an independent decoder, nearest-neighbor-resized, re-decoded — all
# numpy inside mapInPandas. Every output is integer arithmetic on doc_id,
# so the DuckDB oracle value-checks the whole chain in closed form.
# ---------------------------------------------------------------------------
@register(
    "q55_multimodal_decode_features",
    tags=("multimodal", "pandas-udf"),
    oracle="""
SELECT doc_id,
       CAST(4 + doc_id % 13 AS INTEGER) AS width,
       CAST(3 + doc_id % 7 AS INTEGER) AS height,
       3 AS n_channels,
       CAST(((doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256))
            * (4 + doc_id % 13) * (3 + doc_id % 7) AS BIGINT) AS px_sum,
       CAST(((doc_id % 256) + (doc_id * 7 % 256) + (doc_id * 13 % 256))
            * 48 AS BIGINT) AS resized_px_sum
FROM documents
ORDER BY doc_id
""",
)
def q55_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize → features with the codec-free REAL kernels
    (operators/multimodal.py `ppm_decoder` / `resize_ppm`): each doc gets a
    solid-color PPM whose dims and color derive from doc_id, the decoder
    re-derives them by actually parsing the bytes, and an 8×6
    nearest-neighbor resize is re-decoded to prove the full chain. Solid
    color makes every feature an exact integer (px_sum = (r+g+b)·w·h), so
    the oracle checks values, not just shapes — upgraded from the
    rows-only entry the stubbed codecs used to force."""
    import pandas as pd

    from datalakeingestionservice_spark.operators.multimodal import (
        decode_features,
        encode_ppm,
        ppm_decoder,
        resize_images,
        resize_ppm,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            payloads = [
                encode_ppm(
                    4 + int(d) % 13,
                    3 + int(d) % 7,
                    (int(d) % 256, int(d) * 7 % 256, int(d) * 13 % 256),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    feats = decode_features(blobs, decoder=ppm_decoder).select(
        "doc_id", "width", "height", "n_channels", "px_sum"
    )
    resized = resize_images(blobs, 8, 6, kernel=resize_ppm)
    rfeats = decode_features(resized, decoder=ppm_decoder).select(
        "doc_id", F.col("px_sum").alias("resized_px_sum")
    )
    return feats.join(rfeats, "doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q57 — multimodal frame sampling (1 -> N fan-out through mapInPandas),
# REAL container: V8 raw grayscale frames demuxed by header parsing, frame
# sums integer-exact, closed-form oracle.
# ---------------------------------------------------------------------------
@register(
    "q57_multimodal_frame_sample",
    tags=("multimodal", "pandas-udf", "video"),
    oracle="""
SELECT doc_id,
       k AS frame_idx,
       CAST(20 AS BIGINT) AS frame_bytes,
       CAST(((doc_id * 3 + k) % 251) * 20 AS BIGINT) AS frame_sum
FROM documents, (VALUES (0), (2), (4), (6)) AS t(k)
ORDER BY doc_id, frame_idx
""",
)
def q57_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling with the REAL demuxer
    (operators/multimodal.py `parse_video_frames`): each doc gets an
    8-frame 5×4 grayscale V8 payload (frame k solid at (doc_id·3+k) mod
    251), the sampler parses the container and keeps every 2nd frame
    capped at 4, and frame sums are exact integers the oracle re-derives
    per (doc_id, k) — value-checked, not rows-only."""
    import pandas as pd

    from datalakeingestionservice_spark.operators.multimodal import (
        encode_video,
        parse_video_frames,
        sample_frames,
    )

    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id")
    w, h, n_frames = 5, 4, 8

    def synth(batches):
        for pdf in batches:
            payloads = [
                encode_video(
                    w,
                    h,
                    [
                        bytes([(int(d) * 3 + k) % 251]) * (w * h)
                        for k in range(n_frames)
                    ],
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return (
        sample_frames(
            blobs, every_n=2, max_frames=4, frame_parser=parse_video_frames
        )
        .select("doc_id", "frame_idx", "frame_bytes", "frame_sum")
        .orderBy("doc_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# q119 — hybrid retrieval: BM25 (lexical) + cosine (vector) fused with RRF.
# ---------------------------------------------------------------------------
@register(
    "q119_hybrid_rrf",
    tags=("vectors", "text", "hybrid", "rrf", "search"),
    oracle=f"""
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
lex AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
         ), 4) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY tf.doc_id
  ORDER BY score DESC, tf.doc_id
  LIMIT 50
),
lexr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
  FROM lex
),
vec AS (
  SELECT e.vec_id AS doc_id,
         round({_duck_cosine('e.embedding', 'q.qv')}, 4) AS cos_sim
  FROM embeddings e
  CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id <> 0
  ORDER BY cos_sim DESC, doc_id
  LIMIT 50
),
vecr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank
  FROM vec
)
SELECT coalesce(lexr.doc_id, vecr.doc_id) AS doc_id,
       lex_rank, vec_rank,
       round(coalesce(1.0 / (60 + lex_rank), 0.0)
             + coalesce(1.0 / (60 + vec_rank), 0.0), 6) AS rrf_score
FROM lexr
FULL OUTER JOIN vecr ON lexr.doc_id = vecr.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 20
""",
)
def q119_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the modern retrieval default: BM25 lexical top-50
    (q118's operator) and exact cosine vector top-50 (q50's shape) fused
    by reciprocal-rank (RRF, k=60) — rank-based fusion needs no score
    calibration between the two systems. Scale: both legs end in
    TakeOrderedAndProject top-50s, so the fusion join is 50x50 driver-tiny
    regardless of corpus size; ranks are assigned over 4dp-rounded scores
    so every cutoff is engine-reproducible."""
    from pyspark.sql import Window

    from datalakeingestionservice_spark.operators.text import bm25_rank

    env = Env(spark, sf_dir)

    lex = bm25_rank(
        env.t("documents"), ["spark", "vector", "stream"], top_k=50
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("lex_rank"),
    )

    emb = env.t("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    vec = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(_cosine("embedding", "qv"), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(50)
    )
    vecr = vec.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .cast("long")
        .alias("vec_rank"),
    )

    rrf = F.round(
        F.coalesce(1.0 / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)),
        6,
    )
    return (
        lexr.join(vecr, "doc_id", "full_outer")
        .select("doc_id", "lex_rank", "vec_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q158 — SemDeDup: cluster-then-prune embedding dedup (the scale path for
# semantic dedup at trillion-token corpora — per-cluster quadratic only).
# ---------------------------------------------------------------------------
@register(
    "q158_semantic_dedup",
    tags=("vectors", "dedup", "semdedup", "clustering"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                                       c.cid) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS drop_id, a.cid AS cid
  FROM assigned a
  JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= 0.4
),
dropped AS (
  SELECT drop_id, cid, min(keep_id) AS dup_of
  FROM pairs GROUP BY drop_id, cid
)
SELECT s.cid AS cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(d.drop_id) AS BIGINT) AS n_dropped,
       CAST(coalesce(sum(d.drop_id), 0) AS BIGINT) AS drop_id_sum,
       CAST(coalesce(sum(d.dup_of), 0) AS BIGINT) AS anchor_sum
FROM assigned s
LEFT JOIN dropped d ON s.vec_id = d.drop_id
GROUP BY s.cid
ORDER BY cid
""",
)
def q158_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its
    nearest of 8 deterministic centroids (vec_id < 8, same convention
    as q52), compute pairwise cosine ONLY within each cluster, and
    greedily drop the higher-id member of every pair at cosine >= 0.4
    — keep-lowest-index, so the survivor set is exactly recomputable
    by the DuckDB oracle. Output is the per-cluster dedup ledger:
    member count, dropped count, and id/anchor checksums that pin the
    exact survivor set, not just its size. The 0.4 threshold sits in
    the tail of this synthetic corpus's cosine distribution (random
    L2-normalized gaussians have no true semantic dups; production
    embeddings use ~0.9); the MACHINERY is scale-shaped either way:
    centroids broadcast, cluster assignment is one map-side-combined
    argmin aggregate (q52's min_by shape, never a row_number exchange),
    and the self-join is cluster-keyed — Σ|cluster|² work, not
    |corpus|², the published recipe with k-means centroids at k≈√N."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_dedup,
    )

    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    # persist=True: assigned feeds both self-join sides, the survivor
    # anti-join, AND the members union — 4 re-executions of the
    # broadcast-crossJoin + argmin subtree without it (optimization r14:
    # q158 11.6 -> ~2 s at sf0.1).
    survivors, dropped = semantic_dedup(
        emb, cents, threshold=0.4, persist=True
    )
    members = survivors.select("vec_id", "cid").unionByName(
        dropped.select("vec_id", "cid")
    )
    return (
        members.join(
            dropped.select(
                F.col("vec_id").alias("__d"), "dup_of"
            ),
            members.vec_id == F.col("__d"),
            "left",
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("__d").alias("n_dropped"),
            F.coalesce(F.sum("__d"), F.lit(0))
            .cast("long")
            .alias("drop_id_sum"),
            F.coalesce(F.sum("dup_of"), F.lit(0))
            .cast("long")
            .alias("anchor_sum"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# q170 — IVF recall@k vs the exact ranking (VERDICT r9 #2): the ANN QUALITY
# surface. q52/q89 value-check what IVF returns; this value-checks how GOOD
# it is — per-query-vector recall@10 at two probe settings, the number a
# real user sizes n_probe with. Both rankings round cosine to 6 dp before
# ordering (ties on vec_id), so membership of the intersected sets is
# engine-reproducible; the oracle recomputes ground truth, assignment,
# probing, and the intersection from raw vectors.
# ---------------------------------------------------------------------------
@register(
    "q170_ivf_recall_at_k",
    tags=("vectors", "ann", "ivf", "recall", "quality"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
queries AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5
),
probes AS (SELECT CAST(1 AS INTEGER) AS n_probe
           UNION ALL SELECT CAST(3 AS INTEGER)),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid AS qid, e.vec_id AS vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({_duck_cosine('e.embedding', 'q.qv')}, 6) DESC,
                      e.vec_id) AS rn
    FROM embeddings e CROSS JOIN queries q
    WHERE e.vec_id <> q.qid
  ) WHERE rn <= 10
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                      c.cid) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
),
cent_rank AS (
  SELECT qid, cid,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY round({_duck_cosine('cv', 'qv')}, 6) DESC, cid) AS crn
  FROM centroids CROSS JOIN queries
),
probe_cells AS (
  SELECT qid, n_probe, cid FROM cent_rank CROSS JOIN probes
  WHERE crn <= n_probe
),
approx AS (
  SELECT qid, n_probe, vec_id FROM (
    SELECT p.qid AS qid, p.n_probe AS n_probe, a.vec_id AS vec_id,
           row_number() OVER (
             PARTITION BY p.qid, p.n_probe
             ORDER BY round({_duck_cosine('a.embedding', 'q.qv')}, 6) DESC,
                      a.vec_id) AS rn
    FROM assigned a
    JOIN probe_cells p ON a.cid = p.cid
    JOIN queries q ON q.qid = p.qid
    WHERE a.vec_id <> p.qid
  ) WHERE rn <= 10
),
hits AS (
  SELECT x.qid, x.n_probe, count(*) AS n_hits
  FROM approx x JOIN exact e ON x.qid = e.qid AND x.vec_id = e.vec_id
  GROUP BY x.qid, x.n_probe
),
grid AS (SELECT qid, n_probe FROM queries CROSS JOIN probes)
SELECT g.qid AS query_id, g.n_probe AS n_probe,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / 10.0, 4) AS recall
FROM grid g
LEFT JOIN hits h ON g.qid = h.qid AND g.n_probe = h.n_probe
ORDER BY query_id, n_probe
""",
)
def q170_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF probe search (8 fixed centroids, n_probe in
    {1, 3}) against exact brute force, for 5 query vectors. Ground
    truth is brute force by definition, so the exact side runs on the
    query SAMPLE only (|corpus| x 5 rows through one window); the IVF
    side stays cells-probed-sized. Monotone in n_probe and exact at
    n_probe = n_cells — both pinned in pytest
    (tests/test_operators.py::test_ivf_recall_monotone_in_probes)."""
    from datalakeingestionservice_spark.operators.similarity import (
        ivf_recall,
    )

    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return ivf_recall(emb, centroids, queries, k=10, probes=(1, 3)).select(
        F.col("qid").alias("query_id"), "n_probe", "n_hits", "recall"
    )


# ---------------------------------------------------------------------------
# q174 — multi-probe LSH top-k (Lv et al. 2007 on the q53 sign family):
# probe the query's bucket plus all 8 Hamming-distance-1 buckets and rank
# exactly within the candidates. Deterministic planes => DuckDB recomputes
# bits, buckets, the probe set, and the ranking exactly.
# ---------------------------------------------------------------------------
@register(
    "q174_lsh_multiprobe_topk",
    tags=("vectors", "lsh", "ann", "topk", "multiprobe"),
    oracle=f"""
WITH planes AS ({_planes_sql()}),
signs AS (
  SELECT e.vec_id AS vec_id, p.plane_id AS plane_id,
         CASE WHEN {_DUCK_DOT.format(a='e.embedding', b='p.plane')} >= 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
buckets AS (
  SELECT vec_id,
         CAST(sum(bit * CAST(pow(2, plane_id) AS BIGINT)) AS BIGINT) AS bucket
  FROM signs GROUP BY vec_id
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT bucket AS qbkt FROM buckets WHERE vec_id = 0),
probes AS (
  SELECT qbkt AS bucket FROM qb
  UNION
  SELECT xor(qbkt, CAST(pow(2, u.i) AS BIGINT)) AS bucket
  FROM qb CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) u
),
cand AS (
  SELECT e.vec_id AS vec_id, b.bucket AS bucket,
         round({_duck_cosine('e.embedding', 'q.qv')}, 6) AS cos_sim
  FROM embeddings e
  JOIN buckets b USING (vec_id)
  JOIN probes p ON b.bucket = p.bucket
  CROSS JOIN q
  WHERE e.vec_id <> 0
)
SELECT vec_id, bucket, cos_sim FROM cand
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
)
def q174_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: the query's own bucket plus its 8
    single-bit-flip neighbors (Hamming distance 1) supply the candidate
    set — near-misses land one sign flip away, so recall rises without
    more hash tables while cost stays ~9/256 of the corpus. Exact
    cosine ranking within candidates; the probe set broadcasts and
    candidates come from a bucket equi-join."""
    from datalakeingestionservice_spark.operators.similarity import (
        lsh_multiprobe_topk,
    )

    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    return lsh_multiprobe_topk(
        emb.filter(F.col("vec_id") != 0), q, _hyperplanes(), k=10
    )


# ---------------------------------------------------------------------------
# q182 — INCREMENTALLY-MAINTAINED IVF INDEX from the change feed (E110): the
# composition a mutating vector corpus needs — the (vec_id, cid) assignment
# table is a CDC-maintained view of ivf_assign (deletes remove, updates
# reassign, inserts assign against broadcast centroids; refresh ∝ |Δ|, never
# a corpus rescan), and the probe search runs over the MAINTAINED index.
# The oracle recomputes the mutated corpus's assignment + probe search from
# scratch, so the whole maintenance-then-serve path sits behind the value
# check.
# ---------------------------------------------------------------------------
@register(
    "q182_incremental_ivf_index",
    tags=("vectors", "ann", "ivf", "incremental-view", "cdf"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
emb1 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 11 = 4
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 7 <> 3
  UNION ALL
  SELECT vec_id + 1000000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 13 = 6
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probe_cells AS (
  SELECT cid FROM centroids CROSS JOIN q
  ORDER BY {_duck_cosine('cv', 'qv')} DESC, cid
  LIMIT 2
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                                       c.cid) AS rn
    FROM emb1 e CROSS JOIN centroids c
  ) WHERE rn = 1
)
SELECT a.vec_id AS vec_id, a.cid AS cell,
       round({_duck_cosine('a.embedding', 'q.qv')}, 4) AS cos_sim
FROM assigned a
JOIN probe_cells p ON a.cid = p.cid
CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
""",
)
def q182_incremental_ivf_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF index maintained from DML, then served: copy embeddings
    into a versioned table, bootstrap the index, mutate the corpus
    (negate every %11=4 vector — forcing reassignments; delete %7=3;
    insert %13=6 twins under new ids), ONE incremental refresh (cost
    ∝ |Δ| — pinned by tests/test_ivf_index.py's no-source-snapshot
    spy), and probe-search the MAINTAINED index with q89's query path.
    Centroids stay the original vec_id<8 vectors (fixed training, like
    a FAISS index — retraining is a rebuild)."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.ivf_index import (
        IncrementalIVFIndex,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ivfidx_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    emb = env.t("embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    src = VersionedTable.create(spark, os.path.join(base, "emb"), emb)
    idx = IncrementalIVFIndex(
        spark, src.root, os.path.join(base, "idx"), centroids
    )
    assert idx.refresh() == 1  # bootstrap at v1

    twins = emb.filter(F.col("vec_id") % 13 == 6).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )
    src.update_where(
        F.col("vec_id") % 11 == 4,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.delete_where(F.col("vec_id") % 7 == 3)
    src.append(twins)
    assert idx.refresh() == 4  # ONE incremental refresh drains all 3
    assert idx.refresh() is None  # idempotent

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    return idx.topk(q, k=5, n_probe=2, exclude_ids=[0])


# ---------------------------------------------------------------------------
# q194 — SEMANTIC decontamination vs a held-out split (E122): the third
# member of the decontamination family — verbatim (q172, exact-substring),
# fuzzy lexical (q191, MinHash), and this: corpus vectors whose embedding
# cosine against ANY held-out vector reaches the threshold. Rephrasings
# that share no n-grams but embed next to an eval document. The held-out
# side broadcasts whole; the corpus is scanned once, dot products inside
# whole-stage codegen. Oracle recomputes the split and every cosine in
# DuckDB with the same sequential double fold.
# ---------------------------------------------------------------------------
_Q194_TAU = 0.4

@register(
    "q194_semantic_decontamination",
    tags=("vectors", "similarity", "decontamination", "curation"),
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 8 <> 0
),
held AS (
  SELECT vec_id AS heldout_id, embedding AS hv
  FROM embeddings WHERE vec_id % 8 = 0
)
SELECT c.vec_id AS vec_id, h.heldout_id AS heldout_id,
       round({_duck_cosine('c.embedding', 'h.hv')}, 4) AS cos_sim
FROM corpus c CROSS JOIN held h
WHERE {_duck_cosine('c.embedding', 'h.hv')} >= {_Q194_TAU}
ORDER BY vec_id, heldout_id
""",
)
def q194_semantic_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic contamination pairs across a held-out split (vec_id %
    8 == 0 is the eval side): corpus embeddings scoring cosine >= 0.4
    against any held-out embedding. The doc-level scrub
    (`semantic_decontaminate`) anti-joins these ids — its survivor
    invariant and the IVF-blocked scale path are pinned in pytest."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_contamination_pairs,
    )

    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    corpus = emb.filter(F.col("vec_id") % 8 != 0)
    held = emb.filter(F.col("vec_id") % 8 == 0)
    pairs = semantic_contamination_pairs(
        corpus, held, min_cos=_Q194_TAU
    )
    return pairs.select(
        "vec_id", "heldout_id",
        F.round("cos_sim", 4).alias("cos_sim"),
    ).orderBy("vec_id", "heldout_id")


# ---------------------------------------------------------------------------
# q196 — IVF-BLOCKED semantic decontamination (E122's scale path, value-
# checked): both sides quantize to shared centroids (argmax cosine, cid
# tie-break) and only SAME-CELL pairs score — the DuckDB oracle recomputes
# the cell assignment with the identical ordering and the same sequential
# double folds, so the blocked candidate set and every surviving cosine
# hash-match. The recall trade vs the exact q194 is the IVF contract.
# ---------------------------------------------------------------------------
@register(
    "q196_semantic_decontamination_ivf",
    tags=("vectors", "similarity", "decontamination", "ivf", "curation"),
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id >= 8 AND vec_id % 8 <> 0
),
held AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id >= 8 AND vec_id % 8 = 0
),
cassign AS (
  SELECT vec_id, cid FROM (
    SELECT c.vec_id, k.cid,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_duck_cosine('c.embedding', 'k.cv')} DESC, k.cid
           ) AS rn
    FROM corpus c CROSS JOIN cents k
  ) WHERE rn = 1
),
hassign AS (
  SELECT vec_id, cid FROM (
    SELECT h.vec_id, k.cid,
           row_number() OVER (
             PARTITION BY h.vec_id
             ORDER BY {_duck_cosine('h.embedding', 'k.cv')} DESC, k.cid
           ) AS rn
    FROM held h CROSS JOIN cents k
  ) WHERE rn = 1
)
SELECT c.vec_id AS vec_id, h.vec_id AS heldout_id,
       round({_duck_cosine('c.embedding', 'h.embedding')}, 4) AS cos_sim
FROM cassign ca
JOIN hassign ha ON ca.cid = ha.cid
JOIN corpus c ON c.vec_id = ca.vec_id
JOIN held h ON h.vec_id = ha.vec_id
WHERE {_duck_cosine('c.embedding', 'h.embedding')} >= {_Q194_TAU}
ORDER BY vec_id, heldout_id
""",
)
def q196_semantic_decontamination_ivf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The blocked scale path of semantic decontamination as a
    value-checked query: 8 shared centroids (the first 8 vectors),
    both sides assigned by broadcast argmax-cosine (cid tie-break,
    one map-side-combined aggregate per side), candidates from the
    same-cell equi-join only — never corpus × held-out. Pairs at
    cosine >= 0.4; a subset of q194's exact pairs by construction
    (the IVF recall trade, pinned in pytest)."""
    from datalakeingestionservice_spark.operators.similarity import (
        semantic_contamination_pairs,
    )

    env = Env(spark, sf_dir)
    emb = env.t("embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    rest = emb.filter(F.col("vec_id") >= 8)
    corpus = rest.filter(F.col("vec_id") % 8 != 0)
    held = rest.filter(F.col("vec_id") % 8 == 0)
    pairs = semantic_contamination_pairs(
        corpus, held, min_cos=_Q194_TAU, centroids=cents
    )
    return pairs.select(
        "vec_id", "heldout_id",
        F.round("cos_sim", 4).alias("cos_sim"),
    ).orderBy("vec_id", "heldout_id")


# ---------------------------------------------------------------------------
# q203 — MAINTAINED IVF INDEX SERVES LIKE AN INDEX (r13): the serving
# half of E110 under the plan audit. The assignment table is
# identity-partitioned by cell, and topk() plans its scan through
# `read(predicates=[(cid, "in", probed_cells)])` — an n_probe=2 search
# derives LEAF pruning from its probed cells and scans only those
# cells' dirs, never the whole assignment. Ranking sits behind the
# oracle (DuckDB recomputes assignment + probe over the mutated
# corpus); the pruning facts ride as booleans from the SAME prune_info
# the planner uses (q129/q137 pattern):
#   probe_pruned_ok   — more assignment leaves skipped than scanned
#   scan_minority_ok  — 2 probed cells of 8 plan a strict-minority scan
# ---------------------------------------------------------------------------
@register(
    "q203_ivf_index_serving_prune",
    tags=("vectors", "ann", "ivf", "lake", "data-skipping"),
    oracle=f"""
WITH centroids AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
),
emb1 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 11 = 4
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 7 <> 3
  UNION ALL
  SELECT vec_id + 1000000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 13 = 6
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probe_cells AS (
  SELECT cid FROM centroids CROSS JOIN q
  ORDER BY {_duck_cosine('cv', 'qv')} DESC, cid
  LIMIT 2
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id AS vec_id, e.embedding AS embedding, c.cid AS cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cosine('e.embedding', 'c.cv')} DESC,
                                       c.cid) AS rn
    FROM emb1 e CROSS JOIN centroids c
  ) WHERE rn = 1
)
SELECT a.vec_id AS vec_id, a.cid AS cell,
       round({_duck_cosine('a.embedding', 'q.qv')}, 4) AS cos_sim,
       TRUE AS probe_pruned_ok, TRUE AS scan_minority_ok
FROM assigned a
JOIN probe_cells p ON a.cid = p.cid
CROSS JOIN q
WHERE a.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
""",
)
def q203_ivf_index_serving_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q182's maintain-then-serve pipeline with the serving PLAN under
    test: bootstrap the cell-partitioned index, mutate the corpus
    (reassigning updates / deletes / inserts), ONE incremental
    refresh, then probe-search with n_probe=2 — and pin, from the same
    prune_info the pruned read plans with, that the probe skipped more
    assignment leaves than it scanned and scanned a strict minority of
    the index."""
    import os
    import tempfile
    import uuid

    from datalakeingestionservice_spark.sinks.ivf_index import (
        IncrementalIVFIndex,
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        VersionedTable,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ivfprune_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    emb = env.t("embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    src = VersionedTable.create(spark, os.path.join(base, "emb"), emb)
    idx = IncrementalIVFIndex(
        spark, src.root, os.path.join(base, "idx"), centroids
    )
    idx.refresh()

    twins = emb.filter(F.col("vec_id") % 13 == 6).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )
    src.update_where(
        F.col("vec_id") % 11 == 4,
        {"embedding": F.transform(F.col("embedding"), lambda x: -x)},
    )
    src.delete_where(F.col("vec_id") % 7 == 3)
    src.append(twins)
    idx.refresh()

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    info = idx.serving_prune_info(q, n_probe=2)
    total = info["n_scanned"] + info["n_skipped"]
    return idx.topk(q, k=5, n_probe=2, exclude_ids=[0]).select(
        "vec_id",
        "cell",
        "cos_sim",
        F.lit(
            info["n_skipped"] > info["n_scanned"] > 0
        ).alias("probe_pruned_ok"),
        F.lit(info["n_scanned"] * 2 < total).alias("scan_minority_ok"),
    )
