"""Multimodal decode plumbing: schema stability, determinism, null handling."""

from __future__ import annotations

from datalakeingestionservice_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    fake_decoder,
)


def test_fake_decoder_deterministic():
    a = fake_decoder(b"hello")
    b = fake_decoder(b"hello")
    assert a == b
    assert 64 <= a["width"] <= 255 and 1 <= a["n_channels"] <= 4


def test_decode_features_schema_and_values(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, None)],
        ["doc_id", "payload"],
    )
    out = decode_features(df)
    assert out.schema == FEATURE_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 3
    assert rows[1].content_sha == __import__("hashlib").sha256(b"abc").hexdigest()
    # None payload treated as empty bytes — stable, no crash:
    assert rows[3].n_bytes == 0
    assert rows[2].content_sha == rows[3].content_sha


def test_decode_features_distributed_partitions(spark):
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "CAST(CAST(id AS STRING) AS BINARY) AS payload"
    ).repartition(8)
    out = decode_features(df)
    assert out.count() == 100
