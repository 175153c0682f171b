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


def test_resize_images_deterministic_and_sized(spark):
    from datalakeingestionservice_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"imagebytes")), (2, bytearray(b"imagebytes"))],
        ["doc_id", "payload"],
    )
    rows = {r.doc_id: r for r in resize_images(df, 256, 256).collect()}
    assert bytes(rows[1].payload) == bytes(rows[2].payload)  # deterministic
    assert rows[1].width == 256 and rows[1].height == 256
    small = resize_images(df, 64, 64).collect()[0]
    assert len(bytes(small.payload)) < len(bytes(rows[1].payload))


def test_sample_frames_fanout_and_cap(spark):
    from datalakeingestionservice_spark.operators.multimodal import sample_frames

    # 2000-byte payload = ~31 frames of 64B; every 10th, capped at 8 -> 4 rows.
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 8))], ["doc_id", "payload"]
    )
    rows = sample_frames(df, every_n=10, max_frames=8).collect()
    assert [r.frame_idx for r in rows] == [0, 10, 20, 30]
    assert all(r.frame_bytes == 64 for r in rows)
    # Cap respected on long payloads:
    big = spark.createDataFrame(
        [(2, bytearray(b"x" * 64 * 200))], ["doc_id", "payload"]
    )
    assert sample_frames(big, every_n=2, max_frames=8).count() == 8
