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


# -- codec-free REAL kernels: PPM images, V8 video ---------------------------


def test_ppm_roundtrip_and_decode():
    import numpy as np

    from datalakeingestionservice_spark.operators.multimodal import (
        encode_ppm,
        encode_ppm_pixels,
        parse_ppm,
        ppm_decoder,
    )

    # Gradient image: every pixel distinct, so a parse/layout bug can't
    # cancel out in the sum.
    px = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (parse_ppm(encode_ppm_pixels(px)) == px).all()

    feats = ppm_decoder(encode_ppm(4, 3, (10, 20, 30)))
    assert feats["width"] == 4 and feats["height"] == 3
    assert feats["n_channels"] == 3
    assert feats["px_sum"] == (10 + 20 + 30) * 12
    assert feats["feature_norm"] == round(60 / 3 / 255.0, 4)


def test_ppm_header_comments_and_errors():
    import pytest

    from datalakeingestionservice_spark.operators.multimodal import parse_ppm

    # netpbm allows comments anywhere in the header.
    body = bytes(range(2 * 2 * 3))
    assert parse_ppm(b"P6\n# a comment\n2 2\n255\n" + body).shape == (2, 2, 3)
    with pytest.raises(ValueError):
        parse_ppm(b"P5\n2 2\n255\n" + body)  # wrong magic
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n2 2\n255\n" + body[:5])  # truncated


def test_resize_ppm_matches_numpy_reference():
    import numpy as np

    from datalakeingestionservice_spark.operators.multimodal import (
        encode_ppm_pixels,
        parse_ppm,
        resize_ppm,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 16, 3), dtype=np.uint8)
    out = parse_ppm(resize_ppm(encode_ppm_pixels(px), 5, 4))
    ys = (np.arange(4) * 10) // 4
    xs = (np.arange(5) * 16) // 5
    assert (out == px[ys][:, xs]).all()
    # Identity resize is exact.
    ident = parse_ppm(resize_ppm(encode_ppm_pixels(px), 16, 10))
    assert (ident == px).all()


def test_video_container_roundtrip_and_sampling(spark):
    from datalakeingestionservice_spark.operators.multimodal import (
        encode_video,
        parse_video_frames,
        sample_frames,
    )

    frames = [bytes([k * 10]) * 6 for k in range(5)]
    payload = encode_video(3, 2, frames)
    assert parse_video_frames(payload) == frames

    df = spark.createDataFrame([(1, bytearray(payload))], ["doc_id", "payload"])
    rows = sample_frames(
        df, every_n=2, max_frames=4, frame_parser=parse_video_frames
    ).collect()
    assert [(r.frame_idx, r.frame_sum) for r in rows] == [
        (0, 0),
        (2, 120),
        (4, 240),
    ]
    assert all(r.frame_bytes == 6 for r in rows)


def test_decode_features_real_ppm_kernel_distributed(spark):
    from datalakeingestionservice_spark.operators.multimodal import (
        decode_features,
        encode_ppm,
        ppm_decoder,
    )

    rows = [(i, bytearray(encode_ppm(2 + i, 3, (i, i, i)))) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"]).repartition(4)
    got = {
        r.doc_id: r for r in decode_features(df, decoder=ppm_decoder).collect()
    }
    for i in range(20):
        assert got[i].width == 2 + i and got[i].height == 3
        assert got[i].px_sum == 3 * i * (2 + i) * 3
