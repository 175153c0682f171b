"""Multimodal column handling: opaque binary payloads + typed metadata.

Data model (SURVEY.md C6): image/audio/video payloads are `BinaryType` columns
with a metadata struct alongside; decode/resize/frame-sample run as
Arrow-batched pandas functions over `mapInPandas`, which keeps the work
distributed, vectorized per batch, and schema-stable.

The real codecs (Pillow / torchaudio / decord) are NOT installed in this
environment, so the decode kernel is swappable: `set_decoder` plugs a real one
in; the default `fake_decoder` derives deterministic pseudo-features from the
payload bytes (sha256-seeded), so tests exercise the full Spark plumbing —
batch shapes, schema, null handling, partition parallelism — with stable
outputs. A real deployment swaps the kernel only; no plan changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode/feature-extract stage.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("feature_norm", DoubleType()),
    ]
)

Decoder = Callable[[bytes], dict]


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode + feature extraction.

    Derives (width, height, channels, feature_norm) from the sha256 of the
    payload — stable across runs/engines, no native libs required.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192  # 64..255
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 4  # 1..4
    # Pseudo feature vector norm from 8 digest bytes, scaled to [0, 8).
    norm = round(sum(digest[3:11]) / 255.0, 4)
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "feature_norm": norm,
    }


def real_decoder(payload: bytes) -> dict:  # pragma: no cover - env lacks codecs
    """Real image decode — requires Pillow, absent in this container."""
    raise NotImplementedError(
        "Image codecs are not installed in this environment; "
        "use set_decoder(...) with a Pillow/torchvision-backed kernel."
    )


_DECODER: Decoder = fake_decoder


def set_decoder(decoder: Decoder) -> None:
    global _DECODER
    _DECODER = decoder


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload column -> per-item feature rows, via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the kernel loops
    within the batch (codecs are inherently per-item), but transfer and
    scheduling stay vectorized and distributed. At 100 TB this is the correct
    shape: decode parallelism == partition count, no driver involvement.
    """
    decoder = _DECODER

    def batch_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_bytes": [],
                "content_sha": [],
                "width": [],
                "height": [],
                "n_channels": [],
                "feature_norm": [],
            }
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                feats = decoder(raw)
                out["doc_id"].append(item_id)
                out["n_bytes"].append(len(raw))
                out["content_sha"].append(hashlib.sha256(raw).hexdigest())
                out["width"].append(feats["width"])
                out["height"].append(feats["height"])
                out["n_channels"].append(feats["n_channels"])
                out["feature_norm"].append(feats["feature_norm"])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batch_decode, schema=FEATURE_SCHEMA
    )


#: Output schema of the resize stage: payload out, target dims recorded.
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stage: binary in -> binary out at (width, height).

    The stand-in "codec" derives a deterministic resized payload (sha256 of
    payload + target dims, truncated to a dim-proportional length) so the
    plumbing — binary-to-binary columnar transfer, output size scaling with
    target dims — is exercised without Pillow. A real kernel swaps in via the
    same signature.
    """

    def batch_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(8, (width * height) // 1024)
        for pdf in batches:
            ids, payloads = [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                seed = hashlib.sha256(raw + f"{width}x{height}".encode()).digest()
                resized = (seed * (out_len // len(seed) + 1))[:out_len]
                ids.append(item_id)
                payloads.append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batch_resize, schema=RESIZE_SCHEMA
    )


#: Frame-sample output: one row per sampled frame (explode-shaped).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stage for video-like payloads: 1 input row -> N frame
    rows (every_n-th frame, capped at max_frames).

    The stand-in treats the payload as a concatenation of fixed-size "frames"
    (64-byte chunks); a real decoder (decord/ffmpeg) replaces the chunker
    only. mapInPandas handles the 1->N fan-out natively — output batches need
    not align with input rows.
    """
    frame_size = 64

    def batch_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_sha": [], "frame_bytes": []}
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(len(raw) // frame_size, 1)
                taken = 0
                for idx in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    frame = raw[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(item_id)
                    out["frame_idx"].append(idx)
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
                    out["frame_bytes"].append(len(frame))
                    taken += 1
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batch_sample, schema=FRAME_SCHEMA
    )
