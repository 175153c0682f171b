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
