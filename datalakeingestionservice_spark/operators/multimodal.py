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

Codec-FREE formats get REAL kernels here and now: netpbm P6 (PPM) images —
ASCII header + raw RGB bytes — and a raw grayscale frame-concat video
container need only numpy, so `ppm_decoder` / `resize_ppm` /
`parse_video_frames` run the genuine decode → resize → feature path
end-to-end in this environment (q55/q57 value-check them against
closed-form oracles); Pillow-backed kernels stay drop-in for formats that
need external codecs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
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
        #: Exact integer pixel sum — real decoders fill it (cross-engine
        #: checkable with zero float drift); the fake decoder leaves NULL.
        StructField("px_sum", LongType()),
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
        "px_sum": None,
    }


# -- PPM (netpbm P6): a real image codec with no library dependency ---------

def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Solid-color P6 PPM. The encoder is intentionally independent of the
    parser below, so decode tests prove real header parsing + pixel math."""
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + bytes(rgb) * (width * height)


def encode_ppm_pixels(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 array -> P6 PPM bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def parse_ppm(payload: bytes) -> "np.ndarray":
    """P6 PPM bytes -> (h, w, 3) uint8 array. Handles whitespace runs and
    `#` comments in the header per the netpbm spec; only maxval 255."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval, per spec
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    if len(payload) - i < n:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(payload, dtype=np.uint8, offset=i, count=n).reshape(
        h, w, 3
    )


def ppm_decoder(payload: bytes) -> dict:
    """REAL decode + feature extraction for P6 PPM payloads: dimensions
    from the parsed header, `px_sum` as the exact integer sum of all
    samples (zero float drift — oracle-checkable), `feature_norm` as the
    mean sample scaled to [0, 1]."""
    px = parse_ppm(payload)
    h, w, c = px.shape
    total = int(px.sum(dtype=np.int64))
    return {
        "width": int(w),
        "height": int(h),
        "n_channels": int(c),
        "feature_norm": round(total / (h * w * c) / 255.0, 4),
        "px_sum": total,
    }


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of a P6 PPM, pure numpy index arithmetic:
    output pixel (x, y) samples input (x*W//width, y*H//height)."""
    px = parse_ppm(payload)
    h, w, _ = px.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm_pixels(px[ys][:, xs])


def real_decoder(payload: bytes) -> dict:  # pragma: no cover - env lacks codecs
    """Real image decode for codec-DEPENDENT formats (JPEG/PNG/WebP) —
    requires Pillow, absent in this container. For the codec-free real
    path that runs here, see `ppm_decoder`."""
    raise NotImplementedError(
        "Image codecs are not installed in this environment; "
        "use set_decoder(...) with a Pillow/torchvision-backed kernel, "
        "or ppm_decoder for P6 PPM payloads."
    )


_DECODER: Decoder = fake_decoder


def set_decoder(decoder: Decoder) -> None:
    global _DECODER
    _DECODER = decoder


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Decoder | None = None,
) -> DataFrame:
    """binary payload column -> per-item feature rows, via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the kernel loops
    within the batch (codecs are inherently per-item), but transfer and
    scheduling stay vectorized and distributed. At 100 TB this is the correct
    shape: decode parallelism == partition count, no driver involvement.

    `decoder` overrides the module default per call (e.g. `ppm_decoder`
    for the codec-free real path); it's captured at plan time and shipped
    to executors in the closure.
    """
    decoder = decoder or _DECODER

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
                "px_sum": [],
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
                out["px_sum"].append(feats.get("px_sum"))
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
    kernel: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: binary in -> binary out at (width, height).

    With `kernel` (payload, width, height) -> payload, the REAL resize
    runs — `resize_ppm` is the in-container proof (nearest-neighbor, pure
    numpy); a Pillow-backed kernel slots into the same signature. The
    default stand-in derives a deterministic resized payload (sha256 of
    payload + target dims, truncated to a dim-proportional length) so the
    plumbing — binary-to-binary columnar transfer, output size scaling with
    target dims — is exercised even without any codec.
    """

    def batch_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(8, (width * height) // 1024)
        for pdf in batches:
            ids, payloads = [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                if kernel is not None:
                    resized = kernel(raw, width, height)
                else:
                    seed = hashlib.sha256(
                        raw + f"{width}x{height}".encode()
                    ).digest()
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
        #: Exact integer sum of the frame's sample bytes — zero float
        #: drift, so real-container tests value-check cross-engine.
        StructField("frame_sum", LongType()),
    ]
)


# -- raw grayscale video container: a real frame format, no codec needed ----

def encode_video(width: int, height: int, frames: list[bytes]) -> bytes:
    """`V8 {w} {h} {n}\\n` header + n raw grayscale frames of w*h bytes."""
    if any(len(fr) != width * height for fr in frames):
        raise ValueError("every frame must be width*height bytes")
    header = f"V8 {width} {height} {len(frames)}\n".encode("ascii")
    return header + b"".join(frames)


def parse_video_frames(payload: bytes) -> list[bytes]:
    """V8 container -> list of raw frames (independent of the encoder, so
    sampling tests prove real header parsing + frame slicing)."""
    if not payload.startswith(b"V8 "):
        raise ValueError("not a V8 video payload")
    nl = payload.index(b"\n")
    w, h, n = (int(x) for x in payload[3:nl].split())
    size = w * h
    body = payload[nl + 1 :]
    if len(body) < n * size:
        raise ValueError("truncated V8 payload")
    return [body[k * size : (k + 1) * size] for k in range(n)]


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_parser: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sampling stage for video-like payloads: 1 input row -> N frame
    rows (every_n-th frame, capped at max_frames).

    `frame_parser` (payload -> all frames, in order) is the pluggable
    demuxer: `parse_video_frames` is the in-container real one (V8 raw
    grayscale); decord/ffmpeg kernels use the same signature. The default
    treats the payload as a concatenation of fixed-size 64-byte "frames".
    mapInPandas handles the 1->N fan-out natively — output batches need
    not align with input rows.
    """
    frame_size = 64

    def default_parser(raw: bytes) -> list[bytes]:
        n_frames = max(len(raw) // frame_size, 1)
        return [
            raw[k * frame_size : (k + 1) * frame_size]
            for k in range(n_frames)
        ]

    parser = frame_parser or default_parser

    def batch_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame_sha": [],
                "frame_bytes": [],
                "frame_sum": [],
            }
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                frames = parser(raw)
                taken = 0
                for idx in range(0, len(frames), every_n):
                    if taken >= max_frames:
                        break
                    frame = frames[idx]
                    out["doc_id"].append(item_id)
                    out["frame_idx"].append(idx)
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
                    out["frame_bytes"].append(len(frame))
                    out["frame_sum"].append(sum(frame))
                    taken += 1
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batch_sample, schema=FRAME_SCHEMA
    )
