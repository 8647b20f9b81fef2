"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas UDFs / mapInPandas. The actual codecs (Pillow, ffmpeg,
torchaudio, ...) are NOT available in this container, so the decode kernels
are deterministic STUBS behind the same signatures real decoders would use:
the Spark-side plumbing — schemas, batch iteration, partitioning, output
shapes — is real and tested, and swapping in a real decoder changes only the
body of ``_decode_*``.

Fake media format (so stubs are deterministic and testable):
  image: b"IMG1" + width:uint16 + height:uint16 + payload
  audio: b"AUD1" + sample_rate:uint32 + n_samples:uint32 + payload
  video: b"VID1" + n_frames:uint32 + fps:uint8 + payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("source_url", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = "media_id long, width int, height int, n_bytes int, valid boolean"
FEATURE_DIM = 64
FEATURES_SCHEMA = f"media_id long, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def encode_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    return b"IMG1" + struct.pack("<HH", width, height) + payload


def encode_fake_video(n_frames: int, fps: int, payload: bytes = b"") -> bytes:
    return b"VID1" + struct.pack("<IB", n_frames, fps) + payload


def _decode_image_header(raw: bytes | None) -> tuple[int, int] | None:
    """STUB decoder: parses the fake header. A real implementation would be
    ``PIL.Image.open(io.BytesIO(raw)).size`` behind the same signature."""
    if raw is None or len(raw) < 8 or bytes(raw[:4]) != b"IMG1":
        return None
    w, h = struct.unpack("<HH", bytes(raw[4:8]))
    return w, h


def extract_image_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas: binary -> typed image metadata (width/height/validity).

    Batch-shaped like a real decoder pass: one Arrow batch in, one typed
    pandas frame out, no row-at-a-time Python in the plan.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["bytes"]):
                hdr = _decode_image_header(raw)
                rows.append(
                    (
                        int(mid),
                        hdr[0] if hdr else None,
                        hdr[1] if hdr else None,
                        len(raw) if raw is not None else None,
                        hdr is not None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "valid"]
            )

    return media.filter(F.col("kind") == "image").select("media_id", "bytes").mapInPandas(
        gen, IMAGE_META_SCHEMA
    )


def extract_image_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas: binary -> dense feature vector.

    STUB featurizer: a deterministic hash-derived vector with the exact
    shape/dtype a CNN embedding would have (array<float>, unit-normalized),
    so downstream similarity-search operators are exercised for real.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_vecs = [], []
            for mid, raw in zip(pdf["media_id"], pdf["bytes"]):
                if raw is None:
                    continue
                seed = np.frombuffer(
                    bytes(raw[:8]).ljust(8, b"\0"), dtype=np.uint64
                )[0]
                rng = np.random.RandomState(int(seed % (2**31)))
                v = rng.standard_normal(dim).astype(np.float32)
                v /= np.linalg.norm(v) or 1.0
                out_ids.append(int(mid))
                out_vecs.append(v.tolist())
            # explicit dtypes: an empty batch would otherwise default to
            # float64 columns, which Arrow can't convert to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "feature": pd.Series(out_vecs, dtype="object"),
                }
            )

    return media.filter(F.col("kind") == "image").select("media_id", "bytes").mapInPandas(
        gen, FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """mapInPandas: video binary -> one row per sampled frame.

    STUB frame reader: walks the fake header's frame count and emits a
    deterministic per-frame hash; a real implementation yields decoded frame
    tensors from ffmpeg with identical batching/row-explosion shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["bytes"]):
                if raw is None or len(raw) < 9 or bytes(raw[:4]) != b"VID1":
                    continue
                n_frames, _fps = struct.unpack("<IB", bytes(raw[4:9]))
                for i in range(0, n_frames, every_nth):
                    rows.append((int(mid), i, hash((int(mid), i)) & 0x7FFFFFFF))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_hash"]
            )

    return media.filter(F.col("kind") == "video").select("media_id", "bytes").mapInPandas(
        gen, FRAMES_SCHEMA
    )
