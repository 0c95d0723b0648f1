"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (100 TB): media bytes live in a ``binary`` column next to typed
metadata (modality, byte_len, content hash). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` passes —
one Python crossing per batch, never per row — and each pass declares
its output schema up front so downstream stays columnar.

The actual codec step is STUBBED: image/audio libraries are not in
this environment. ``decode_stub`` produces deterministic fake features
from the raw bytes (so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested); ``decode_real``
raises ``NotImplementedError`` until a codec (Pillow/torchaudio/…) is
importable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("feat_dim", LongType()),
        StructField("feat_checksum", LongType()),
    ]
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap an existing column's bytes as a typed media row (utf-8
    encoding stands in for real media bytes in tests)."""
    data = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        data.alias("data"),
        F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.sha2(data, 256).alias("sha256"),
    )


def decode_real(data: bytes, modality: str):
    """Real media decode — requires codec libraries absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "media codecs (Pillow/torchaudio/av) not installed in this "
            "environment; use decode_stub for plumbing tests"
        ) from e
    raise NotImplementedError("wire the codec here when available")


def decode_stub(data: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': (feat_dim, checksum) derived from
    the bytes. Stands in for codec output so batch shape and schema
    plumbing are exercised for real."""
    digest = hashlib.sha256(data).digest()
    feat_dim = 1 + digest[0] % 8
    checksum = int.from_bytes(digest[1:9], "big", signed=False) % (2**62)
    return feat_dim, checksum


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 16, stride: int = 2) -> DataFrame:
    """Frame sampling plumbing: treat the binary payload as a sequence
    of fixed-size 'frames' and emit every ``stride``-th one. A real
    video decoder would replace the byte-slicing; the fan-out shape
    (one media row → many frame rows, schema declared up front,
    partition-preserving) is the production-relevant part."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames, lens = [], [], [], []
            for mid, raw in zip(pdf["media_id"], pdf["data"]):
                data = bytes(raw)
                n_frames = len(data) // frame_bytes
                for fno in range(0, n_frames, stride):
                    chunk = data[fno * frame_bytes : (fno + 1) * frame_bytes]
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(chunk)
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames, "frame_len": lens}
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' stub: deterministic byte-truncation standing in for an
    image resize; keeps schema + hash metadata consistent so downstream
    plumbing is exercised. Swap ``decode_real`` in when codecs exist."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["data"] = [bytes(r)[:target_bytes] for r in pdf["data"]]
            out["byte_len"] = [min(int(b), target_bytes) for b in pdf["byte_len"]]
            out["sha256"] = [hashlib.sha256(bytes(r)[:target_bytes]).hexdigest() for r in pdf["data"]]
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    ``mapInPandas`` keeps the binary payload out of the driver and
    processes whole Arrow batches per Python call; partitioning is
    inherited, so upstream ``repartition`` controls parallelism.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims, checks = [], []
            for raw in pdf["data"]:
                d, c = decode_stub(bytes(raw))
                dims.append(d)
                checks.append(c)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["byte_len"],
                    "feat_dim": dims,
                    "feat_checksum": checks,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
