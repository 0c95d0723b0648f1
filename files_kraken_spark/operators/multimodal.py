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
