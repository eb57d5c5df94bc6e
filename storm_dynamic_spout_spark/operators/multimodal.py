"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension; SURVEY §2.11 engine mapping).

Design for 100 TB: binary payloads travel as ``BinaryType`` columns in
parquet (columnar, splittable, no small-files problem); decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
stages so Python touches data in vectorized batches, never per-row.
Partitioning is preserved through mapInPandas (narrow transformation —
no shuffle); repartition *before* the decode stage to spread work, not
after.

The decode step itself is STUBBED: the container ships no image/audio
codecs, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic pure-Python decode of the engine's own synthetic payload
format is used. Everything *around* the decode — schemas, UDF
signatures, Arrow batch shapes, partition behavior — is real and
tested; swapping in Pillow/librosa on a real cluster changes only the
body of ``_decode_batch``.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every binary payload.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
    ]
)

#: Engine's synthetic payload: 16-byte header (magic, w, h, c) + pixel bytes.
_MAGIC = b"SDSS"
_HEADER = struct.Struct("<4siii")


def make_synthetic_image(seed: bytes, width: int = 8, height: int = 8, channels: int = 3) -> bytes:
    """Deterministic fake image payload: header + sha256-keystream pixels.
    Stands in for real JPEG/PNG bytes in tests and fixtures."""
    need = width * height * channels
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(seed + counter.to_bytes(4, "little")).digest()
        counter += 1
    return _HEADER.pack(_MAGIC, width, height, channels) + bytes(out[:need])


def attach_image_payload(df: DataFrame, id_col: str, width: int = 8, height: int = 8) -> DataFrame:
    """Add (content BINARY, meta STRUCT) columns derived
    deterministically from the id — fixture-building helper so
    multimodal plumbing is testable on the driver's tables."""
    seed = F.sha2(F.col(id_col).cast("string"), 256)

    @F.pandas_udf(T.BinaryType())
    def _payload(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: make_synthetic_image(str(s).encode(), width, height))

    return df.withColumn("content", _payload(seed)).withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit("sdss-raw").alias("format"),
        ),
    )


#: Output schema of the decode stage: one row per input row.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)


def _decode_payload(buf: bytes) -> tuple[int, int, int, float]:
    """Decode the synthetic format. REAL-CODEC SEAM: replace this body
    with Pillow/libjpeg on a cluster with codecs installed."""
    magic, w, h, c = _HEADER.unpack_from(buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an SDSS synthetic payload")
    pixels = buf[_HEADER.size :]
    mean = sum(pixels) / len(pixels) if pixels else 0.0
    return w, h, c, mean


def decode_image(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """binary content → per-image features via Arrow-batched mapInPandas.

    ``fake=False`` raises NotImplementedError (no codecs in this
    container); ``fake=True`` decodes the engine's synthetic format
    deterministically. Narrow transformation: partitioning preserved.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "pass fake=True for the deterministic synthetic decoder"
        )

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                    "content_sha": [
                        hashlib.sha256(b).hexdigest() for b in pdf["content"]
                    ],
                }
            )

    return df.select(id_col, "content").mapInPandas(_decode_batches, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def frame_sample(df: DataFrame, n_frames: int, id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling shape: one input row → n sampled frame rows
    (a flatMap via mapInPandas; the 1:N row explosion is the part that
    matters for partition sizing at scale — decode is the same seam as
    :func:`decode_image`). Frames are identified deterministically from
    the payload hash."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf["content"]):
                base = hashlib.sha256(content).hexdigest()
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    shas.append(hashlib.sha256(f"{base}:{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame_sha": shas})

    return df.select(id_col, "content").mapInPandas(_sample, FRAME_SCHEMA)


def resize_meta(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize as a *metadata* transformation (the pixel resample lives
    behind the decode seam): pure column ops, codegen'd, no Python."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_channels").alias("n_channels"),
            F.col("meta.format").alias("format"),
        ),
    )
