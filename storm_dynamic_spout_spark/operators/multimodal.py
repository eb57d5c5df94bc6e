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

# Real-codec import seam: Pillow decodes actual JPEG/PNG bytes where it
# is installed (executors re-run this import when they unpickle the
# decode closure, so driver and executors agree); without it the honest
# NotImplementedError below stands and fake=True remains the only path.
try:
    from PIL import Image as _PILImage  # noqa: N814

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


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
    """Decode the synthetic format (the fake=True path)."""
    magic, w, h, c = _HEADER.unpack_from(buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an SDSS synthetic payload")
    pixels = buf[_HEADER.size :]
    mean = sum(pixels) / len(pixels) if pixels else 0.0
    return w, h, c, mean


def _decode_payload_pil(buf: bytes) -> tuple[int, int, int, float]:
    """Real decode via Pillow (the fake=False path where PIL exists):
    same feature tuple as the synthetic decoder, so the surrounding
    Spark plumbing — schema, batching, partitioning — is identical."""
    import io

    img = _PILImage.open(io.BytesIO(buf))
    img.load()
    channels = len(img.getbands())
    data = list(img.convert("L").getdata())
    mean = sum(data) / len(data) if data else 0.0
    return img.width, img.height, channels, mean


def decode_image(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """binary content → per-image features via Arrow-batched mapInPandas.

    ``fake=True`` decodes the engine's synthetic format
    deterministically; ``fake=False`` decodes real JPEG/PNG bytes via
    Pillow when installed, else raises NotImplementedError (this
    container ships no codecs). Narrow transformation: partitioning
    preserved.
    """
    if not fake and not HAS_PIL:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "install Pillow for real decode or pass fake=True for the "
            "deterministic synthetic decoder"
        )
    decode_one = _decode_payload if fake else _decode_payload_pil

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_one(b) for b in pdf["content"]]
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


# ---------------------------------------------------------------------------
# Audio (same seam pattern as images: real plumbing, stubbed codec)
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
    ]
)

_AUDIO_MAGIC = b"SDSA"


def make_synthetic_audio(seed: bytes, sample_rate: int = 16000, n_samples: int = 256) -> bytes:
    """Deterministic fake audio payload: header + sha256-keystream PCM
    bytes (1 channel, u8 samples). Stands in for real WAV/FLAC bytes."""
    need = n_samples
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(seed + b"audio" + counter.to_bytes(4, "little")).digest()
        counter += 1
    return _HEADER.pack(_AUDIO_MAGIC, sample_rate, n_samples, 1) + bytes(out[:need])


def attach_audio_payload(
    df: DataFrame, id_col: str, sample_rate: int = 16000, n_samples: int = 256
) -> DataFrame:
    """Add (content BINARY, meta STRUCT) audio columns derived from the id."""
    seed = F.sha2(F.col(id_col).cast("string"), 256)

    @F.pandas_udf(T.BinaryType())
    def _payload(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda s: make_synthetic_audio(str(s).encode(), sample_rate, n_samples)
        )

    return df.withColumn("content", _payload(seed)).withColumn(
        "meta",
        F.struct(
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_samples).alias("n_samples"),
            F.lit(1).alias("n_channels"),
            F.lit("sdsa-pcm8").alias("format"),
        ),
    )


def _decode_audio_payload(buf: bytes) -> tuple[int, int, float]:
    """REAL-CODEC SEAM (audio): module-level so executors pickle it by
    reference — a struct.Struct captured in a closure is not picklable."""
    magic, rate, n, _c = _HEADER.unpack_from(buf, 0)
    if magic != _AUDIO_MAGIC:
        raise ValueError("not an SDSA synthetic payload")
    pcm = buf[_HEADER.size :]
    # u8 PCM centered at 128: rms of the deviation
    rms = (sum((b - 128) ** 2 for b in pcm) / max(len(pcm), 1)) ** 0.5
    return rate, n, rms


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)


def decode_audio(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """binary audio → per-clip features via Arrow-batched mapInPandas.
    Same seam as :func:`decode_image`: ``fake=False`` raises (no codecs
    in this container); ``fake=True`` decodes the synthetic format."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not installed in this environment; "
            "pass fake=True for the deterministic synthetic decoder"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, durs, rmss, shas = [], [], [], []
            for buf in pdf["content"]:
                rate, n, rms = _decode_audio_payload(buf)
                rates.append(rate)
                durs.append(n / rate)
                rmss.append(rms)
                shas.append(hashlib.sha256(buf).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": rates,
                    "duration_s": durs,
                    "rms": rmss,
                    "content_sha": shas,
                }
            )

    return df.select(id_col, "content").mapInPandas(_decode, AUDIO_FEATURES_SCHEMA)
