"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension; SURVEY §2.11 engine mapping).

Design for 100 TB: binary payloads travel as ``BinaryType`` columns in
parquet (columnar, splittable, no small-files problem); decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
stages so Python touches data in vectorized batches, never per-row.
Partitioning is preserved through mapInPandas (narrow transformation —
no shuffle); repartition *before* the decode stage to spread work, not
after.

Codec coverage is tiered:

- **Real, always available**: formats decoded with stdlib + numpy —
  netpbm (P6 RGB / P5 gray) and BMP (24/32-bit uncompressed) images,
  PNG (every valid depth x
  colortype x interlace combination — 1/2/4/8/16-bit gray, 8/16-bit
  gray-alpha/RGB/RGBA, sub-byte + 8-bit palette, Adam7 at ALL depths
  incl. sub-byte and 16-bit: stdlib zlib inflate + all five byte-wise
  unfilters at the correct bytes-per-pixel distance), baseline-sequential JPEG (operators/jpeg.py: canonical
  Huffman decode from the file's DHT tables, 4:4:4/4:2:2/4:2:0
  sampling, restart markers, matrix IDCT — PROGRESSIVE (SOF2)
  frames via per-component coefficient accumulation, LOSSLESS (SOF3,
  bit-exact, predictors 1-7) and 12-bit DCT gray + color), WAV (PCM) audio
  via the stdlib ``wave`` module (8/16/24-bit, mono or interleaved
  multi-channel). These run and are tested in any
  environment, including this container.
- **Real, gated**: the residual exotica — hierarchical/differential
  JPEG frames and arithmetic coding (PNG, lossless JPEG, and 12-bit
  DCT now decode natively) — decode via Pillow where installed
  (import-try seam); absent Pillow the honest
  ``NotImplementedError`` stands.
- **Synthetic** (``fake=True``): the engine's deterministic payload
  format, for fixtures whose bytes must derive from an id.

Everything *around* the decode — schemas, UDF signatures, Arrow batch
shapes, partition behavior — is identical across the three tiers, so
swapping codecs on a real cluster changes only the per-payload decode
function.
"""

from __future__ import annotations

import functools
import hashlib
import struct
import wave
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: internal exception types a codec parser can hit on malformed bytes
#: (truncated headers, bad lengths, dangling table references); the
#: boundary below converts every one of them into the DOCUMENTED
#: ValueError contract the dispatch / Pillow-fallback seam catches —
#: the r5 _BitReader IndexError and r6 None-Huffman-table
#: AttributeError advice items were both instances of this class, and
#: tests/test_decoder_error_contract.py fuzzes it closed.
_CODEC_INTERNAL = (
    struct.error,
    IndexError,
    KeyError,
    AttributeError,
    EOFError,
    OverflowError,
    RuntimeError,  # stdlib chunk/wave raise this on some truncations
    zlib.error,
    wave.Error,
)


def codec_boundary(fmt: str):
    """Decorator: malformed-payload internals become ValueError;
    ValueError/NotImplementedError (the documented contract) pass
    through untouched."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            try:
                return fn(*a, **kw)
            except (ValueError, NotImplementedError):
                raise
            except _CODEC_INTERNAL as e:
                raise ValueError(
                    f"corrupt {fmt} payload: {type(e).__name__}: {e}"
                ) from e

        return wrapped

    return deco

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


@codec_boundary("synthetic")
def _decode_payload(buf: bytes) -> tuple[int, int, int, float]:
    """Decode the synthetic format (the fake=True path)."""
    magic, w, h, c = _HEADER.unpack_from(buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an SDSS synthetic payload")
    pixels = buf[_HEADER.size :]
    mean = sum(pixels) / len(pixels) if pixels else 0.0
    return w, h, c, mean


def _decode_payload_pil(buf: bytes) -> tuple[int, int, int, float]:
    """Real decode via Pillow (compressed formats, where PIL exists):
    same feature tuple as the other decoders, so the surrounding
    Spark plumbing — schema, batching, partitioning — is identical."""
    import io

    img = _PILImage.open(io.BytesIO(buf))
    img.load()
    channels = len(img.getbands())
    data = list(img.convert("L").getdata())
    mean = sum(data) / len(data) if data else 0.0
    return img.width, img.height, channels, mean


def make_ppm_image(seed: bytes, width: int = 8, height: int = 8) -> bytes:
    """A REAL binary PPM (P6) image with deterministic pixels — netpbm
    is a published public format; these bytes open in any image viewer.
    Fixture twin of :func:`make_synthetic_image` for the real path."""
    need = width * height * 3
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(seed + b"ppm" + counter.to_bytes(4, "little")).digest()
        counter += 1
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(out[:need])


@codec_boundary("netpbm")
def _decode_ppm(buf: bytes) -> tuple[int, int, int, float]:
    """Pure-numpy decode of binary netpbm (P6 RGB / P5 grayscale,
    maxval<=255): header is ASCII tokens (whitespace/comment
    separated), pixels are raw bytes."""
    import numpy as np

    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a P5/P6 netpbm payload")
    channels = 3 if buf[:2] == b"P6" else 1
    # tokenize the header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line (netpbm spec)
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(buf):
        c = buf[i : i + 1]
        if c == b"#":
            i = buf.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            tokens.append(buf[i:j])
            i = j
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    pixels = np.frombuffer(buf, dtype=np.uint8, count=w * h * channels, offset=i + 1)
    return w, h, channels, float(pixels.mean()) if pixels.size else 0.0


@codec_boundary("bmp")
def _decode_bmp(buf: bytes) -> tuple[int, int, int, float]:
    """Pure-numpy decode of uncompressed 24/32-bit BMP (the Windows
    BITMAPINFOHEADER layout): rows are bottom-up and padded to 4 bytes,
    but a whole-image mean only needs the pixel bytes per row."""
    import numpy as np

    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported (bpp={bpp})")
    h_abs = abs(h)
    channels = bpp // 8
    row_bytes = w * channels
    stride = (row_bytes + 3) & ~3
    rows = [
        np.frombuffer(buf, np.uint8, count=row_bytes, offset=data_offset + r * stride)
        for r in range(h_abs)
    ]
    pixels = np.concatenate(rows) if rows else np.empty(0, np.uint8)
    return w, h_abs, channels, float(pixels.mean()) if pixels.size else 0.0


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: IHDR color type → channel count (palette [3] handled via PLTE lookup)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: Adam7 interlace pass grid: (x-origin, y-origin, x-step, y-step)
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def make_jpeg_image(seed: bytes, width: int = 16, height: int = 16, gray: bool = False) -> bytes:
    """A REAL baseline JPEG (4:4:4, file-carried Huffman tables) with
    sha256-derived deterministic pixels — opens in any viewer.  Encoded
    by the native pure-numpy codec (operators/jpeg.py)."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.jpeg import encode_baseline_jpeg

    n = width * height * (1 if gray else 3)
    raw = b""
    counter = 0
    while len(raw) < n:
        raw += hashlib.sha256(seed + b"jpg" + counter.to_bytes(4, "little")).digest()
        counter += 1
    arr = np.frombuffer(raw[:n], dtype=np.uint8).reshape(
        (height, width) if gray else (height, width, 3)
    )
    return encode_baseline_jpeg(arr)


def make_png_image(
    seed: bytes, width: int = 8, height: int = 8, channels: int = 3
) -> bytes:
    """A REAL PNG (8-bit gray/RGB/RGBA, non-interlaced) with
    deterministic pixels — zlib-compressed IDAT, CRC'd chunks; these
    bytes open in any viewer.  Rows cycle through ALL five PNG filter
    types (None/Sub/Up/Average/Paeth), so a decode test exercises every
    unfilter branch, not just the trivial one."""
    import struct
    import zlib

    import numpy as np

    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    need = width * height * channels
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(seed + b"png" + counter.to_bytes(4, "little")).digest()
        counter += 1
    raw = np.frombuffer(bytes(out[:need]), np.uint8).reshape(height, width * channels)

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    scanlines = bytearray()
    prev = np.zeros(width * channels, dtype=np.int32)
    for r in range(height):
        row = raw[r].astype(np.int32)
        f = r % 5
        filt = np.empty_like(row)
        for i in range(row.size):
            a = int(row[i - channels]) if i >= channels else 0
            b = int(prev[i])
            c = int(prev[i - channels]) if i >= channels else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            filt[i] = (int(row[i]) - pred) % 256
        scanlines += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        import binascii

        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + chunk(b"IEND", b"")
    )


def _png_value_matrix(
    buf: bytes,
) -> tuple[int, int, int, int, bool, bytes, "object"]:
    """Native PNG decode core returning the reconstructed VALUE matrix
    before any reduction — ``(w, h, channels, depth, palette, plte,
    out)`` where ``out`` is the unfiltered (h, w*bpp) byte matrix
    (depth >= 8) or the (h, w) sample-value matrix (sub-byte depths).
    Shared by the stats wrapper (:func:`_decode_png`) and the
    pixel-level API (:func:`png_pixels`) the perceptual-hash operator
    consumes: 1/2/4/8/16-bit gray,
    8/16-bit gray+alpha / RGB / RGBA, sub-byte or 8-bit palette
    (PLTE), non-interlaced or Adam7 interlaced at EVERY supported
    depth (sub-byte passes unpack per-pass with per-pass byte
    padding), all five filter types (byte-wise, left-neighbor
    distance = bytes-per-pixel per the spec — 2 for 16-bit gray
    etc.).  The Sub /
    Average / Paeth unfilters are inherently sequential per row
    (each byte depends on the reconstructed left neighbor), so they run
    as a per-byte loop — fine for thumbnail-scale fixtures; large-image
    production decode should go through Pillow's C path where installed
    (the dispatch below prefers this decoder only when it can handle
    the file)."""
    import struct
    import zlib

    import numpy as np

    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = b""
    plte = b""
    w = h = depth = colortype = interlace = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    palette = colortype == 3
    supported = (
        (depth == 8 and (colortype in _PNG_CHANNELS or palette))
        or (depth == 16 and colortype in _PNG_CHANNELS)
        # sub-byte depths: single-channel only per spec (gray/palette)
        or (depth in (1, 2, 4) and colortype in (0, 3))
    )
    if not supported:
        raise NotImplementedError(
            f"PNG variant unsupported natively (depth={depth}, "
            f"colortype={colortype}, interlace={interlace})"
        )
    channels = 1 if palette else _PNG_CHANNELS[colortype]
    # filter left-neighbor distance is BYTES (1 for sub-byte depths)
    bpp = max(channels * depth // 8, 1)
    raw = zlib.decompress(idat)

    def unfilter(height: int, stride: int, p: int) -> tuple[np.ndarray, int]:
        """Reconstruct one filtered sub-image (PNG spec ISO/IEC 15948
        §9 filter types) starting at byte ``p`` of the inflated
        stream; returns (rows, next p)."""
        sub = np.empty((height, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for r in range(height):
            f = raw[p]
            row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
            p += 1 + stride
            if f == 0:
                pass
            elif f == 2:  # Up — vectorizable (depends only on prior row)
                row = (row + prev) % 256
            elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential per byte
                for i in range(stride):
                    a = int(row[i - bpp]) if i >= bpp else 0
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        pp = a + b - c
                        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    row[i] = (row[i] + pred) % 256
            else:
                raise ValueError(f"unknown PNG filter type {f}")
            sub[r] = row.astype(np.uint8)
            prev = row
        return sub, p

    if interlace == 0:
        stride = -(-w * channels * depth // 8)  # sub-byte rows pad to bytes
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline payload size mismatch")
        out, _ = unfilter(h, stride, 0)
        if depth < 8:
            # unpack MSB-first sub-byte samples (gray or palette indices)
            spb = 8 // depth
            idx = np.arange(w)
            shift = ((spb - 1 - (idx % spb)) * depth).astype(np.uint8)
            out = (out[:, idx // spb] >> shift) & ((1 << depth) - 1)
    elif depth >= 8:
        # Adam7: 7 independently-filtered sub-images scattered onto the
        # full grid at (x0 + i*dx, y0 + r*dy); empty passes carry no
        # scanlines at all (spec: zero-width/height passes are skipped)
        out = np.zeros((h, w * bpp), dtype=np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, p = unfilter(ph, pw * bpp, p)
            for r in range(ph):
                y = y0 + r * dy
                for i in range(pw):
                    x = x0 + i * dx
                    out[y, x * bpp : (x + 1) * bpp] = sub[r, i * bpp : (i + 1) * bpp]
        if p != len(raw):
            raise ValueError("PNG interlaced payload size mismatch")
    else:
        # Adam7 at sub-byte depth: each pass packs ITS OWN scanlines
        # MSB-first with per-pass byte padding, so unpack per pass and
        # scatter sample VALUES (gray level or palette index) — the
        # result is the same (h, w) value matrix as the non-interlaced
        # sub-byte path below.
        spb = 8 // depth
        mask = (1 << depth) - 1
        out = np.zeros((h, w), dtype=np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = -(-pw * depth // 8)
            sub, p = unfilter(ph, stride, p)
            idx = np.arange(pw)
            shift = ((spb - 1 - (idx % spb)) * depth).astype(np.uint8)
            vals = (sub[:, idx // spb] >> shift) & mask
            for r in range(ph):
                out[y0 + r * dy, x0 : x0 + (pw - 1) * dx + 1 : dx] = vals[r]
        if p != len(raw):
            raise ValueError("PNG interlaced payload size mismatch")
    return w, h, channels, depth, palette, plte, out


@codec_boundary("png")
def _decode_png(buf: bytes) -> tuple[int, int, int, float]:
    """PNG stats (w, h, channels, mean intensity on the 0-255 scale)
    from the decoded value matrix."""
    import numpy as np

    w, h, channels, depth, palette, plte, out = _png_value_matrix(buf)
    if palette:
        if not plte:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[out.reshape(-1)]
        return w, h, 3, float(rgb.mean()) if rgb.size else 0.0
    if depth == 16:
        vals = out.reshape(-1).view(np.uint8)
        u16 = (vals[0::2].astype(np.float64) * 256 + vals[1::2]) / 257.0
        return w, h, channels, float(u16.mean()) if u16.size else 0.0
    if depth < 8:
        # gray sub-byte: report on the 0-255 scale (255/(2^d - 1))
        scale = 255.0 / ((1 << depth) - 1)
        return w, h, 1, float(out.mean() * scale) if out.size else 0.0
    return w, h, channels, float(out.mean()) if out.size else 0.0


@codec_boundary("png")
def png_pixels(buf: bytes):
    """Decoded PNG pixel array: (h, w) for single-channel, (h, w, c)
    otherwise; uint8 for depth <= 8 (sub-byte gray levels rescaled to
    0-255), uint16 for 16-bit.  Palette images expand to RGB."""
    import numpy as np

    w, h, channels, depth, palette, plte, out = _png_value_matrix(buf)
    if palette:
        if not plte:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[out.reshape(-1)].reshape(h, w, 3)
    if depth == 16:
        vals = out.reshape(-1).view(np.uint8)
        u16 = vals[0::2].astype(np.uint16) * 256 + vals[1::2]
        arr = u16.reshape(h, w, channels)
        return arr[:, :, 0] if channels == 1 else arr
    if depth < 8:
        scale = 255 // ((1 << depth) - 1)  # exact for 1/2/4-bit
        return (out * scale).astype(np.uint8)
    arr = out.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _decode_jpeg(buf: bytes) -> tuple[int, int, int, float]:
    """Native JPEG decode (operators/jpeg.py — pure numpy, canonical
    Huffman tables read from the file's own DHT segments): baseline,
    progressive, LOSSLESS (SOF3, bit-exact), and 12-bit DCT.
    Mean intensity reports on the 0-255 scale regardless of sample
    precision (>8-bit frames scale by 255/(2^P - 1), matching the
    16-bit-PNG convention).  Only hierarchical/differential frames
    fall through to Pillow when present."""
    from storm_dynamic_spout_spark.operators.jpeg import (
        decode_baseline_jpeg,
        frame_precision,
    )

    arr = decode_baseline_jpeg(buf)
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    mean = float(arr.mean())
    p = frame_precision(buf)
    if p > 8:
        mean *= 255.0 / ((1 << p) - 1)
    return arr.shape[1], arr.shape[0], channels, mean


def _decode_payload_real(buf: bytes) -> tuple[int, int, int, float]:
    """fake=False dispatch: sniff the magic — PPM/BMP decode with
    stdlib+numpy everywhere; PNG decodes natively for every valid
    depth x colortype x interlace combination (1/2/4/8/16-bit,
    palette, Adam7 at all depths) and JPEG — baseline and
    progressive — decodes natively (operators/jpeg.py); Pillow, when
    installed, is the fallback for the residual JPEG exotica
    (hierarchical/differential frames, arithmetic coding)."""
    if buf[:2] in (b"P6", b"P5"):
        return _decode_ppm(buf)
    if buf.startswith(b"BM"):
        return _decode_bmp(buf)
    if buf.startswith(_PNG_SIG):
        try:
            return _decode_png(buf)
        except NotImplementedError:
            if HAS_PIL:
                return _decode_payload_pil(buf)
            raise
    if buf.startswith(b"\xff\xd8"):
        try:
            return _decode_jpeg(buf)
        except NotImplementedError:
            if HAS_PIL:
                return _decode_payload_pil(buf)
            raise
    if HAS_PIL:
        return _decode_payload_pil(buf)
    raise NotImplementedError(
        "unrecognized image payload; PPM/BMP/PNG (all valid variants) "
        "and JPEG (baseline AND progressive) decode natively — install "
        "Pillow for hierarchical/arithmetic JPEG frames, or pass "
        "fake=True for the deterministic synthetic decoder"
    )


def decode_image(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """binary content → per-image features via Arrow-batched mapInPandas.

    ``fake=True`` decodes the engine's synthetic format
    deterministically; ``fake=False`` decodes REAL image bytes — PPM and
    uncompressed BMP natively (stdlib+numpy, no codec dependency),
    JPEG/PNG via Pillow where installed. Narrow transformation:
    partitioning preserved.
    """
    decode_one = _decode_payload if fake else _decode_payload_real

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


def make_wav_audio(seed: bytes, sample_rate: int = 16000, n_samples: int = 256) -> bytes:
    """A REAL RIFF/WAV file (PCM16 mono) with deterministic samples,
    written by the stdlib ``wave`` module — plays in any audio player.
    Fixture twin of :func:`make_synthetic_audio` for the real path."""
    import io
    import wave

    need = n_samples * 2
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(seed + b"wav" + counter.to_bytes(4, "little")).digest()
        counter += 1
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(bytes(out[:need]))
    return bio.getvalue()


@codec_boundary("wav")
def wav_samples(buf: bytes):
    """Sample-level WAV (PCM) decode via the stdlib ``wave`` module +
    numpy — (sample_rate, full_scale, n_frames, int samples): int16
    range for 16-bit, uint8-centered for 8-bit, sign-extended int32
    for 24-bit; multi-channel stays interleaved (samples = frames x
    channels).  Shared by the stats wrapper (:func:`_decode_wav`) and
    the audio fingerprint operator, which needs the exact integer
    domain."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        frames = wf.readframes(n)
    if width == 2:
        return rate, 32768, n, np.frombuffer(frames, dtype="<i2").astype(np.int32)
    if width == 1:
        return (
            rate,
            128,
            n,
            np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128,
        )
    if width == 3:
        # 24-bit PCM: 3-byte little-endian signed, sign-extended to i32
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return rate, 1 << 23, n, v
    raise ValueError(f"unsupported WAV sample width: {width}")


def _decode_wav(buf: bytes) -> tuple[int, int, float]:
    """WAV stats: (sample_rate, n_frames, rms of the samples
    normalized to [-1, 1]) from the integer sample decode."""
    import numpy as np

    rate, full, n_frames, ints = wav_samples(buf)
    samples = ints.astype(np.float64) / float(full)
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    return rate, n_frames, rms


def decode_audio(df: DataFrame, id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """binary audio → per-clip features via Arrow-batched mapInPandas.
    ``fake=False`` decodes REAL RIFF/WAV (PCM) bytes via the stdlib
    ``wave`` module — no external codec dependency; compressed audio
    (FLAC/MP3) is out of scope without a codec library.  ``fake=True``
    decodes the engine's synthetic format."""

    def _decode_real(buf: bytes) -> tuple[int, int, float]:
        if buf[:4] == b"RIFF":
            return _decode_wav(buf)
        raise NotImplementedError(
            "compressed audio codecs are not installed in this "
            "environment; WAV decodes natively — pass fake=True for the "
            "deterministic synthetic decoder"
        )

    decode_one = _decode_audio_payload if fake else _decode_real

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, durs, rmss, shas = [], [], [], []
            for buf in pdf["content"]:
                rate, n, rms = decode_one(bytes(buf))
                rates.append(rate)
                durs.append(n / rate)
                rmss.append(rms)
                shas.append(hashlib.sha256(bytes(buf)).hexdigest())
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


# ---------------------------------------------------------------------------
# Video: MJPEG-in-AVI — real container + real frames via operators/jpeg.py
# ---------------------------------------------------------------------------


def make_mjpeg_avi(
    seed: bytes,
    width: int = 16,
    height: int = 16,
    n_frames: int = 8,
    fps: int = 10,
) -> bytes:
    """A REAL RIFF/AVI file whose video stream is Motion-JPEG: each
    frame is a baseline JPEG from the native encoder
    (operators/jpeg.py), deterministic in (seed, frame index).  Plays
    in any MJPG-capable player.  Fixture twin of the synthetic video
    payload for the real decode path."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.jpeg import encode_baseline_jpeg

    frames = []
    for i in range(n_frames):
        n = width * height * 3
        raw = b""
        counter = 0
        while len(raw) < n:
            raw += hashlib.sha256(
                seed + b"avi" + i.to_bytes(4, "little") + counter.to_bytes(4, "little")
            ).digest()
            counter += 1
        arr = np.frombuffer(raw[:n], dtype=np.uint8).reshape(height, width, 3)
        frames.append(encode_baseline_jpeg(arr))

    def chunk(ckid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return ckid + struct.pack("<I", len(data)) + data + pad

    def lst(typ: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", typ + data)

    usec_per_frame = 1_000_000 // fps
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_frame * fps, 0, 0x10,  # AVIF_HASINDEX
        n_frames, 0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n_frames, max_frame, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_chunks)
    # idx1: offsets relative to the start of the 'movi' list type field
    idx = b""
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@codec_boundary("avi")
def parse_mjpeg_avi(buf: bytes) -> tuple[dict, list[bytes]]:
    """Parse a RIFF/AVI container and return (header meta, JPEG frame
    payloads) — '00dc'/'00db' chunks inside the 'movi' list.  Container
    walk only; frame decode stays in operators/jpeg.py."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    meta: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            ckid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            if ckid == b"LIST":
                walk(data_start + 4, data_start + size)
            elif ckid == b"avih":
                vals = struct.unpack("<14I", buf[data_start : data_start + 56])
                meta.update(
                    usec_per_frame=vals[0],
                    n_frames=vals[4],
                    width=vals[8],
                    height=vals[9],
                )
            elif ckid[2:4] in (b"dc", b"db"):
                frames.append(buf[data_start : data_start + size])
            pos = data_start + size + (size % 2)

    walk(12, 12 + struct.unpack("<I", buf[4:8])[0] - 4)
    return meta, frames


REAL_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def frame_sample_real(df: DataFrame, n_frames: int, id_col: str = "doc_id") -> DataFrame:
    """REAL video frame sampling: parse the MJPEG/AVI container, pick
    ``n_frames`` evenly-spaced frames, decode each with the native
    baseline-JPEG decoder, and emit per-frame stats.  Same 1:N
    mapInPandas explosion shape as :func:`frame_sample` (the synthetic
    twin); at scale the explosion factor — not the decode — drives
    partition sizing, which is why the two share a shape."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from storm_dynamic_spout_spark.operators.jpeg import decode_baseline_jpeg

        for pdf in batches:
            ids, idxs, ws, hs, means, shas = [], [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf["content"]):
                buf = bytes(content)
                _, frames = parse_mjpeg_avi(buf)
                if not frames:
                    continue
                take = min(n_frames, len(frames))
                picks = [round(i * (len(frames) - 1) / max(take - 1, 1)) for i in range(take)]
                for fi in picks:
                    arr = decode_baseline_jpeg(frames[fi])
                    ids.append(int(doc_id))
                    idxs.append(int(fi))
                    hs.append(int(arr.shape[0]))
                    ws.append(int(arr.shape[1]))
                    means.append(float(arr.mean()))
                    shas.append(hashlib.sha256(frames[fi]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_index": idxs,
                    "width": ws,
                    "height": hs,
                    "mean_intensity": means,
                    "frame_sha": shas,
                }
            )

    return df.select(id_col, "content").mapInPandas(_sample, REAL_FRAME_SCHEMA)


STRIDE_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def frame_sample_stride(
    df: DataFrame, stride: int, id_col: str = "doc_id"
) -> DataFrame:
    """Fixed-RATE video frame sampling: every ``stride``-th frame
    (indexes 0, stride, 2·stride, …) stamped with the container's own
    clock — ``ts_micros = frame_index × usec_per_frame`` from the avih
    header — the "1 fps from a 30 fps clip" op a multimodal training
    pipeline runs to align frames with transcripts.  Complements
    :func:`frame_sample_real` (fixed COUNT, evenly spaced): stride
    sampling preserves the temporal density contract as clip length
    varies, count sampling preserves the per-clip budget.  Each pick
    is decoded (native baseline JPEG) so width/height prove the frame
    decoded; the sha fingerprints the payload for downstream frame
    dedup.  Same 1:N mapInPandas explosion shape as the samplers
    above — at scale the explosion factor drives partition sizing."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from storm_dynamic_spout_spark.operators.jpeg import decode_baseline_jpeg

        for pdf in batches:
            ids, idxs, tss, ws, hs, shas = [], [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf["content"]):
                buf = bytes(content)
                meta, frames = parse_mjpeg_avi(buf)
                upf = int(meta.get("usec_per_frame", 0))
                for fi in range(0, len(frames), stride):
                    arr = decode_baseline_jpeg(frames[fi])
                    ids.append(int(doc_id))
                    idxs.append(int(fi))
                    tss.append(int(fi) * upf)
                    hs.append(int(arr.shape[0]))
                    ws.append(int(arr.shape[1]))
                    shas.append(hashlib.sha256(frames[fi]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_index": idxs,
                    "ts_micros": tss,
                    "width": ws,
                    "height": hs,
                    "frame_sha": shas,
                }
            )

    return df.select(id_col, "content").mapInPandas(_sample, STRIDE_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) + banded hamming near-dup join
# ---------------------------------------------------------------------------

#: pHash LSH parameters: the 63-bit hash splits into 4 x 16-bit bands
#: (the top band carries 15 significant bits); a candidate pair must
#: collide on at least one band.  Standard LSH recall tradeoff: a pair
#: at hamming h can evade every band once h > bands - 1, with evasion
#: probability shrinking geometrically — raise PHASH_BANDS for higher
#: recall at more candidate cost.
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_MAX_HAMMING = 10


def image_pixels(buf: bytes):
    """Pixel-level decode dispatch for the perceptual-hash path: PNG
    via the native value-matrix core, JPEG (baseline / progressive /
    lossless) via operators/jpeg.py.  Formats without a pixel-level
    API here (PPM/BMP feed the stats path only) raise ValueError."""
    if buf.startswith(_PNG_SIG):
        return png_pixels(buf)
    if buf.startswith(b"\xff\xd8"):
        from storm_dynamic_spout_spark.operators.jpeg import decode_baseline_jpeg

        return decode_baseline_jpeg(buf)
    raise ValueError("phash decode supports PNG and JPEG payloads")


def phash64(pixels) -> int:
    """63-bit DCT perceptual hash of a decoded pixel array, fully
    deterministic: integer luma (ITU-R 601 weights, floor division),
    8x8 nearest-neighbor downsample by integer indexing, orthonormal
    float64 DCT-II, then bit i = 1 iff AC coefficient i exceeds the
    median of the 63 AC coefficients.  Uniform brightness shifts only
    move the DC coefficient, so near-identical content lands within a
    few bits regardless of exposure."""
    import numpy as np

    arr = np.asarray(pixels)
    if arr.ndim == 3:
        a = arr.astype(np.int64)
        if arr.shape[2] >= 3:
            luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
        else:
            luma = a[..., 0]
    else:
        luma = arr.astype(np.int64)
    h, w = luma.shape
    ys = [(y * h) // 8 for y in range(8)]
    xs = [(x * w) // 8 for x in range(8)]
    ds = luma[np.ix_(ys, xs)].astype(np.float64)
    k = np.arange(8)
    dct = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0) * np.sqrt(2.0 / 8)
    dct[0] /= np.sqrt(2.0)
    coef = dct @ ds @ dct.T
    ac = coef.reshape(-1)[1:]
    med = float(np.median(ac))
    bits = 0
    for i, v in enumerate(ac):
        if float(v) > med:
            bits |= 1 << i
    return bits


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def phash_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, content) → (id, 63-bit perceptual hash) via Arrow-batched
    mapInPandas over the REAL pixel decoders — the only Python stage of
    the image near-dup pipeline; everything downstream (banding, the
    candidate join, hamming verify) is JVM bit arithmetic.  Narrow
    transformation: partitioning preserved; repartition before this
    stage to spread decode work."""

    def _hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": [phash64(image_pixels(b)) for b in pdf["content"]],
                }
            )

    return df.select(id_col, "content").mapInPandas(_hash_batches, PHASH_SCHEMA)


def phash_near_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = PHASH_MAX_HAMMING,
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: explode each
    hash into its LSH bands, equi-join on (band index, band value) for
    candidates, verify with bit_count(xor) ≤ max_hamming — the same
    banded-hamming shape as simhash text dedup, so the pair join never
    goes all-pairs (candidates only where 16 consecutive bits agree
    exactly).  All JVM bit ops; one exchange keyed on the band value.
    Works for ANY 63-bit hash column (``hash_col``) — the audio
    fingerprint reuses it unchanged."""
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.shiftrightunsigned(F.col(hash_col), b * PHASH_BAND_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("v"),
            )
            for b in range(PHASH_BANDS)
        ]
    )
    # hashed comes out of the Python decode stage and feeds BOTH join
    # sides — materialize it once so the decoders run once, not per
    # alias (the containment_pairs grams rationale)
    # lazy checkpoint: subtree must be deterministic (see operators/dedup.py DETERMINISM note)
    keyed = hashed.localCheckpoint(eager=False).select(
        F.col(id_col), hash_col, F.explode(bands).alias("__band")
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("__pa"), "__band"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("__pb"), "__band"
    )
    return (
        a.join(b, "__band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__pa", "__pb")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("__pa").bitwiseXOR(F.col("__pb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def audio_fingerprint63(samples) -> int:
    """63-bit energy-delta audio fingerprint, fully deterministic in
    the INTEGER domain: the first 128 samples split into 64 frames of
    2; bit i = 1 iff frame i+1 has higher energy (sum of squared int
    samples) than frame i.  Positive amplitude scaling preserves every
    delta sign, so re-encoded / gain-adjusted copies of the same
    recording land within a few bits (only rounding near equal-energy
    frames can flip one)."""
    import numpy as np

    x = np.asarray(samples[:128], dtype=np.int64)
    if x.size < 128:
        x = np.pad(x, (0, 128 - x.size))
    e = (x.reshape(64, 2) ** 2).sum(axis=1)
    bits = 0
    for i in range(63):
        if int(e[i + 1]) > int(e[i]):
            bits |= 1 << i
    return bits


def fingerprint_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, content) → (id, 63-bit audio fingerprint) via Arrow-batched
    mapInPandas over the REAL WAV decoder — the audio twin of
    phash_images; downstream banding/verify reuses phash_near_pairs
    unchanged (hash_col='fingerprint')."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("fingerprint", T.LongType(), False),
        ]
    )

    def _fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for buf in pdf["content"]:
                _rate, _full, _n, ints = wav_samples(bytes(buf))
                fps.append(audio_fingerprint63(ints))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "fingerprint": fps}
            )

    return df.select(id_col, "content").mapInPandas(_fp_batches, schema)


def nearest_resize_indices(src: int, out: int) -> list[int]:
    """Source index per output position for nearest-neighbor
    resampling — the floor mapping ``(i · src) // out``, pure integer
    arithmetic so every engine/oracle picks identical pixels."""
    if src <= 0 or out <= 0:
        raise ValueError("resize dimensions must be positive")
    return [(i * src) // out for i in range(out)]


def sobel_energy(pixels) -> int:
    """Integer Sobel gradient energy of a decoded pixel array: luma by
    the same ITU-R 601 floor-division weights as :func:`phash64`,
    valid-mode 3x3 Gx/Gy convolution (interior pixels only — no
    padding convention to disagree about), energy = Σ(|gx| + |gy|).
    Pure int64 arithmetic end to end, so the Spark side (real decoder)
    and the oracle side (fixture keystream) must agree bit-for-bit."""
    import numpy as np

    arr = np.asarray(pixels)
    if arr.ndim == 3:
        a = arr.astype(np.int64)
        if arr.shape[2] >= 3:
            luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
        else:
            luma = a[..., 0]
    else:
        luma = arr.astype(np.int64)
    h, w = luma.shape
    if h < 3 or w < 3:
        return 0
    gx = (
        luma[:-2, 2:] + 2 * luma[1:-1, 2:] + luma[2:, 2:]
        - luma[:-2, :-2] - 2 * luma[1:-1, :-2] - luma[2:, :-2]
    )
    gy = (
        luma[2:, :-2] + 2 * luma[2:, 1:-1] + luma[2:, 2:]
        - luma[:-2, :-2] - 2 * luma[:-2, 1:-1] - luma[:-2, 2:]
    )
    return int(np.abs(gx).sum() + np.abs(gy).sum())


EDGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("edge_energy", T.LongType(), False),
    ]
)


def edge_energy_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, content) → (id, w, h, Sobel edge energy) via Arrow-batched
    mapInPandas over the REAL pixel decoders — the feature-extraction
    stage of an image quality/complexity filter (flat or synthetic
    images score near zero; photographic content scores high).  Narrow
    transformation: partitioning preserved; the convolution is
    vectorized numpy on decoded interiors, one narrow row out per
    image."""
    import numpy as np

    def _edge_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["content"]):
                px = np.asarray(image_pixels(buf))
                h, w = px.shape[0], px.shape[1]
                rows.append((int(i), int(w), int(h), sobel_energy(px)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "edge_energy"]
            )

    return df.select(id_col, "content").mapInPandas(_edge_batches, EDGE_SCHEMA)


def resize_pixels_nearest(pixels, out_w: int, out_h: int):
    """Nearest-neighbor resample of a decoded pixel array ((h, w) or
    (h, w, c), any integer dtype): advanced-index the first two axes
    with the floor grid.  Pure array math, shared verbatim by the
    Spark operator and the fixture oracle's closed form."""
    import numpy as np

    arr = np.asarray(pixels)
    ys = nearest_resize_indices(arr.shape[0], out_h)
    xs = nearest_resize_indices(arr.shape[1], out_w)
    return arr[np.ix_(ys, xs)]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("resized_sum", T.LongType(), False),
        T.StructField("resized_sha", T.StringType(), False),
    ]
)


def resize_image_nearest(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """binary content → nearest-neighbor-resized pixel features via
    Arrow-batched mapInPandas: decode at pixel level
    (:func:`image_pixels` — PNG native, JPEG via operators/jpeg.py),
    resample with the shared floor grid, reduce to the resized pixel
    sum + sha256 of the resized raw bytes (row-major, native dtype).

    Narrow transformation — partitioning preserved; the Python cost is
    per-image decode+gather, the reduction leaves one narrow row per
    image.  The preprocessing step of a vision training pipeline
    (thumbnail / fixed-input-size normalization)."""
    import numpy as np

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["content"]):
                rz = resize_pixels_nearest(image_pixels(buf), out_w, out_h)
                c = 1 if rz.ndim == 2 else int(rz.shape[2])
                rows.append(
                    (
                        int(i),
                        out_w,
                        out_h,
                        c,
                        int(rz.sum()),
                        hashlib.sha256(np.ascontiguousarray(rz).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "out_width",
                    "out_height",
                    "n_channels",
                    "resized_sum",
                    "resized_sha",
                ],
            )

    return df.select(id_col, "content").mapInPandas(_resize_batches, RESIZED_SCHEMA)


def halve_samples(samples):
    """Pure decimate-by-2 with pair averaging (floor division) — the
    shared resample math: operator (over decoded WAV samples) and
    oracle (over the fixture keystream) both call THIS, the decoder
    stays operator-side only.  int64 out; values stay in int16 range
    (floor mean of two int16 is int16)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    n2 = (arr.shape[0] // 2) * 2
    return arr[:n2].reshape(-1, 2).sum(axis=1) // 2


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_rate", T.IntegerType(), False),
        T.StructField("n_out", T.LongType(), False),
        T.StructField("res_sum", T.LongType(), False),
        T.StructField("res_sq_sum", T.LongType(), False),
        T.StructField("res_sha", T.StringType(), False),
    ]
)


def resample_audio_half(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """binary WAV content → 2:1 decimated sample features via
    Arrow-batched mapInPandas: sample-level decode
    (:func:`wav_samples`), :func:`halve_samples` pair averaging,
    reduced to sample count, sum, squared sum, and sha256 of the
    int16-packed resampled stream.

    Narrow transformation — partitioning preserved, one short row per
    clip out; the audio-pipeline preprocessing step (sample-rate
    normalization before feature extraction)."""
    import numpy as np

    def _resample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["content"]):
                rate, _fs, _n, samples = wav_samples(buf)
                res = halve_samples(samples)
                rows.append(
                    (
                        int(i),
                        rate // 2,
                        int(res.shape[0]),
                        int(res.sum()),
                        int((res * res).sum()),
                        hashlib.sha256(
                            res.astype("<i2").tobytes()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "out_rate",
                    "n_out",
                    "res_sum",
                    "res_sq_sum",
                    "res_sha",
                ],
            )

    return df.select(id_col, "content").mapInPandas(
        _resample_batches, RESAMPLED_SCHEMA
    )


def trim_silence_bounds(samples, threshold: int):
    """Pure leading/trailing silence trim — the shared math: operator
    (over decoded WAV samples) and oracle (over the fixture keystream)
    both call THIS, the decoder stays operator-side only.  Samples
    with ``|s| < threshold`` are silence; returns
    ``(n_lead, n_trail, kept)`` where ``kept`` is the int64 slice
    between the first and last loud sample (empty if the whole clip is
    silent, in which case everything counts as leading silence)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    loud = np.flatnonzero(np.abs(arr) >= threshold)
    if loud.size == 0:
        return int(arr.shape[0]), 0, arr[:0]
    lead, last = int(loud[0]), int(loud[-1])
    return lead, int(arr.shape[0] - 1 - last), arr[lead : last + 1]


TRIMMED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_in", T.LongType(), False),
        T.StructField("n_lead", T.LongType(), False),
        T.StructField("n_trail", T.LongType(), False),
        T.StructField("n_kept", T.LongType(), False),
        T.StructField("kept_sum", T.LongType(), False),
        T.StructField("kept_sha", T.StringType(), False),
    ]
)


def trim_silence_audio(
    df: DataFrame, threshold: int, id_col: str = "doc_id"
) -> DataFrame:
    """binary WAV content → leading/trailing silence trim via
    Arrow-batched mapInPandas: sample-level decode
    (:func:`wav_samples`), :func:`trim_silence_bounds`, reduced to
    trim counts + kept-sample sum + sha256 of the int16-packed kept
    stream.  The speech-pipeline preprocessing step (endpointing
    before feature extraction); narrow transformation, one short row
    per clip out."""

    def _trim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["content"]):
                _rate, _fs, n, samples = wav_samples(buf)
                lead, trail, kept = trim_silence_bounds(samples, threshold)
                rows.append(
                    (
                        int(i),
                        int(n),
                        lead,
                        trail,
                        int(kept.shape[0]),
                        int(kept.sum()),
                        hashlib.sha256(kept.astype("<i2").tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_in",
                    "n_lead",
                    "n_trail",
                    "n_kept",
                    "kept_sum",
                    "kept_sha",
                ],
            )

    return df.select(id_col, "content").mapInPandas(_trim_batches, TRIMMED_SCHEMA)


# --- ViT-style patch extraction -------------------------------------------

PATCH_SCHEMA = (
    "doc_id bigint, patch_row bigint, patch_col bigint, patch_sum bigint"
)


def patch_sums(pixels, patch: int):
    """Non-overlapping ``patch``×``patch`` tile sums over the decoded
    array's full-tile grid (ragged edges truncate — the ViT convention
    when inputs aren't pre-resized), summed across channels.  Returns a
    (rows, cols) int64 matrix.  Pure array math, shared verbatim by
    the Spark operator and the fixture oracle's closed form (the
    sobel_energy sharing pattern)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.int64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, _c = arr.shape
    ph, pw = h // patch, w // patch
    core = arr[: ph * patch, : pw * patch, :].sum(axis=2)
    return core.reshape(ph, patch, pw, patch).sum(axis=(1, 3))


def image_patch_features(
    df: DataFrame, patch: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, content) → one row per non-overlapping ``patch``×``patch``
    tile with its integer pixel sum — the tokenization step of a ViT
    training pipeline (patch embeddings consume exactly this tiling;
    the sum is the projection-free integer reduction the oracle can
    check).  Arrow-batched mapInPandas over the REAL pixel decoders;
    narrow (partitioning preserved), fan-out bounded by
    (w/patch)·(h/patch) rows per image."""

    def _patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["content"]):
                s = patch_sums(image_pixels(buf), patch)
                for (pr, pc), v in np.ndenumerate(s):
                    rows.append((int(i), int(pr), int(pc), int(v)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "patch_row", "patch_col", "patch_sum"]
            )

    return df.select(id_col, "content").mapInPandas(_patch_batches, PATCH_SCHEMA)
