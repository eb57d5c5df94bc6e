"""Native baseline JPEG codec (pure numpy + stdlib) — no Pillow.

Closes the last compressed-codec gap in the multimodal decode path
(`operators/multimodal.py`): PPM/BMP/PNG already decode natively; this
module adds ITU T.81 JPEG — *baseline sequential* (SOF0/1) and
*progressive* (SOF2):

- ``decode_baseline_jpeg``: SOI/APPn/DQT/SOF0/DHT/DRI/SOS parsing,
  canonical Huffman entropy decode (tables read from the file's DHT
  segments, so files from any conforming encoder — including Pillow —
  decode), interleaved MCUs with sampling factors up to 2x2 (4:4:4,
  4:2:2, 4:2:0), restart markers, dequant + inverse DCT (separable
  orthonormal matrix form), nearest-neighbour chroma upsample, JFIF
  YCbCr→RGB.  Progressive (SOF2) decodes NATIVELY too (spectral
  selection + successive approximation, DC and AC refinement scans),
  as do LOSSLESS (SOF3: predictors 1-7, point transform, 2-16-bit
  precision, bit-exact) and 12-bit DCT gray AND color (level shift
  2048, precision-parametric YCbCr, uint16 output); only
  hierarchical/differential frames, arithmetic coding, and
  subsampled lossless raise
  ``NotImplementedError`` — the multimodal dispatch falls back to
  Pillow for those when present.
- ``encode_lossless_jpeg``: SOF3 fixture encoder (canonical 5-bit
  Huffman over categories 0-16); decode recovers the input
  bit-exactly.
- ``encode_baseline_jpeg``: the fixture-side encoder.  4:4:4, flat
  quantization tables, and *fixed-length canonical Huffman tables*
  (12 DC symbols at 4 bits, 162 AC symbols at 8 bits — valid
  incomplete prefix codes per T.81, all-ones code never assigned).
  JPEG carries its Huffman tables in the DHT segment, so a conforming
  decoder needs no out-of-band table knowledge; choosing fixed-length
  tables trades compression (irrelevant for fixtures) for an encoder
  with no frequency pass.  ``encode_progressive_jpeg`` emits an SOF2
  stream whose scan script exercises every progressive feature and
  whose decoded pixels are IDENTICAL to the baseline encoding of the
  same image (same quantized coefficients) — the cross-check the
  tests assert.

Reference parity: the reference pipeline treats payloads as opaque
``byte[]`` and delegates typing to a pluggable deserializer
(kafka/deserializer/Deserializer.java:36); this codec is the "real
deserializer" end of that seam for image columns.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants -------------------------------------------------------

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return order


_ZIGZAG = _zigzag_order()
_ZIG_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZIG_COLS = np.array([c for _, c in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5  # orthonormal: F = C @ f @ C.T


_DCT = _dct_matrix()

#: flat quantization tables — mild loss, any 1..255 entries are valid
_QT_LUMA = np.full((8, 8), 8, dtype=np.uint16)
_QT_CHROMA = np.full((8, 8), 12, dtype=np.uint16)

#: encoder Huffman tables: canonical, fixed-length.  DC: categories
#: 0..11 as 4-bit codes (12 of 16 — all-ones unused).  AC: the 162
#: baseline run/size symbols as 8-bit codes (162 of 256).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    # progressive-only EOBRUN codes (r<<4)|0, r=1..14 — unused by the
    # baseline scan but carried in the same table so both encoders
    # share one DHT layout (a Huffman table may hold unused symbols)
    + [(r << 4) for r in range(1, 15)]
)


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, bit-length), canonical assignment at one length."""
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, 4)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 8)


def _dht_payload(table_class: int, table_id: int, symbols: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bytes([(table_class << 4) | table_id] + bits + symbols)


# --- bit I/O ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (code & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: feed 1-bits (T.81 F.2.2.5 padding semantics)
            self._acc = (self._acc << 8) | 0xFF
            self._nbits += 8
            return
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller via sync()
                self.marker = nxt
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
            else:
                self.marker = nxt
                self._acc = (self._acc << 8) | 0xFF
                self._nbits += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._acc = 0
        self._nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
            return
        # marker not seen yet: it must be next in the stream
        while (
            self.pos + 1 < len(self.data)
            and (self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00)
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG stream")
        if 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


# --- Huffman decode tables -------------------------------------------------


class _HuffTable:
    """Canonical decode per T.81 F.2.2.3: mincode/maxcode per length."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.huffval = huffval

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt Huffman stream")
        return self.huffval[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, appended bits)."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# --- encoder ---------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, precision: int = 8
) -> np.ndarray:
    """JFIF inverse color transform, precision-parametric: chroma
    centers at 2^(P-1) and output clips to [0, 2^P - 1] (uint8 for
    8-bit, uint16 for 12-bit)."""
    center = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    cb = cb - center
    cr = cr - center
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    dtype = np.uint8 if precision == 8 else np.uint16
    return np.clip(np.stack([r, g, b], axis=-1), 0, maxv).astype(dtype)


def encode_baseline_jpeg(arr: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 to baseline JPEG
    (4:4:4, flat quant, fixed-length canonical Huffman tables)."""
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = (
        [arr.astype(np.float64)]
        if gray
        else [c for c in np.moveaxis(_rgb_to_ycbcr(arr), -1, 0)]
    )
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA])

    # pad to 8x8 multiples (edge replicate)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ] if (ph != h or pw != w) else planes

    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                qt = qts[min(ci, 1)].astype(np.float64)
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = _DCT @ block @ _DCT.T
                q = np.round(coef / qt).astype(np.int64)
                zz = q[_ZIG_ROWS, _ZIG_COLS]
                # DC
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, extra = _magnitude(diff) if diff else (0, 0)
                code, n = _DC_CODES[s]
                bw.write(code, n)
                if s:
                    bw.write(extra, s)
                # AC
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for i in range(1, 64):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, n = _AC_CODES[0xF0]  # ZRL
                        bw.write(code, n)
                        run -= 16
                    s, extra = _magnitude(v)
                    code, n = _AC_CODES[(run << 4) | s]
                    bw.write(code, n)
                    bw.write(extra, s)
                    run = 0
                if last_nz < 63:
                    code, n = _AC_CODES[0x00]  # EOB
                    bw.write(code, n)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    zz_luma = bytes(int(_QT_LUMA[r, c]) for r, c in _ZIGZAG)
    out += seg(0xDB, b"\x00" + zz_luma)
    if not gray:
        zz_chroma = bytes(int(_QT_CHROMA[r, c]) for r, c in _ZIGZAG)
        out += seg(0xDB, b"\x01" + zz_chroma)
    # SOF0: precision 8, 1x1 sampling everywhere (4:4:4)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += seg(0xC0, sof)
    # DHT: same tables for luma and chroma slots
    out += seg(0xC4, _dht_payload(0, 0, _DC_SYMBOLS, 4))
    out += seg(0xC4, _dht_payload(1, 0, _AC_SYMBOLS, 8))
    if not gray:
        out += seg(0xC4, _dht_payload(0, 1, _DC_SYMBOLS, 4))
        out += seg(0xC4, _dht_payload(1, 1, _AC_SYMBOLS, 8))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = min(ci, 1)
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def frame_precision(buf: bytes) -> int:
    """Sample precision (bits) from the first SOF segment — a cheap
    header scan for callers that need the output scale without a full
    decode (e.g. normalizing >8-bit means to the 0-255 range)."""
    pos = 2
    while pos < len(buf) - 3:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        length = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return buf[pos + 4]
        pos += 2 + length
    raise ValueError("no SOF segment found")


# --- decoder ---------------------------------------------------------------


#: malformed-stream internals (truncated segments, dangling table ids,
#: bit-reader overruns) normalize to the documented ValueError contract
#: at the public boundary — see operators/multimodal.py codec_boundary
#: and tests/test_decoder_error_contract.py.
_JPEG_INTERNAL = (struct.error, IndexError, KeyError, AttributeError, OverflowError)


def _jpeg_boundary(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (ValueError, NotImplementedError):
            raise
        except _JPEG_INTERNAL as e:
            raise ValueError(f"corrupt JPEG payload: {type(e).__name__}: {e}") from e

    return wrapped


@_jpeg_boundary
def decode_baseline_jpeg(buf: bytes) -> np.ndarray:
    """Decode JPEG to HxW (gray) or HxWx3 (RGB) uint8.

    Handles baseline sequential (SOF0/1) and PROGRESSIVE (SOF2) frames:
    every scan — interleaved or single-component, DC or AC spectral
    band, first pass or successive-approximation refinement — is
    accumulated into per-component coefficient buffers; dequant + IDCT
    run once at EOI.  (The name predates progressive support and is
    kept for API stability.)  Hierarchical/lossless/12-bit frames raise
    NotImplementedError so callers can fall back to an optional full
    codec."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    coefs = None
    pred = None
    while pos < len(buf) - 1:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack(">H", buf[pos + 2 : pos + 4])[0]
        payload = buf[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                raw = payload[i : i + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2")
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.float64)
                qt = np.zeros((8, 8))
                qt[_ZIG_ROWS, _ZIG_COLS] = vals
                qtables[tq] = qt
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(payload[i + 17 : i + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, huffval)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 (DCT), SOF3 lossless
            precision, fh, fw, ncomp = struct.unpack(">BHHB", payload[:6])
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError(f"invalid lossless precision {precision}")
            elif precision not in (8, 12):
                raise NotImplementedError("DCT JPEG precision must be 8 or 12")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {
                "h": fh,
                "w": fw,
                "comps": comps,
                "precision": precision,
                "progressive": marker == 0xC2,
                "lossless": lossless,
            }
            if lossless and any(c["h"] != 1 or c["v"] != 1 for c in comps):
                raise NotImplementedError("subsampled lossless JPEG unsupported")
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for c in range(ns):
                cid, tabs = payload[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    (i for i, x in enumerate(frame["comps"]) if x["id"] == cid),
                    None,
                )
                if ci is None:
                    raise ValueError(f"SOS references unknown component id {cid}")
                scan.append((ci, tabs >> 4, tabs & 0xF))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah, al = payload[3 + 2 * ns] >> 4, payload[3 + 2 * ns] & 0xF
            if frame["lossless"]:
                # lossless scan header reuse: Ss = predictor selector,
                # Al = point transform (T.81 H.1)
                if coefs is None:
                    coefs = [
                        np.zeros((frame["h"], frame["w"]), dtype=np.int64)
                        for _ in frame["comps"]
                    ]
                pos = _decode_sos_lossless(
                    buf, pos + 2 + length, frame, scan, ss, al,
                    htables, restart_interval, coefs,
                )
                continue
            if coefs is None:
                coefs, pred = _alloc_coefs(frame)
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_sos(
                buf, pos + 2 + length, frame, scan, ss, se, ah, al,
                htables, restart_interval, coefs, pred,
            )
            continue
        pos += 2 + length
    if coefs is None:
        raise ValueError("no scan data found")
    if frame["lossless"]:
        return _reconstruct_lossless(frame, coefs)
    return _reconstruct(frame, coefs, qtables)


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(frame):
    """Per-component coefficient buffers (block grid padded to the MCU
    grid) in zigzag order, plus DC predictors."""
    _, _, mcux, mcuy = _frame_geometry(frame)
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]
    return coefs, [0] * len(frame["comps"])


def _comp_block_dims(frame, comp):
    """ACTUAL block grid of one component (non-interleaved scans cover
    this, not the MCU-padded grid)."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    sw = -(-frame["w"] * comp["h"] // hmax)
    sh = -(-frame["h"] * comp["v"] // vmax)
    return -(-sw // 8), -(-sh // 8)


def _decode_sos(buf, pos, frame, scan, ss, se, ah, al, htables, dri, coefs, pred):
    """Decode one scan's entropy data into the coefficient buffers;
    returns the buffer position of the next marker."""
    br = _BitReader(buf, pos)
    state = {"eobrun": 0}

    def block(ci, dc_id, ac_id, by, bx):
        _decode_block(
            br, coefs[ci][by, bx], ss, se, ah, al,
            htables.get((0, dc_id)), htables.get((1, ac_id)),
            pred, ci, state,
        )

    if len(scan) > 1:  # interleaved (MCU order)
        _, _, mcux, mcuy = _frame_geometry(frame)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and unit and unit % dri == 0:
                    br.sync_restart()
                    for ci, _, _ in scan:
                        pred[ci] = 0
                    state["eobrun"] = 0
                for ci, dc_id, ac_id in scan:
                    comp = frame["comps"][ci]
                    for v in range(comp["v"]):
                        for hb in range(comp["h"]):
                            block(ci, dc_id, ac_id, my * comp["v"] + v, mx * comp["h"] + hb)
                unit += 1
    else:  # single component: raster over ITS block grid
        ci, dc_id, ac_id = scan[0]
        bw, bh = _comp_block_dims(frame, frame["comps"][ci])
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and unit and unit % dri == 0:
                    br.sync_restart()
                    pred[ci] = 0
                    state["eobrun"] = 0
                block(ci, dc_id, ac_id, by, bx)
                unit += 1

    # advance to the next marker (skip stuffed 0xFF00 and padding)
    p = br.pos
    while p < len(buf) - 1 and not (buf[p] == 0xFF and buf[p + 1] != 0x00):
        p += 1
    return p


def _decode_block(br, zz, ss, se, ah, al, dc_tab, ac_tab, pred, ci, state):
    """Decode one block's contribution for one scan into ``zz`` (zigzag
    int64 view).  Covers all four progressive scan kinds; baseline is
    the (ss=0, se=63, ah=0, al=0) special case of the first-pass path."""
    if ah == 0:
        k = ss
        if ss == 0:  # DC first pass (or baseline DC)
            s = dc_tab.decode(br)
            diff = _extend(br.receive(s), s) if s else 0
            pred[ci] += diff
            zz[0] = pred[ci] << al
            k = 1
        if k > se:
            return
        if state["eobrun"] > 0:  # band of this block is entirely zero
            state["eobrun"] -= 1
            return
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + (br.receive(r) if r else 0)
                break
            k += r
            if k > se:
                raise ValueError("AC index out of range")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1
    else:  # refinement (successive approximation)
        if ss == 0:  # DC refinement: one raw bit
            if br.receive(1):
                zz[0] |= 1 << al
            return
        p1, m1 = 1 << al, -(1 << al)

        def refine_nonzero(k):
            # correction bit for an already-significant coefficient
            if br.receive(1) and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = ac_tab.decode(br)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r < 15:  # EOB: current block included in the run
                        state["eobrun"] = (1 << r) - 1 + (br.receive(r) if r else 0)
                        break
                    # ZRL: advance past 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("invalid refinement size")
                    newval = p1 if br.receive(1) else m1
                # advance over r zero-history slots, refining nonzeros
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        else:
            state["eobrun"] -= 1
        # EOB (or eobrun) path: refine remaining nonzeros through the band
        while k <= se:
            if zz[k] != 0:
                refine_nonzero(k)
            k += 1


def _reconstruct(frame, coefs, qtables):
    fh, fw = frame["h"], frame["w"]
    precision = frame.get("precision", 8)
    shift = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    hmax, vmax, _, _ = _frame_geometry(frame)
    full = []
    for comp, cbuf in zip(frame["comps"], coefs):
        qt = qtables[comp["tq"]]
        bh_, bw_ = cbuf.shape[0], cbuf.shape[1]
        plane = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
        for by in range(bh_):
            for bx in range(bw_):
                coef = np.zeros((8, 8))
                coef[_ZIG_ROWS, _ZIG_COLS] = cbuf[by, bx].astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ (coef * qt) @ _DCT + shift
                )
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    dtype = np.uint8 if precision == 8 else np.uint16
    if len(full) == 1:
        return np.clip(full[0], 0, maxv).astype(dtype)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2], precision)
    raise NotImplementedError(f"{len(full)}-component JPEG unsupported")


# --- lossless (SOF3) -------------------------------------------------------

#: lossless predictors, T.81 H.1.2.1: Px from Ra (left), Rb (above),
#: Rc (above-left)
def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _lossless_px(
    samples, y: int, x: int, sel: int, default: int, ry: int = 0, rx: int = 0
) -> int:
    """Prediction for sample (y, x) per T.81 H.1.2.2/H.2.2, treating
    the restart-interval origin (ry, rx) — scan start or the first
    sample after the latest RSTn — as a new scan start: the origin
    sample uses the default 2^(P-Pt-1); the remainder of the origin
    line predicts from Ra only (1-D predictor, no references to
    pre-restart samples on that line); subsequent lines predict Rb in
    column 0 and run the selected predictor elsewhere."""
    if y == ry:
        return default if x == rx else int(samples[y, x - 1])
    if x == 0:
        return int(samples[y - 1, 0])
    return _predict(
        int(samples[y, x - 1]),
        int(samples[y - 1, x]),
        int(samples[y - 1, x - 1]),
        sel,
    )


def _decode_sos_lossless(buf, pos, frame, scan, sel, pt, htables, dri, samples):
    """Decode one lossless scan: Huffman category + extend bits give
    the prediction difference; reconstruction is (Px + diff) mod 2^16.
    Interleaved (1x1 sampling: one sample per component per MCU) and
    single-component scans share the raster walk.  After each RSTn the
    predictor restarts as at scan start (T.81 H.1.2.2/H.2.2): the next
    sample uses the default, the rest of that line uses the 1-D Ra
    predictor, and 2-D prediction resumes on the following line."""
    frame["pt"] = pt
    precision = frame["precision"]
    default = 1 << (precision - pt - 1)
    br = _BitReader(buf, pos)
    h, w = frame["h"], frame["w"]
    origin = (0, 0)  # restart-interval origin, shared by all scan comps

    def one(ci, dc_id, y, x):
        tab = htables.get((0, dc_id))
        if tab is None:
            raise ValueError(f"undefined DC table {dc_id}")
        s = tab.decode(br)
        if s == 16:  # T.81 H.1.2.3: SSSS=16 means diff = 32768, no bits
            diff = 32768
        else:
            diff = _extend(br.receive(s), s) if s else 0
        px = _lossless_px(samples[ci], y, x, sel, default, origin[0], origin[1])
        samples[ci][y, x] = (px + diff) & 0xFFFF

    unit = 0
    if len(scan) > 1:
        for y in range(h):
            for x in range(w):
                if dri and unit and unit % dri == 0:
                    br.sync_restart()
                    origin = (y, x)
                for ci, dc_id, _ in scan:
                    one(ci, dc_id, y, x)
                unit += 1
    else:
        ci, dc_id, _ = scan[0]
        for y in range(h):
            for x in range(w):
                if dri and unit and unit % dri == 0:
                    br.sync_restart()
                    origin = (y, x)
                one(ci, dc_id, y, x)
                unit += 1

    p = br.pos
    while p < len(buf) - 1 and not (buf[p] == 0xFF and buf[p + 1] != 0x00):
        p += 1
    return p


def _reconstruct_lossless(frame, samples):
    """Assemble decoded lossless planes: apply the point transform
    (sample << Pt) and stack components as stored — lossless JPEG
    defines no color transform, so 3-component output is plain RGB."""
    pt = frame.get("pt", 0)
    precision = frame["precision"]
    dtype = np.uint8 if precision <= 8 else np.uint16
    planes = [(s << pt).astype(dtype) for s in samples]
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        return np.stack(planes, axis=-1)
    raise NotImplementedError(f"{len(planes)}-component lossless JPEG unsupported")


#: lossless encoder Huffman table: categories 0..16 as canonical
#: 5-bit codes (17 of 32 — valid incomplete prefix code)
_LL_SYMBOLS = list(range(17))
_LL_CODES = _canonical_codes(_LL_SYMBOLS, 5)


def encode_lossless_jpeg(
    arr: np.ndarray, predictor: int = 1, point_transform: int = 0,
    precision: int | None = None, restart_interval: int = 0,
) -> bytes:
    """Encode HxW (gray) or HxWx3 (RGB, stored untransformed) to
    LOSSLESS JPEG (SOF3): predictor 1-7, optional point transform,
    2-16-bit precision (default: 8 for uint8 input, 16 for uint16),
    optional restart markers every ``restart_interval`` MCUs (one
    sample per component at 1x1 sampling; after each RSTn prediction
    restarts as at scan start — default for the first sample, 1-D Ra
    for the rest of that line, 2-D from the next line, T.81
    H.1.2.2/H.2.2).  Decoding with :func:`decode_baseline_jpeg`
    recovers ``(arr >> Pt) << Pt`` exactly — bit-exact for Pt=0."""
    gray = arr.ndim == 2
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    h, w = arr.shape[:2]
    planes = [arr] if gray else [arr[..., i] for i in range(3)]
    model = [(p.astype(np.int64) >> point_transform) for p in planes]
    default = 1 << (precision - point_transform - 1)

    entropy = bytearray()
    bw = _BitWriter()
    origin = (0, 0)
    unit = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and unit and unit % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                origin = (y, x)
            for ci, m in enumerate(model):
                px = _lossless_px(m, y, x, predictor, default, origin[0], origin[1])
                diff = (int(m[y, x]) - px) & 0xFFFF
                if diff >= 32768 and diff != 32768:
                    diff -= 65536  # back to signed [-32767, 32767]
                if diff == 32768:
                    code, nbits = _LL_CODES[16]
                    bw.write(code, nbits)
                    continue
                s = abs(diff).bit_length()
                code, nbits = _LL_CODES[s]
                bw.write(code, nbits)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            unit += 1
    bw.flush()
    entropy += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    ncomp = 1 if gray else 3
    out = b"\xff\xd8"
    out += seg(0xC4, _dht_payload(0, 0, _LL_SYMBOLS, 5))
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC3, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    out += seg(0xDA, sos)
    out += bytes(entropy)
    out += b"\xff\xd9"
    return out


# --- progressive encoder ---------------------------------------------------


def _quantized_blocks(arr: np.ndarray):
    """(planes' quantized zigzag blocks, h, w, gray) shared by both
    encoders: 4:4:4, flat tables, edge-replicate padding."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    planes = (
        [arr.astype(np.float64)]
        if gray
        else [c for c in np.moveaxis(_rgb_to_ycbcr(arr), -1, 0)]
    )
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph != h or pw != w:
        planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    out = []
    for ci, plane in enumerate(planes):
        qt = (_QT_LUMA if ci == 0 else _QT_CHROMA).astype(np.float64)
        blocks = np.empty((ph // 8, pw // 8, 64), dtype=np.int64)
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                coef = _DCT @ (plane[by : by + 8, bx : bx + 8] - 128.0) @ _DCT.T
                blocks[by // 8, bx // 8] = np.round(coef / qt).astype(np.int64)[
                    _ZIG_ROWS, _ZIG_COLS
                ]
        out.append(blocks)
    return out, h, w, gray


def encode_progressive_jpeg(arr: np.ndarray) -> bytes:
    """Encode uint8 HxW / HxWx3 to PROGRESSIVE JPEG (SOF2) with a scan
    script exercising every progressive feature: an interleaved DC
    first pass at Al=1, a DC successive-approximation refinement, per-
    component AC spectral bands (1-5, 6-63) at Al=1, and per-component
    AC refinement scans (Ah=1 -> Al=0).  Coefficients, quant tables and
    Huffman tables are identical to :func:`encode_baseline_jpeg`, so
    decoding this stream reconstructs PIXEL-IDENTICAL output to the
    baseline encoding of the same image — the cross-check the tests
    assert."""
    if arr.dtype != np.uint8:
        raise ValueError("uint8 input required")
    blocks, h, w, gray = _quantized_blocks(arr)
    ncomp = 1 if gray else 3

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    zz_luma = bytes(int(_QT_LUMA[r, c]) for r, c in _ZIGZAG)
    out += seg(0xDB, b"\x00" + zz_luma)
    if not gray:
        zz_chroma = bytes(int(_QT_CHROMA[r, c]) for r, c in _ZIGZAG)
        out += seg(0xDB, b"\x01" + zz_chroma)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, _dht_payload(0, 0, _DC_SYMBOLS, 4))
    out += seg(0xC4, _dht_payload(1, 0, _AC_SYMBOLS, 8))
    if not gray:
        out += seg(0xC4, _dht_payload(0, 1, _DC_SYMBOLS, 4))
        out += seg(0xC4, _dht_payload(1, 1, _AC_SYMBOLS, 8))

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            tid = min(cid - 1, 1)
            p += bytes([cid, (tid << 4) | tid])
        return seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    bh, bw_ = blocks[0].shape[0], blocks[0].shape[1]

    # scan 1: interleaved DC first pass, Al=1
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    bwr = _BitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(ncomp):
                v = int(blocks[ci][by, bx, 0]) >> 1  # arithmetic shift
                diff = v - pred[ci]
                pred[ci] = v
                s, extra = _magnitude(diff) if diff else (0, 0)
                code, n = _DC_CODES[s]
                bwr.write(code, n)
                if s:
                    bwr.write(extra, s)
    bwr.flush()
    out += bwr.out

    # scan 2: interleaved DC refinement, Ah=1 -> Al=0 (raw bits)
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    bwr = _BitWriter()
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(ncomp):
                bwr.write(int(blocks[ci][by, bx, 0]) & 1, 1)
    bwr.flush()
    out += bwr.out

    # scans 3..: per-component AC spectral bands, first pass Al=1.
    # EOB runs ACCUMULATE across consecutive all-zero-band blocks and
    # flush as a single EOBRUN code — the multi-block EOB path a real
    # progressive encoder emits on flat regions.
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos_header([ci + 1], ss, se, 0, 1)
            bwr = _BitWriter()
            eobrun = 0
            for by in range(bh):
                for bx in range(bw_):
                    eobrun = _encode_ac_first(
                        bwr, blocks[ci][by, bx], ss, se, 1, eobrun
                    )
            _flush_eobrun(bwr, eobrun)
            bwr.flush()
            out += bwr.out

    # final scans: per-component AC refinement Ah=1 -> Al=0
    for ci in range(ncomp):
        out += sos_header([ci + 1], 1, 63, 1, 0)
        bwr = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                _encode_ac_refine(bwr, blocks[ci][by, bx], 1, 63, 0)
        bwr.flush()
        out += bwr.out

    out += b"\xff\xd9"
    return bytes(out)


def _flush_eobrun(bwr: _BitWriter, eobrun: int) -> None:
    """Emit a pending EOB run: code (r<<4)|0 with r appended bits,
    covering (1<<r) + bits blocks (T.81 G.1.2.2)."""
    while eobrun > 0:
        r = min(eobrun.bit_length() - 1, 14)
        chunk = min(eobrun, (2 << r) - 1)
        code, n = _AC_CODES[r << 4]
        bwr.write(code, n)
        if r:
            bwr.write(chunk - (1 << r), r)
        eobrun -= chunk


def _encode_ac_first(bwr: _BitWriter, zz, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC first-pass scan for one block: run/size over magnitudes
    truncated to ``>> al`` (toward zero).  All-zero bands extend the
    caller's EOB run; any emitted coefficient flushes it first.
    Returns the updated run."""
    run = 0
    emitted_any = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)
        if t == 0:
            run += 1
            continue
        if not emitted_any and eobrun:
            _flush_eobrun(bwr, eobrun)
            eobrun = 0
        while run > 15:
            code, n = _AC_CODES[0xF0]
            bwr.write(code, n)
            run -= 16
        s, extra = _magnitude(t)
        code, n = _AC_CODES[(run << 4) | s]
        bwr.write(code, n)
        bwr.write(extra, s)
        run = 0
        emitted_any = True
    if emitted_any:
        if run > 0:
            code, n = _AC_CODES[0x00]  # EOB closes this block only
            bwr.write(code, n)
        return eobrun
    return eobrun + 1  # whole band zero: extend the run


def _encode_ac_refine(bwr: _BitWriter, zz, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3), emitted
    by SIMULATING the decoder's advance so correction bits land exactly
    where each code's advance will read them: a ZRL's attached bits
    cover only the already-significant coefficients inside ITS 16
    currently-zero-slot span (not the whole run), a run/1 code carries
    the sign then the span's correction bits, and the closing EOB
    carries the bits for the band's remaining nonzeros."""

    def t(j: int) -> int:
        return abs(int(zz[j])) >> al

    def bit(j: int) -> int:
        return t(j) & 1

    k = ss
    while k <= se:
        nk = next((j for j in range(k, se + 1) if t(j) == 1), None)
        if nk is None:
            # EOB: decoder refines every remaining nonzero in the band
            code, n = _AC_CODES[0x00]
            bwr.write(code, n)
            for j in range(k, se + 1):
                if t(j) > 1:
                    bwr.write(bit(j), 1)
            return
        run = sum(1 for j in range(k, nk) if t(j) == 0)
        while run > 15:
            # ZRL: advance over exactly 16 currently-zero slots,
            # refining the already-significant coefficients passed
            code, n = _AC_CODES[0xF0]
            bwr.write(code, n)
            rr = 15
            kk = k
            while True:
                if t(kk) > 1:
                    bwr.write(bit(kk), 1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                kk += 1
            k = kk + 1
            run -= 16
        code, n = _AC_CODES[(run << 4) | 1]
        bwr.write(code, n)
        bwr.write(1 if int(zz[nk]) > 0 else 0, 1)
        for j in range(k, nk):
            if t(j) > 1:
                bwr.write(bit(j), 1)
        k = nk + 1
