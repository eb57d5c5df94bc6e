"""Native baseline JPEG codec (pure numpy + stdlib) — no Pillow.

Closes the last compressed-codec gap in the multimodal decode path
(`operators/multimodal.py`): PPM/BMP/PNG already decode natively; this
module adds ITU T.81 *baseline sequential* JPEG:

- ``decode_baseline_jpeg``: SOI/APPn/DQT/SOF0/DHT/DRI/SOS parsing,
  canonical Huffman entropy decode (tables read from the file's DHT
  segments, so files from any conforming encoder — including Pillow —
  decode), interleaved MCUs with sampling factors up to 2x2 (4:4:4,
  4:2:2, 4:2:0), restart markers, dequant + inverse DCT (separable
  orthonormal matrix form), nearest-neighbour chroma upsample, JFIF
  YCbCr→RGB.  Progressive (SOF2) and 12-bit inputs raise
  ``NotImplementedError`` — the multimodal dispatch falls back to
  Pillow when present.
- ``encode_baseline_jpeg``: the fixture-side encoder.  4:4:4, flat
  quantization tables, and *fixed-length canonical Huffman tables*
  (12 DC symbols at 4 bits, 162 AC symbols at 8 bits — valid
  incomplete prefix codes per T.81, all-ones code never assigned).
  JPEG carries its Huffman tables in the DHT segment, so a conforming
  decoder needs no out-of-band table knowledge; choosing fixed-length
  tables trades compression (irrelevant for fixtures) for an encoder
  with no frequency pass.

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
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


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
        b = self.data[self.pos]
        if b == 0xFF:
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
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
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


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


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


# --- decoder ---------------------------------------------------------------


def decode_baseline_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline-sequential JPEG to HxW (gray) or HxWx3 (RGB)
    uint8.  Raises NotImplementedError for progressive/extended frames
    so callers can fall back to an optional full codec."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, fh, fw, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker 0x{marker:02x})"
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
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0xF))
            data_start = pos + 2 + length
            return _decode_scan(
                buf, data_start, frame, scan, qtables, htables, restart_interval
            )
        pos += 2 + length
    raise ValueError("no scan data found")


def _decode_scan(buf, pos, frame, scan, qtables, htables, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(
            np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(buf, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(scan)
            for ci, (comp, dc_id, ac_id) in enumerate(scan):
                dc_tab = htables[(0, dc_id)]
                ac_tab = htables[(1, ac_id)]
                qt = qtables[comp["tq"]]
                for v in range(comp["v"]):
                    for hblk in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = dc_tab.decode(br)
                        diff = _extend(br.receive(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(br)
                            if rs == 0x00:  # EOB
                                break
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        coef = np.zeros((8, 8))
                        coef[_ZIG_ROWS, _ZIG_COLS] = zz
                        block = _DCT.T @ (coef * qt) @ _DCT + 128.0
                        y0 = (my * comp["v"] + v) * 8
                        x0 = (mx * comp["h"] + hblk) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full resolution, crop
    full = []
    for (comp, _, _), plane in zip(scan, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component JPEG unsupported")
