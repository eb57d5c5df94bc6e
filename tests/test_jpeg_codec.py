"""Native baseline JPEG codec: round-trips, subsampling, restart
markers, and the Spark decode_image integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from storm_dynamic_spout_spark.operators import jpeg as J
from storm_dynamic_spout_spark.operators.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def test_flat_color_roundtrips_exactly():
    flat = np.full((16, 24, 3), 100, dtype=np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(flat))
    assert dec.shape == (16, 24, 3)
    assert int(np.abs(dec.astype(int) - 100).max()) == 0


def test_gradient_roundtrip_small_error_and_odd_dims():
    g = np.zeros((17, 23, 3), dtype=np.uint8)
    for y in range(17):
        for x in range(23):
            g[y, x] = (x * 10 % 256, y * 13 % 256, (x + y) * 7 % 256)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g))
    assert dec.shape == g.shape  # padding cropped back
    assert float(np.abs(dec.astype(int) - g.astype(int)).mean()) < 3.0


def test_noise_roundtrip_bounded_error():
    rng = np.random.default_rng(7)
    r = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(r))
    assert float(np.abs(dec.astype(int) - r.astype(int)).mean()) < 8.0


def test_grayscale_roundtrip():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g))
    assert dec.ndim == 2 and dec.shape == (9, 11)
    assert float(np.abs(dec.astype(int) - g.astype(int)).mean()) < 4.0


def test_rejects_non_jpeg_and_subsampled_lossless():
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"not a jpeg at all")
    # SOF3 decodes natively since round 6, but SUBSAMPLED lossless
    # (sampling factors != 1x1) remains the documented seam
    sof3 = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC3, 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x22, 0])
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(sof3)


def _encode_420(arr: np.ndarray, restart_interval: int = 0) -> bytes:
    """Test-only 4:2:0 encoder (2x2 luma sampling, averaged chroma,
    optional restart markers) built from the module's primitives —
    exercises the decoder paths the 4:4:4 production encoder never
    emits."""
    h, w = arr.shape[:2]
    ycc = J._rgb_to_ycbcr(arr)
    mcux, mcuy = -(-w // 16), -(-h // 16)
    ph, pw = mcuy * 16, mcux * 16
    planes = [
        np.pad(ycc[..., i], ((0, ph - h), (0, pw - w)), mode="edge")
        for i in range(3)
    ]
    # chroma: 2x2 box average then one block per MCU
    chroma = [p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) for p in planes[1:]]

    def quant_block(plane, y0, x0, qt):
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coef = J._DCT @ block @ J._DCT.T
        q = np.round(coef / qt.astype(np.float64)).astype(np.int64)
        return q[J._ZIG_ROWS, J._ZIG_COLS]

    bw = J._BitWriter()
    pred = [0, 0, 0]

    def emit(zz, ci):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, extra = J._magnitude(diff) if diff else (0, 0)
        code, n = J._DC_CODES[s]
        bw.write(code, n)
        if s:
            bw.write(extra, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = (int(nz.max()) + 1) if nz.size else 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, n = J._AC_CODES[0xF0]
                bw.write(code, n)
                run -= 16
            s, extra = J._magnitude(v)
            code, n = J._AC_CODES[(run << 4) | s]
            bw.write(code, n)
            bw.write(extra, s)
            run = 0
        if last < 63:
            code, n = J._AC_CODES[0x00]
            bw.write(code, n)

    out_entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out_entropy += bw.out
                out_entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = J._BitWriter()
                pred = [0, 0, 0]
            for v in range(2):
                for hb in range(2):
                    emit(
                        quant_block(
                            planes[0], (my * 2 + v) * 8, (mx * 2 + hb) * 8, J._QT_LUMA
                        ),
                        0,
                    )
            for ci, cp in enumerate(chroma):
                emit(quant_block(cp, my * 8, mx * 8, J._QT_CHROMA), ci + 1)
            mcu_count += 1
    bw.flush()
    out_entropy += bw.out

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(J._QT_LUMA[r, c]) for r, c in J._ZIGZAG))
    out += seg(0xDB, b"\x01" + bytes(int(J._QT_CHROMA[r, c]) for r, c in J._ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, J._dht_payload(0, 0, J._DC_SYMBOLS, 4))
    out += seg(0xC4, J._dht_payload(1, 0, J._AC_SYMBOLS, 8))
    out += seg(0xC4, J._dht_payload(0, 1, J._DC_SYMBOLS, 4))
    out += seg(0xC4, J._dht_payload(1, 1, J._AC_SYMBOLS, 8))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += out_entropy
    out += b"\xff\xd9"
    return bytes(out)


def _smooth_image(h, w):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_decode_420_subsampled():
    img = _smooth_image(24, 40)
    dec = decode_baseline_jpeg(_encode_420(img))
    assert dec.shape == img.shape
    # chroma is box-averaged+nearest-upsampled: smooth content stays close
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 6.0


def test_decode_420_with_restart_markers():
    img = _smooth_image(40, 56)
    plain = decode_baseline_jpeg(_encode_420(img, restart_interval=0))
    rst = decode_baseline_jpeg(_encode_420(img, restart_interval=2))
    # restart markers change the byte stream, not the pixels
    assert np.array_equal(plain, rst)


def test_fixture_maker_and_spark_decode(spark):
    """make_jpeg_image payloads flow through the mapInPandas decode_image
    path with real (non-fake) decoding."""
    from storm_dynamic_spout_spark.operators.multimodal import (
        decode_image,
        make_jpeg_image,
    )

    payloads = [(i, make_jpeg_image(bytes([i]), 16, 16)) for i in range(4)]
    payloads.append((99, make_jpeg_image(b"g", 8, 8, gray=True)))
    df = spark.createDataFrame(payloads, ["doc_id", "content"])
    out = {r["doc_id"]: r for r in decode_image(df, "doc_id").collect()}
    assert out[0]["width"] == 16 and out[0]["height"] == 16
    assert out[0]["n_channels"] == 3
    assert out[99]["n_channels"] == 1
    # decoded mean tracks the true pixel mean within JPEG loss
    import hashlib

    n = 16 * 16 * 3
    raw = b""
    counter = 0
    while len(raw) < n:
        raw += hashlib.sha256(bytes([0]) + b"jpg" + counter.to_bytes(4, "little")).digest()
        counter += 1
    true_mean = float(np.frombuffer(raw[:n], dtype=np.uint8).mean())
    assert abs(out[0]["mean_intensity"] - true_mean) < 6.0


def test_property_roundtrip_arbitrary_shapes():
    """Hypothesis: any uint8 image (1..25 x 1..25, gray or RGB)
    encodes to a decodable JPEG with the exact original shape and
    bounded reconstruction error."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 25),
        w=st.integers(1, 25),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, gray, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert dec.shape == img.shape
        # flat-8/12 quantization of random noise: worst-case mean error
        # stays far under 16 grey levels
        assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 16.0

    check()


# --- MJPEG/AVI video path --------------------------------------------------


def test_avi_container_roundtrip():
    from storm_dynamic_spout_spark.operators.multimodal import (
        make_mjpeg_avi,
        parse_mjpeg_avi,
    )

    buf = make_mjpeg_avi(b"x", 16, 12, 6, fps=5)
    meta, frames = parse_mjpeg_avi(buf)
    assert meta["n_frames"] == 6 and meta["width"] == 16 and meta["height"] == 12
    assert meta["usec_per_frame"] == 200000
    assert len(frames) == 6
    for f in frames:
        arr = decode_baseline_jpeg(f)
        assert arr.shape == (12, 16, 3)


def test_avi_rejects_non_avi():
    from storm_dynamic_spout_spark.operators.multimodal import parse_mjpeg_avi

    with pytest.raises(ValueError):
        parse_mjpeg_avi(b"RIFFxxxxWAVE")


def test_real_frame_sample_spark(spark):
    """MJPEG/AVI payloads flow through the mapInPandas real frame
    sampler: evenly-spaced picks, native decode, per-frame stats."""
    from storm_dynamic_spout_spark.operators.multimodal import (
        frame_sample_real,
        make_mjpeg_avi,
    )

    rows = [(i, make_mjpeg_avi(bytes([i]), 16, 16, 10, fps=4)) for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = frame_sample_real(df, 4).collect()
    assert len(out) == 12  # 3 videos x 4 sampled frames
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, frames in by_doc.items():
        idxs = sorted(r["frame_index"] for r in frames)
        assert idxs == [0, 3, 6, 9]  # evenly spaced over 10 frames
        for r in frames:
            assert r["width"] == 16 and r["height"] == 16
            assert 0.0 < r["mean_intensity"] < 255.0


# --- progressive (SOF2) ----------------------------------------------------


def _cross_check(img):
    from storm_dynamic_spout_spark.operators.jpeg import encode_progressive_jpeg

    base = decode_baseline_jpeg(encode_baseline_jpeg(img))
    prog = decode_baseline_jpeg(encode_progressive_jpeg(img))
    assert np.array_equal(base, prog), "progressive decode diverged from baseline"


def test_progressive_pixel_identical_to_baseline():
    """The progressive scan script (DC SA first+refine, AC spectral
    bands, AC refinement) transmits exactly the same quantized
    coefficients as the baseline encoder, so decoding must reconstruct
    PIXEL-IDENTICAL output — a stronger check than bounded error."""
    rng = np.random.default_rng(5)
    for shape in [(16, 24, 3), (17, 23, 3), (32, 32, 3)]:
        _cross_check(rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8))


def test_progressive_grayscale():
    rng = np.random.default_rng(6)
    _cross_check(rng.integers(0, 256, (9, 11), dtype=np.uint8).astype(np.uint8))


def test_progressive_eobrun_multi_block():
    """Flat regions produce all-zero AC bands across many consecutive
    blocks; the encoder accumulates them into multi-block EOBRUN codes,
    exercising the decoder's run-skip path mid-scan and at scan end."""
    rng = np.random.default_rng(7)
    _cross_check(np.full((48, 64, 3), 77, dtype=np.uint8))
    mix = np.full((24, 64, 3), 10, dtype=np.uint8)
    mix[:, 32:] = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    _cross_check(mix.astype(np.uint8))


def test_progressive_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, gray, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        _cross_check(rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8))

    check()


def test_progressive_through_spark_decode(spark):
    """Progressive payloads decode natively through the mapInPandas
    image path (no Pillow fallback needed)."""
    from storm_dynamic_spout_spark.operators.jpeg import encode_progressive_jpeg
    from storm_dynamic_spout_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, encode_progressive_jpeg(img))], ["doc_id", "content"]
    )
    row = decode_image(df, "doc_id").collect()[0]
    assert row["width"] == 16 and row["height"] == 16 and row["n_channels"] == 3
    expected = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert abs(row["mean_intensity"] - float(expected.mean())) < 1e-9


def test_decoder_skips_appn_and_comment_segments():
    """Real-world files carry APP0/JFIF, APPn (EXIF), and COM segments
    the encoder never emits — the marker walk must skip them without
    affecting the decode."""
    img = _smooth_image(16, 16)
    buf = encode_baseline_jpeg(img)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    injected = buf[:2] + app0 + com + buf[2:]
    assert np.array_equal(decode_baseline_jpeg(injected), decode_baseline_jpeg(buf))


def test_property_avi_container_roundtrip():
    """Hypothesis: any (dims, frame count, fps) MJPEG/AVI round-trips
    through the container with exact meta and decodable frames."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from storm_dynamic_spout_spark.operators.multimodal import (
        make_mjpeg_avi,
        parse_mjpeg_avi,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        n=st.integers(1, 6),
        fps=st.integers(1, 30),
        seed=st.integers(0, 255),
    )
    def check(w, h, n, fps, seed):
        buf = make_mjpeg_avi(bytes([seed]), w, h, n, fps=fps)
        meta, frames = parse_mjpeg_avi(buf)
        assert meta["n_frames"] == n and meta["width"] == w and meta["height"] == h
        assert meta["usec_per_frame"] == 1_000_000 // fps
        assert len(frames) == n
        for f in frames:
            arr = decode_baseline_jpeg(f)
            assert arr.shape == (h, w, 3)

    check()


def test_wav_24bit_decode():
    """24-bit PCM WAV decodes natively: 3-byte little-endian signed
    samples, sign-extended, normalized to [-1, 1]."""
    import io
    import struct as _struct
    import wave

    from storm_dynamic_spout_spark.operators.multimodal import _decode_wav

    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    frames = b"".join(_struct.pack("<i", v)[:3] for v in vals)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(frames)
    rate, n, rms = _decode_wav(bio.getvalue())
    assert rate == 8000 and n == len(vals)
    exp = (sum((v / float(1 << 23)) ** 2 for v in vals) / len(vals)) ** 0.5
    assert abs(rms - exp) < 1e-12


def test_pgm_p5_and_stereo_wav_decode():
    """P5 grayscale netpbm decodes natively; stereo 16-bit WAV decodes
    with rms over the interleaved samples."""
    import io
    import wave

    from storm_dynamic_spout_spark.operators.multimodal import (
        _decode_ppm,
        _decode_wav,
    )

    pgm = b"P5\n4 2\n255\n" + bytes(range(8))
    w, h, c, mean = _decode_ppm(pgm)
    assert (w, h, c) == (4, 2, 1)
    assert abs(mean - 3.5) < 1e-9

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(struct.pack("<4h", 16384, -16384, 0, 32767))
    rate, n, rms = _decode_wav(bio.getvalue())
    assert rate == 16000 and n == 2  # 2 stereo frames
    exp = ((0.5**2 + 0.5**2 + 0 + (32767 / 32768) ** 2) / 4) ** 0.5
    assert abs(rms - exp) < 1e-9


def test_bmp_32bit_decode():
    """32-bit (BGRA) uncompressed BMP decodes natively; rows are
    4-byte aligned already at 32bpp."""
    from storm_dynamic_spout_spark.operators.multimodal import _decode_bmp

    w, h = 3, 2
    px = bytes(range(w * h * 4))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(px), 0, 0, 0, 0)
    )
    got_w, got_h, c, mean = _decode_bmp(header + px)
    assert (got_w, got_h, c) == (w, h, 4)
    assert abs(mean - (sum(range(24)) / 24)) < 1e-9


def test_truncated_entropy_stream_raises_valueerror_not_indexerror():
    """Error contract: malformed payloads must fail with ValueError (or
    NotImplementedError) so the multimodal Pillow-fallback dispatch can
    catch them — a bare IndexError from _BitReader escaping the decoder
    was the r5 ADVICE finding."""
    img = np.full((16, 16, 3), 77, np.uint8)
    img[4:12, 4:12] = 200  # non-flat: guarantees a non-trivial stream
    buf = encode_baseline_jpeg(img)
    # cut mid-entropy (past the headers, before EOI)
    for cut in (len(buf) - 4, len(buf) - 12, len(buf) * 3 // 4):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_baseline_jpeg(buf[:cut])


def test_truncated_restart_stream_raises_valueerror():
    img = _smooth_image(40, 56)
    buf = _encode_420(img, restart_interval=2)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_baseline_jpeg(buf[: len(buf) * 2 // 3])


# --- lossless (SOF3) and 12-bit --------------------------------------------

from storm_dynamic_spout_spark.operators.jpeg import encode_lossless_jpeg


def test_lossless_roundtrip_all_predictors_exact():
    """SOF3 lossless: every predictor 1-7 recovers gray uint8 input
    bit-exactly."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 9), dtype=np.uint8)
    for pred in range(1, 8):
        dec = decode_baseline_jpeg(encode_lossless_jpeg(img, predictor=pred))
        assert np.array_equal(dec, img), f"predictor {pred}"


def test_lossless_rgb_and_16bit_exact():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_baseline_jpeg(encode_lossless_jpeg(rgb, predictor=4)), rgb)
    img16 = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    dec = decode_baseline_jpeg(encode_lossless_jpeg(img16))
    assert dec.dtype == np.uint16 and np.array_equal(dec, img16)


def test_lossless_point_transform():
    """Pt drops low bits before prediction; decode returns
    (x >> Pt) << Pt exactly (T.81 point transform semantics)."""
    rng = np.random.default_rng(2)
    img12 = rng.integers(0, 4096, (6, 7), dtype=np.uint16)
    dec = decode_baseline_jpeg(
        encode_lossless_jpeg(img12, predictor=7, point_transform=2, precision=12)
    )
    assert np.array_equal(dec, (img12 >> 2) << 2)


def _encode12_gray(arr):
    """Test-side 12-bit baseline gray encoder: flat qt=32 keeps every
    Huffman category inside the shipped fixed-length tables (DC diff
    <= 8*2047/32 -> category <= 10)."""
    import struct as _struct

    h, w = arr.shape
    qt = np.full((8, 8), 32.0)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(arr.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    bw = J._BitWriter()
    pred = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coef = J._DCT @ (plane[by : by + 8, bx : bx + 8] - 2048.0) @ J._DCT.T
            zz = np.round(coef / qt).astype(np.int64)[J._ZIG_ROWS, J._ZIG_COLS]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s, bits = J._magnitude(diff)
            c, n = J._DC_CODES[s]
            bw.write(c, n)
            if s:
                bw.write(bits, s)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, n = J._AC_CODES[0xF0]
                    bw.write(c, n)
                    run -= 16
                s, bits = J._magnitude(v)
                c, n = J._AC_CODES[(run << 4) | s]
                bw.write(c, n)
                bw.write(bits, s)
                run = 0
            if run:
                c, n = J._AC_CODES[0x00]
                bw.write(c, n)
    bw.flush()

    def seg(m, p):
        return bytes([0xFF, m]) + _struct.pack(">H", len(p) + 2) + p

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(np.full(64, 32, np.uint8)))
    out += seg(0xC4, J._dht_payload(0, 0, J._DC_SYMBOLS, 4))
    out += seg(0xC4, J._dht_payload(1, 0, J._AC_SYMBOLS, 8))
    out += seg(0xC0, _struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(bw.out) + b"\xff\xd9"
    return out


def test_decode_12bit_baseline_gray():
    """12-bit DCT baseline (precision=12, level shift 2048): decodes
    to uint16 with error bounded by the flat-32 quantization."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4096, (16, 16)).astype(np.float64)
    img = np.round((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3)
    dec = decode_baseline_jpeg(_encode12_gray(img))
    assert dec.dtype == np.uint16 and dec.shape == (16, 16)
    assert np.abs(dec.astype(float) - img).max() < 400


def test_hierarchical_frames_still_rejected():
    """Differential/hierarchical SOF markers stay NotImplementedError
    (the honest remaining seam)."""
    img = np.zeros((8, 8), np.uint8)
    buf = bytearray(encode_baseline_jpeg(img))
    # find the SOF0 marker and rewrite it to SOF5 (differential sequential)
    i = buf.find(b"\xff\xc0")
    assert i > 0
    buf[i + 1] = 0xC5
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(buf))


def test_lossless_roundtrip_property():
    """Hypothesis fuzz: any uint8 image, any predictor, any point
    transform <= 3 round-trips to (x >> Pt) << Pt exactly."""
    from hypothesis import given, settings, strategies as st
    from hypothesis.extra import numpy as hnp

    @settings(max_examples=25, deadline=None)
    @given(
        arr=hnp.arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12))),
        pred=st.integers(1, 7),
        pt=st.integers(0, 3),
    )
    def check(arr, pred, pt):
        dec = decode_baseline_jpeg(
            encode_lossless_jpeg(arr, predictor=pred, point_transform=pt)
        )
        assert np.array_equal(dec, (arr >> pt) << pt)

    check()


def test_decode_12bit_baseline_color():
    """12-bit DCT color (4:4:4): precision-parametric YCbCr inverse
    (chroma centered at 2048, clip to 4095, uint16 out)."""
    import struct as _struct

    def rgb_to_ycbcr12(arr):
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0
        return [y, cb, cr]

    def encode12_color(arr):
        h, w = arr.shape[:2]
        qt = np.full((8, 8), 32.0)
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            for p in rgb_to_ycbcr12(arr)
        ]
        bw = J._BitWriter()
        pred = [0, 0, 0]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, plane in enumerate(planes):
                    coef = J._DCT @ (plane[by : by + 8, bx : bx + 8] - 2048.0) @ J._DCT.T
                    zz = np.round(coef / qt).astype(np.int64)[J._ZIG_ROWS, J._ZIG_COLS]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s_, bits = J._magnitude(diff)
                    c, n = J._DC_CODES[s_]
                    bw.write(c, n)
                    if s_:
                        bw.write(bits, s_)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, n = J._AC_CODES[0xF0]
                            bw.write(c, n)
                            run -= 16
                        s_, bits = J._magnitude(v)
                        c, n = J._AC_CODES[(run << 4) | s_]
                        bw.write(c, n)
                        bw.write(bits, s_)
                        run = 0
                    if run:
                        c, n = J._AC_CODES[0x00]
                        bw.write(c, n)
        bw.flush()

        def seg(m, p):
            return bytes([0xFF, m]) + _struct.pack(">H", len(p) + 2) + p

        out = b"\xff\xd8"
        out += seg(0xDB, bytes([0]) + bytes(np.full(64, 32, np.uint8)))
        out += seg(0xC4, J._dht_payload(0, 0, J._DC_SYMBOLS, 4))
        out += seg(0xC4, J._dht_payload(1, 0, J._AC_SYMBOLS, 8))
        sof = _struct.pack(">BHHB", 12, h, w, 3) + bytes(
            [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
        )
        out += seg(0xC0, sof)
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        out += bytes(bw.out) + b"\xff\xd9"
        return out

    rng = np.random.default_rng(9)
    base = rng.integers(0, 4096, (16, 16, 3)).astype(np.float64)
    img = np.round((base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3)
    dec = decode_baseline_jpeg(encode12_color(img))
    assert dec.dtype == np.uint16 and dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(float) - img).max() < 600


def test_lossless_restart_markers_roundtrip_exact():
    """Lossless DRI path: predictors reset to the scan-start default
    after each RSTn (T.81 H.2.2) — byte stream changes, pixels don't."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    for ri in (1, 3, 5):
        dec = decode_baseline_jpeg(
            encode_lossless_jpeg(img, predictor=4, restart_interval=ri)
        )
        assert np.array_equal(dec, img), f"restart_interval {ri}"
    rgb = rng.integers(0, 256, (9, 5, 3), dtype=np.uint8)
    dec = decode_baseline_jpeg(
        encode_lossless_jpeg(rgb, predictor=7, restart_interval=2)
    )
    assert np.array_equal(dec, rgb)


def _entropy_segments(stream: bytes) -> list[bytes]:
    """Entropy-coded bytes of a single-scan stream, split at RSTn."""
    sos = stream.find(b"\xff\xda")
    assert sos >= 0
    ln = struct.unpack(">H", stream[sos + 2 : sos + 4])[0]
    body = stream[sos + 2 + ln : stream.rfind(b"\xff\xd9")]
    segs, cur, i = [], bytearray(), 0
    while i < len(body):
        if body[i] == 0xFF and i + 1 < len(body) and 0xD0 <= body[i + 1] <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            cur.append(body[i])
            i += 1
    segs.append(bytes(cur))
    return segs


def test_lossless_restart_interval_encodes_as_independent_scan():
    """T.81 H.1.2.2/H.2.2 conformance: with DRI = one full sample line,
    every restart interval's entropy bytes must be IDENTICAL to the
    independent lossless encoding of that line alone (restart restarts
    prediction as at scan start: default, then 1-D Ra).  This fails
    under the old next-sample-only reset convention for predictors 2-7,
    which kept referencing pre-restart rows."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    for predictor in (2, 4, 6, 7):
        full = encode_lossless_jpeg(img, predictor=predictor, restart_interval=6)
        segs = _entropy_segments(full)
        assert len(segs) == 5
        for y in range(5):
            solo = encode_lossless_jpeg(img[y : y + 1], predictor=predictor)
            assert segs[y] == _entropy_segments(solo)[0], (predictor, y)
        # and the stream still round-trips bit-exactly
        assert np.array_equal(decode_baseline_jpeg(full), img), predictor


def test_lossless_mid_line_restart_uses_ra_for_rest_of_line():
    """A restart mid-line starts a new 'first line': the remainder of
    the origin line predicts from Ra only, with no reference to the row
    above (pre-restart samples)."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (3, 8), dtype=np.uint8)
    for ri in (3, 5, 7):
        enc = encode_lossless_jpeg(img, predictor=5, restart_interval=ri)
        assert np.array_equal(decode_baseline_jpeg(enc), img), ri


def test_lossless_undefined_dc_table_raises_value_error():
    """A lossless scan referencing an undefined DC Huffman table must
    raise ValueError (the multimodal dispatch's documented contract),
    not AttributeError from a None table lookup."""
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    enc = bytearray(encode_lossless_jpeg(img))
    sos = enc.find(b"\xff\xda")
    # SOS payload: len(2) ncomp(1) then per-comp (id, Td<<4|Ta)
    assert enc[sos + 4] == 1 and enc[sos + 6] == 0x00
    enc[sos + 6] = 0x10  # point at DC table 1, which is never defined
    with pytest.raises(ValueError, match="undefined DC table 1"):
        decode_baseline_jpeg(bytes(enc))
