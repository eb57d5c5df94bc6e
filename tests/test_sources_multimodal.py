"""Source registry, deserializers (P1), and multimodal plumbing tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators import multimodal as M
from storm_dynamic_spout_spark.sources import (
    SinkRegistry,
    SourceRegistry,
    csv_deserializer,
    drop_undeserializable,
    json_deserializer,
    utf8_deserializer,
)


@pytest.fixture(scope="module")
def sources():
    return SourceRegistry()


def test_registry_formats(sources):
    fmts = sources.formats()
    for f in ("parquet", "json", "csv", "orc", "text", "kafka", "file_topic"):
        assert f in fmts
    assert fmts["binaryFile"]["batch"] and not fmts["binaryFile"]["stream"]
    assert fmts["parquet"] == {"batch": True, "stream": True}
    assert fmts["rate"]["stream"] and not fmts["rate"]["batch"]
    with pytest.raises(KeyError):
        sources.read(None, "unknown_format")


def test_parquet_source_schema_pinned(spark, sources, sf_dir):
    df = sources.read(
        spark,
        "parquet",
        path=f"{sf_dir}/nation.parquet",
        schema="n_nationkey BIGINT, n_name STRING",
    )
    assert df.columns == ["n_nationkey", "n_name"]
    assert df.count() == 25


def test_sink_roundtrip(spark, sources, tmp_path):
    sinks = SinkRegistry()
    df = spark.range(10).withColumn("k", F.col("id") % 2)
    sinks.write(df, "parquet", path=str(tmp_path / "out"), mode="overwrite", partition_by=["k"])
    back = sources.read(spark, "parquet", path=str(tmp_path / "out"))
    assert back.count() == 10
    # partitionBy produced the layout a 100 TB table needs for pruning
    assert (tmp_path / "out" / "k=0").exists()


def test_utf8_deserializer(spark):
    df = spark.createDataFrame(
        [(bytearray(b"k1"), bytearray(b"v1")), (None, bytearray(b"v2"))],
        "key BINARY, value BINARY",
    )
    out = utf8_deserializer(df)
    rows = {r["value"]: r["key"] for r in out.collect()}
    assert rows == {"v1": "k1", "v2": None}  # null key allowed


def test_json_deserializer_and_null_drop(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 1, "s": "x"}'), ("b", "not-json")], "key STRING, value STRING"
    )
    out = json_deserializer(df, "k BIGINT, s STRING")
    assert {r["k"] for r in out.collect()} == {1, None}
    kept = drop_undeserializable(out, F.col("k"))
    assert [r["key"] for r in kept.collect()] == ["a"]  # null parse ⇒ drop


def test_csv_deserializer(spark):
    df = spark.createDataFrame([("r1", "7,foo")], "key STRING, value STRING")
    row = csv_deserializer(df, "a INT, b STRING").collect()[0]
    assert (row["a"], row["b"]) == (7, "foo")


# -- multimodal -------------------------------------------------------------


def test_multimodal_payload_schema(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    with_img = M.attach_image_payload(docs, "doc_id", width=4, height=4)
    assert dict(with_img.dtypes)["content"] == "binary"
    assert dict(with_img.dtypes)["meta"].startswith("struct<width:int")
    payload = with_img.filter("doc_id = 3").collect()[0]["content"]
    assert len(payload) == 16 + 4 * 4 * 3  # header + pixels
    # deterministic across runs
    again = M.attach_image_payload(docs, "doc_id", 4, 4).filter("doc_id = 3").collect()[0]
    assert bytes(payload) == bytes(again["content"])


def test_decode_image_stub_gate(spark):
    """fake=False on a payload that is neither PPM/BMP (native decode)
    nor Pillow-decodable raises the honest NotImplementedError at
    execution time (the synthetic SDSS format is not a real image)."""
    docs = M.attach_image_payload(spark.range(2).withColumnRenamed("id", "doc_id"), "doc_id")
    if M.HAS_PIL:
        pytest.skip("Pillow installed: gate only applies without codecs")
    with pytest.raises(Exception, match="compressed image codecs|NotImplementedError"):
        M.decode_image(docs).collect()


def test_decode_image_fake_features(spark):
    docs = M.attach_image_payload(
        spark.range(10).withColumnRenamed("id", "doc_id"), "doc_id", width=4, height=2
    )
    feats = M.decode_image(docs, fake=True)
    assert feats.schema == M.DECODED_SCHEMA
    rows = feats.collect()
    assert len(rows) == 10
    assert all(r["width"] == 4 and r["height"] == 2 and r["n_channels"] == 3 for r in rows)
    assert all(0.0 <= r["mean_intensity"] <= 255.0 for r in rows)
    # mapInPandas is a narrow transformation: partition count preserved
    assert feats.rdd.getNumPartitions() == docs.rdd.getNumPartitions()


def test_frame_sample_explodes_rows(spark):
    docs = M.attach_image_payload(spark.range(5).withColumnRenamed("id", "doc_id"), "doc_id")
    frames = M.frame_sample(docs, n_frames=3)
    assert frames.count() == 15
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)
    assert frames.select("frame_sha").distinct().count() == 15


def test_resize_meta_is_pure_column_op(spark):
    docs = M.attach_image_payload(spark.range(3).withColumnRenamed("id", "doc_id"), "doc_id")
    resized = M.resize_meta(docs, 32, 16)
    row = resized.collect()[0]
    assert (row["meta"]["width"], row["meta"]["height"]) == (32, 16)
    assert row["meta"]["format"] == "sdss-raw"


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Reading an evolving parquet table: files written with the old and
    new schema coexist in one dir; mergeSchema resolves the union with
    nulls for missing columns — the 100 TB table-evolution contract."""
    old = spark.range(3).withColumn("a", F.col("id") * 10)
    new = spark.range(3, 6).withColumn("a", F.col("id") * 10).withColumn(
        "b", F.lit("added")
    )
    old.write.mode("overwrite").parquet(str(tmp_path / "tbl"))
    new.write.mode("append").parquet(str(tmp_path / "tbl"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "tbl"))
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in merged.collect()}
    assert rows[0] == (0, None)  # old file: b null-filled
    assert rows[5] == (50, "added")


def test_sink_roundtrip_all_formats(spark, sources, tmp_path):
    """Every file sink format round-trips through its matching source."""
    sinks = SinkRegistry()
    df = spark.range(5).withColumn("s", F.concat(F.lit("v"), F.col("id")))
    for fmt in ("json", "csv", "orc"):
        path = str(tmp_path / fmt)
        opts = {"header": "true"} if fmt == "csv" else {}
        sinks.write(df, fmt, path=path, mode="overwrite", **opts)
        back = sources.read(
            spark, fmt, path=path, schema="id BIGINT, s STRING", **opts
        )
        assert sorted(r["s"] for r in back.collect()) == [f"v{i}" for i in range(5)]


def test_audio_payload_and_decode(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    clips = M.attach_audio_payload(docs, "doc_id", sample_rate=8000, n_samples=160)
    assert dict(clips.dtypes)["content"] == "binary"
    assert clips.collect()[0]["meta"]["format"] == "sdsa-pcm8"
    with pytest.raises(Exception, match="compressed audio codecs|NotImplementedError"):
        # synthetic payload is not RIFF/WAV → execution-time codec gate
        M.decode_audio(clips).collect()
    feats = M.decode_audio(clips, fake=True)
    assert feats.schema == M.AUDIO_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 8
    assert all(r["sample_rate"] == 8000 and abs(r["duration_s"] - 0.02) < 1e-9 for r in rows)
    assert all(r["rms"] > 0 for r in rows)
    # deterministic payloads → deterministic hashes across runs
    again = M.decode_audio(M.attach_audio_payload(docs, "doc_id", 8000, 160), fake=True)
    assert {r["content_sha"] for r in rows} == {r["content_sha"] for r in again.collect()}


def test_binary_file_source_reads_payloads(spark, sources, tmp_path):
    """binaryFile ingest: one row per file with the raw payload as a
    BINARY column — the entry point for the multimodal decode
    operators (image/audio payloads arrive exactly like this)."""
    (tmp_path / "a.bin").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.bin").write_bytes(b"RIFF fake")
    (tmp_path / "skip.txt").write_text("not selected")
    df = sources.read(
        spark, "binaryFile", path=str(tmp_path), pathGlobFilter="*.bin"
    )
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {"a.bin": b"\x89PNG fake", "b.bin": b"RIFF fake"}


def test_text_source_line_per_row(spark, sources, tmp_path):
    f = tmp_path / "doc.txt"
    f.write_text("alpha\nbeta\ngamma\n")
    df = sources.read(spark, "text", path=str(f))
    assert sorted(r["value"] for r in df.collect()) == ["alpha", "beta", "gamma"]


def test_decode_image_real_codec_seam(spark):
    """fake=False takes the Pillow path when installed, and raises the
    honest NotImplementedError otherwise — the import-try seam means a
    cluster with codecs gets real decode with zero code changes."""
    import pytest

    from storm_dynamic_spout_spark.operators import multimodal as mm

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    if not mm.HAS_PIL:
        with pytest.raises(Exception, match="compressed image codecs|NotImplementedError"):
            mm.decode_image(
                mm.attach_image_payload(df, "doc_id"), fake=False
            ).collect()
        return

    # real path: build tiny PNGs via Pillow, decode through the same
    # mapInPandas plumbing as the synthetic format
    import io

    import pandas as pd
    from PIL import Image
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def _png(ids: pd.Series) -> pd.Series:
        def make(i):
            img = Image.new("RGB", (4, 2), color=(int(i) * 10 % 256, 0, 0))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

        return ids.map(make)

    payloads = df.withColumn("content", _png("doc_id"))
    out = mm.decode_image(payloads, fake=False).orderBy("doc_id").collect()
    assert [(r["width"], r["height"], r["n_channels"]) for r in out] == [(4, 2, 3)] * 3
    assert all(0.0 <= r["mean_intensity"] <= 255.0 for r in out)


def test_decode_ppm_real_image(spark):
    """REAL image decode with no codec dependency: binary PPM (P6)
    bytes decode natively through the same mapInPandas plumbing, with
    exact per-payload verification against a hand-built image."""
    import numpy as np

    # hand-built 2x2 PPM with known pixels → known mean
    pixels = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    handmade = b"P6\n# comment line\n2 2\n255\n" + pixels
    rows = [(0, bytearray(handmade))] + [
        (i, bytearray(M.make_ppm_image(str(i).encode(), width=4, height=3)))
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in M.decode_image(df, fake=False).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["n_channels"]) == (2, 2, 3)
    assert abs(out[0]["mean_intensity"] - np.frombuffer(pixels, np.uint8).mean()) < 1e-9
    for i in range(1, 6):
        assert (out[i]["width"], out[i]["height"], out[i]["n_channels"]) == (4, 3, 3)
        # driver-side decode of the same bytes agrees exactly
        w, h, c, mean = M._decode_ppm(M.make_ppm_image(str(i).encode(), 4, 3))
        assert out[i]["mean_intensity"] == mean


def test_decode_bmp_real_image(spark):
    """Uncompressed 24-bit BMP decodes natively: build the file by hand
    (BITMAPINFOHEADER, bottom-up rows padded to 4 bytes) and check the
    mean excludes the padding bytes."""
    import struct as st

    import numpy as np

    w, h = 3, 2  # row = 9 bytes → stride 12 (3 padding bytes per row)
    row1, row2 = bytes(range(9)), bytes(range(100, 109))
    pix = row1 + b"\x00\x00\x00" + row2 + b"\x00\x00\x00"
    header = (
        b"BM"
        + st.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    )
    df = spark.createDataFrame(
        [(1, bytearray(header + pix))], "doc_id long, content binary"
    )
    r = M.decode_image(df, fake=False).collect()[0]
    assert (r["width"], r["height"], r["n_channels"]) == (3, 2, 3)
    expected = np.frombuffer(row1 + row2, np.uint8).mean()
    assert abs(r["mean_intensity"] - expected) < 1e-9


def test_decode_wav_real_audio(spark):
    """REAL audio decode via the stdlib wave module: WAV PCM16 bytes
    from make_wav_audio round-trip through decode_audio with the exact
    rate/duration, plus a hand-built constant-amplitude clip whose RMS
    is known in closed form."""
    import io
    import struct as st
    import wave

    # constant amplitude 16384 → rms = 16384/32768 = 0.5 exactly
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(st.pack("<160h", *([16384] * 160)))
    rows = [(0, bytearray(bio.getvalue()))] + [
        (i, bytearray(M.make_wav_audio(str(i).encode(), 16000, 320)))
        for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in M.decode_audio(df, fake=False).collect()}
    assert out[0]["sample_rate"] == 8000
    assert abs(out[0]["duration_s"] - 0.02) < 1e-12
    assert abs(out[0]["rms"] - 0.5) < 1e-12
    for i in range(1, 5):
        assert out[i]["sample_rate"] == 16000
        assert abs(out[i]["duration_s"] - 0.02) < 1e-12
        assert 0 < out[i]["rms"] <= 1.0


def test_decode_png_real_image(spark):
    """REAL PNG decode with no codec dependency: stdlib-zlib IDAT,
    CRC'd chunks, rows cycling through ALL five filter types — decoded
    natively through the same mapInPandas plumbing and verified against
    an independent reconstruction of the deterministic pixels."""
    import hashlib

    import numpy as np

    def expected_pixels(seed: bytes, w: int, h: int, ch: int) -> np.ndarray:
        need = w * h * ch
        out = bytearray()
        counter = 0
        while len(out) < need:
            out += hashlib.sha256(
                seed + b"png" + counter.to_bytes(4, "little")
            ).digest()
            counter += 1
        return np.frombuffer(bytes(out[:need]), np.uint8)

    rows = [
        (i, bytearray(M.make_png_image(str(i).encode(), width=7, height=6)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in M.decode_image(df, fake=False).collect()}
    for i in range(4):
        assert (out[i]["width"], out[i]["height"], out[i]["n_channels"]) == (7, 6, 3)
        exp = expected_pixels(str(i).encode(), 7, 6, 3).mean()
        assert abs(out[i]["mean_intensity"] - exp) < 1e-9


def test_decode_png_channel_variants():
    """Gray, gray+alpha, RGB and RGBA all round-trip through the native
    encoder/decoder; height spanning >5 rows exercises every filter."""
    import hashlib

    import numpy as np

    for ch in (1, 2, 3, 4):
        buf = M.make_png_image(b"variant", width=5, height=7, channels=ch)
        w, h, c, mean = M._decode_png(buf)
        assert (w, h, c) == (5, 7, ch)
        need = 5 * 7 * ch
        out = bytearray()
        counter = 0
        while len(out) < need:
            out += hashlib.sha256(
                b"variant" + b"png" + counter.to_bytes(4, "little")
            ).digest()
            counter += 1
        assert abs(mean - np.frombuffer(bytes(out[:need]), np.uint8).mean()) < 1e-9


def test_decode_png_rejects_invalid_variants():
    """Spec-invalid depth x colortype combos (e.g. 2-bit RGB) raise the
    documented NotImplementedError; every VALID combination — including
    sub-byte and 16-bit Adam7 — now decodes natively (see the
    interlaced tests below)."""
    import pytest

    # IHDR data starts at offset 16 (8 sig + 4 len + 4 type)
    ihdr_off = 16
    buf = bytearray(M.make_png_image(b"x", 4, 4))
    buf[ihdr_off + 8] = 2  # depth 2 with colortype 2 (RGB): invalid per spec
    with pytest.raises(NotImplementedError):
        M._decode_png(bytes(buf))


def test_decode_png_sub_byte_adam7_interlaced():
    """2-bit gray Adam7: each pass packs its own scanlines MSB-first
    with per-pass byte padding; one pass uses the Up filter."""
    import struct
    import zlib

    import numpy as np

    w, h = 9, 5
    rng = np.random.default_rng(11)
    img = rng.integers(0, 4, (h, w), dtype=np.uint8)  # 2-bit values
    depth, spb = 2, 4
    raw = b""
    for pi, (x0, y0, dx, dy) in enumerate(M._ADAM7_PASSES):
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        stride = -(-pw * depth // 8)
        rows = []
        for r in range(ph):
            y = y0 + r * dy
            packed = bytearray(stride)
            for i in range(pw):
                v = int(img[y, x0 + i * dx])
                packed[i // spb] |= v << ((spb - 1 - (i % spb)) * depth)
            rows.append(bytes(packed))
        for r, row in enumerate(rows):
            if pi == len(M._ADAM7_PASSES) - 1 and r > 0:
                filt = bytes((b - a) % 256 for b, a in zip(row, rows[r - 1]))
                raw += bytes([2]) + filt
            else:
                raw += bytes([0]) + row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 1)
    exp = float(img.astype(np.float64).mean() * (255.0 / 3))
    assert abs(mean - exp) < 1e-9


def test_decode_png_16bit_adam7_interlaced():
    """16-bit grayscale Adam7: 2-byte big-endian samples scattered per
    pass; mean reported on the 0-255 scale (/257)."""
    import struct
    import zlib

    import numpy as np

    w, h = 5, 3
    rng = np.random.default_rng(12)
    img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    raw = b""
    for x0, y0, dx, dy in M._ADAM7_PASSES:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        for r in range(ph):
            y = y0 + r * dy
            row = b"".join(
                struct.pack(">H", int(img[y, x0 + i * dx])) for i in range(pw)
            )
            raw += bytes([0]) + row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 1)
    exp = float((img.astype(np.float64) / 257.0).mean())
    assert abs(mean - exp) < 1e-9


def test_decode_png_adam7_interlaced():
    """8-bit Adam7 interlaced PNG: seven independently-filtered passes
    scattered onto the full grid.  Built by hand from the spec's pass
    grid; one pass uses the Up filter to exercise within-pass
    unfiltering."""
    import struct
    import zlib

    import numpy as np

    w, h = 9, 5  # odd dims: every pass has ragged edges
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)
    raw = b""
    for pi, (x0, y0, dx, dy) in enumerate(M._ADAM7_PASSES):
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        rows = []
        for r in range(ph):
            y = y0 + r * dy
            row = np.concatenate([img[y, x0 + i * dx] for i in range(pw)]).astype(int)
            rows.append(row)
        # last pass: Up filter on non-first rows, others filter 0
        for r, row in enumerate(rows):
            if pi == len(M._ADAM7_PASSES) - 1 and r > 0:
                filt = (row - rows[r - 1]) % 256
                raw += bytes([2]) + bytes(filt.astype(np.uint8))
            else:
                raw += bytes([0]) + bytes(row.astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # RGB, Adam7
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 3)
    assert abs(mean - float(img.mean())) < 1e-9


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import binascii
    import struct

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_decode_png_palette():
    """Colortype-3 (palette) PNG: indices map through PLTE to RGB."""
    import struct
    import zlib

    w, h = 4, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    # rows of indices, filter type 0
    rows = [[0, 1, 2, 3], [3, 2, 1, 0]]
    raw = b"".join(bytes([0]) + bytes(r) for r in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 3)
    # each palette color used twice -> mean over all RGB components
    exp = (2 * (255 + 0 + 0) + 2 * (0 + 255 + 0) + 2 * (0 + 0 + 255) + 2 * (10 + 20 + 30)) / 24
    assert abs(mean - exp) < 1e-9


def test_decode_png_16bit_gray_with_sub_filter():
    """Depth-16 PNG: byte-wise unfilter with bpp=2, values scaled /257.
    The Sub-filtered row exercises the 2-byte left-neighbor distance."""
    import struct
    import zlib

    w, h = 3, 2
    vals = [[0, 257, 514], [65535, 32896, 0]]  # u16 pixel values

    def row_bytes(r):
        out = b""
        for v in r:
            out += struct.pack(">H", v)
        return out

    # row 0: filter 0; row 1: filter 1 (Sub) applied byte-wise at bpp=2
    r0 = row_bytes(vals[0])
    r1 = row_bytes(vals[1])
    filt1 = bytearray(r1)
    for i in range(len(filt1) - 1, 1, -1):
        filt1[i] = (filt1[i] - r1[i - 2]) % 256
    raw = bytes([0]) + r0 + bytes([1]) + bytes(filt1)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 1)
    exp = sum(v / 257.0 for r in vals for v in r) / 6
    assert abs(mean - exp) < 1e-9


def test_decode_png_sub_byte_gray():
    """1-bit and 4-bit grayscale PNGs: MSB-first bit unpacking, row
    padding bits dropped, values scaled to the 0-255 range."""
    import struct
    import zlib

    import numpy as np

    # 1-bit 10x2 checkerboard: rows pad to 2 bytes
    w, h = 10, 2
    row0 = 0b1010101010
    row1 = 0b0101010101
    raw = b""
    for r in (row0, row1):
        packed = r << 6  # left-justify 10 bits in 16
        raw += bytes([0]) + struct.pack(">H", packed)
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 1)
    assert abs(mean - 127.5) < 1e-9  # half ones at 255, half zeros

    # 4-bit gray 3x1 with Sub filter (bpp=1 on packed bytes)
    w, h = 3, 1
    vals = [1, 5, 12]
    packed = bytes([vals[0] << 4 | vals[1], vals[2] << 4])
    filt = bytearray(packed)
    filt[1] = (filt[1] - packed[0]) % 256
    raw = bytes([1]) + bytes(filt)
    ihdr = struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 0)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 1)
    exp = sum(v * 255.0 / 15 for v in vals) / 3
    assert abs(mean - exp) < 1e-9


def test_decode_png_sub_byte_palette():
    """2-bit palette PNG: indices unpack then map through PLTE."""
    import struct
    import zlib

    w, h = 5, 1
    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    idxs = [0, 1, 2, 3, 1]
    packed = bytes(
        [idxs[0] << 6 | idxs[1] << 4 | idxs[2] << 2 | idxs[3], idxs[4] << 6]
    )
    raw = bytes([0]) + packed
    ihdr = struct.pack(">IIBBBBB", w, h, 2, 3, 0, 0, 0)
    buf = (
        M._PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, c, mean = M._decode_png(buf)
    assert (got_w, got_h, c) == (w, h, 3)
    # colors: black, red, green, blue, red -> sum of components / 15
    exp = (0 + 255 + 255 + 255 + 255) / 15
    assert abs(mean - exp) < 1e-9


def test_png_pixels_recovers_keystream_exactly():
    """Pixel-level PNG API: decode recovers the generator's exact
    keystream bytes for every channel count (lossless path under the
    phash operator)."""
    import hashlib

    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import (
        make_png_image,
        png_pixels,
    )

    for c in (1, 2, 3, 4):
        seed, w, h = f"px-{c}".encode(), 10, 6
        need = w * h * c
        out = bytearray()
        counter = 0
        while len(out) < need:
            out += hashlib.sha256(
                seed + b"png" + counter.to_bytes(4, "little")
            ).digest()
            counter += 1
        expect = np.frombuffer(bytes(out[:need]), np.uint8).reshape(h, w, c)
        if c == 1:
            expect = expect[:, :, 0]
        got = png_pixels(make_png_image(seed, w, h, c))
        assert np.array_equal(got, expect), c


def test_phash64_brightness_invariant_and_content_sensitive():
    """Uniform brightness shifts leave the DCT AC signs untouched
    (hamming 0 without clamping); different content lands far away."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import phash64

    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, (16, 16), dtype=np.uint8)  # headroom: no clamp
    h0 = phash64(img)
    assert 0 <= h0 < (1 << 63)
    assert phash64(np.clip(img.astype(np.int64) + 30, 0, 255).astype(np.uint8)) == h0
    other = rng.integers(0, 200, (16, 16), dtype=np.uint8)
    assert bin(h0 ^ phash64(other)).count("1") > 10


def test_phash_cross_codec_pair_survives_real_decoders(spark):
    """PNG original and lossless-JPEG brightness variant of the same
    content pair up through the REAL decode + banded hamming join."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.jpeg import encode_lossless_jpeg
    from storm_dynamic_spout_spark.operators.multimodal import (
        make_png_image,
        phash_images,
        phash_near_pairs,
        png_pixels,
    )

    png = make_png_image(b"xc", 12, 8, 3)
    shifted = np.clip(png_pixels(png).astype(np.int64) + 16, 0, 255).astype(np.uint8)
    jpg = encode_lossless_jpeg(shifted)
    noise = make_png_image(b"unrelated", 12, 8, 3)
    df = spark.createDataFrame(
        [(0, bytearray(png)), (1, bytearray(jpg)), (2, bytearray(noise))],
        "doc_id long, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(phash_images(df)).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 10
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_audio_fingerprint_gain_invariant_and_pairs(spark):
    """Energy-delta fingerprint: amplitude scaling preserves delta
    signs (gain-halved copy pairs at small hamming through the REAL
    WAV decode + banded join); different content stays far."""
    import io
    import wave

    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import (
        audio_fingerprint63,
        fingerprint_audio,
        make_wav_audio,
        phash_near_pairs,
        wav_samples,
    )

    base = make_wav_audio(b"fp-test", 16000, 128)
    _r, _f, _n, ints = wav_samples(base)
    fp = audio_fingerprint63(ints)
    assert 0 <= fp < (1 << 63)
    # exact positive scaling: every delta sign identical
    assert audio_fingerprint63(ints * 3) == fp
    half = (ints // 2).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(half.tobytes())
    other = make_wav_audio(b"unrelated", 16000, 128)
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(bio.getvalue())), (2, bytearray(other))],
        "doc_id long, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(
            fingerprint_audio(df), hash_col="fingerprint"
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 10
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_resize_nearest_grid_and_operator(spark):
    import hashlib

    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import (
        make_png_image,
        nearest_resize_indices,
        png_pixels,
        resize_image_nearest,
        resize_pixels_nearest,
    )

    # floor-grid properties: monotone, in-range, identity at same size
    assert nearest_resize_indices(10, 5) == [0, 2, 4, 6, 8]
    assert nearest_resize_indices(3, 6) == [0, 0, 1, 1, 2, 2]
    assert nearest_resize_indices(7, 7) == list(range(7))
    with pytest.raises(ValueError):
        nearest_resize_indices(0, 4)

    # pure resample: identity round-trip + gather correctness on a ramp
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (resize_pixels_nearest(arr, 6, 4) == arr).all()
    down = resize_pixels_nearest(arr, 3, 2)
    assert down.tolist() == [[0, 2, 4], [12, 14, 16]]
    rgb = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert resize_pixels_nearest(rgb, 2, 2).shape == (2, 2, 3)

    # operator through the REAL png decoder matches the pure path
    payload = make_png_image(b"resize-op", 9, 7, 3)
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, content binary"
    )
    row = resize_image_nearest(df, 4, 3).collect()[0]
    expect = resize_pixels_nearest(png_pixels(payload), 4, 3)
    assert (row.out_width, row.out_height, row.n_channels) == (4, 3, 3)
    assert row.resized_sum == int(expect.sum())
    assert row.resized_sha == hashlib.sha256(
        np.ascontiguousarray(expect).tobytes()
    ).hexdigest()
