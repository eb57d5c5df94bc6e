"""Runnable multimodal pipeline demo: every payload tier through the
real decode path — no Pillow, no ffmpeg, all codecs native.

    python examples/multimodal_demo.py

Builds a mixed-format corpus (PPM, BMP-style synthetic via PPM twin,
PNG across filter types, baseline AND progressive JPEG, WAV clips,
MJPEG-in-AVI videos), runs the Arrow-batched decode / frame-sample
stages, and prints a per-format feature report — the shape of a real
multimodal training-data ingest: binary columns in, typed features out,
partitioning preserved end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators import multimodal as M
from storm_dynamic_spout_spark.operators.jpeg import encode_progressive_jpeg


def main() -> None:
    spark = build_session(EngineConfig({"spark.master": "local[8]"}))
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    rows = []
    for i in range(8):
        rows.append((i, "ppm", M.make_ppm_image(bytes([i]), 16, 12)))
    for i in range(8, 16):
        rows.append((i, "png", M.make_png_image(bytes([i]), 12, 10)))
    for i in range(16, 24):
        rows.append((i, "jpeg", M.make_jpeg_image(bytes([i]), 16, 16)))
    for i in range(24, 28):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
        rows.append((i, "jpeg-progressive", encode_progressive_jpeg(img)))
    images = spark.createDataFrame(rows, ["doc_id", "fmt", "content"]).repartition(4)

    feats = M.decode_image(images, "doc_id").join(
        images.select("doc_id", "fmt"), "doc_id"
    )
    print("\n== image features by format (native decode) ==")
    feats.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.round(F.avg("mean_intensity"), 2).alias("avg_intensity"),
        F.first("width").alias("w"),
        F.first("height").alias("h"),
    ).orderBy("fmt").show(truncate=False)

    clips = spark.createDataFrame(
        [(i, M.make_wav_audio(bytes([i]), 8000, 400)) for i in range(6)],
        ["doc_id", "content"],
    )
    print("== audio features (native WAV decode) ==")
    M.decode_audio(clips, "doc_id").select(
        "doc_id", "sample_rate", F.round("duration_s", 3).alias("dur_s"),
        F.round("rms", 4).alias("rms"),
    ).show(truncate=False)

    videos = spark.createDataFrame(
        [(i, M.make_mjpeg_avi(bytes([i]), 16, 16, 12, fps=6)) for i in range(3)],
        ["doc_id", "content"],
    )
    print("== sampled video frames (MJPEG/AVI container + native JPEG) ==")
    M.frame_sample_real(videos, 4).select(
        "doc_id", "frame_index", "width", "height",
        F.round("mean_intensity", 1).alias("mean"),
    ).orderBy("doc_id", "frame_index").show(truncate=False)

    print("== fixed-rate frame sampling (every 4th frame, container "
          "clock timestamps from the avih header @ 6 fps) ==")
    M.frame_sample_stride(videos, 4).select(
        "doc_id", "frame_index",
        (F.col("ts_micros") / 1_000_000).alias("t_sec"),
        "frame_sha",
    ).orderBy("doc_id", "frame_index").show(truncate=False)

    # --- near-dup detection across codecs and gain (round 7) ---------
    from storm_dynamic_spout_spark.operators.jpeg import encode_lossless_jpeg

    originals = [(i, M.make_png_image(bytes([i]), 12, 8, 3)) for i in range(4)]
    # re-encodes of image 0 and 1: different container AND +16 exposure
    variants = []
    for i in (0, 1):
        px = M.png_pixels(originals[i][1]).astype(np.int64)
        shifted = np.clip(px + 16, 0, 255).astype(np.uint8)
        variants.append((100 + i, encode_lossless_jpeg(shifted)))
    imgs = spark.createDataFrame(
        [(d, bytearray(b)) for d, b in originals + variants],
        "doc_id long, content binary",
    )
    print("== image near-dups: PNG originals vs brightness-shifted "
          "lossless-JPEG re-encodes (DCT pHash + banded hamming) ==")
    M.phash_near_pairs(M.phash_images(imgs)).orderBy("id_a").show()

    gain_halved = []
    import io
    import wave

    for i in (0, 1):
        _r, _fs, _n, ints = M.wav_samples(
            M.make_wav_audio(bytes([i]), 8000, 400)
        )
        half = (ints // 2).astype("<i2")
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(half.tobytes())
        gain_halved.append((100 + i, bio.getvalue()))
    aud = spark.createDataFrame(
        [(i, bytearray(M.make_wav_audio(bytes([i]), 8000, 400))) for i in range(4)]
        + [(d, bytearray(b)) for d, b in gain_halved],
        "doc_id long, content binary",
    )
    print("== audio near-dups: originals vs gain-halved re-encodes "
          "(energy-delta fingerprint, same banded join) ==")
    M.phash_near_pairs(
        M.fingerprint_audio(aud), hash_col="fingerprint"
    ).orderBy("id_a").show()

    spark.stop()


if __name__ == "__main__":
    main()
