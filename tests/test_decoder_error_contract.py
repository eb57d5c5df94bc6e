"""Corruption fuzz over the real decoders: ANY malformed payload must
surface as the documented contract (ValueError / NotImplementedError —
what the multimodal Pillow-fallback dispatch catches), never an
internal IndexError / AttributeError / struct.error escaping a parser.

Two past rounds each shipped one instance of this bug class (r5: a
_BitReader IndexError, r6: a None-Huffman-table AttributeError); this
test attacks the whole class up front: deterministic byte flips,
truncations, and splices over every native decode path."""

from __future__ import annotations

import random

import pytest

from storm_dynamic_spout_spark.operators.jpeg import decode_baseline_jpeg
from storm_dynamic_spout_spark.operators.multimodal import (
    _decode_payload_real,
    image_pixels,
    make_mjpeg_avi,
    make_png_image,
    make_ppm_image,
    make_wav_audio,
    parse_mjpeg_avi,
    wav_samples,
)

#: what a decoder may raise on garbage; anything else is a contract
#: bug — the codec_boundary normalizes every parser-internal type
#: (zlib.error, wave.Error, struct.error, EOFError, ...) to ValueError
ALLOWED = (ValueError, NotImplementedError)


def _mutations(buf: bytes, rng: random.Random, n: int):
    """Deterministic corruption menu: single byte flips, truncations,
    random splices, zero runs."""
    out = []
    for _ in range(n):
        b = bytearray(buf)
        kind = rng.randrange(4)
        if kind == 0 and b:
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif kind == 1:
            b = b[: rng.randrange(1, max(2, len(b)))]
        elif kind == 2 and len(b) > 8:
            i = rng.randrange(4, len(b) - 4)
            b[i : i + 4] = rng.randbytes(4)
        else:
            i = rng.randrange(max(1, len(b)))
            b[i : i + 8] = b"\x00" * min(8, len(b) - i)
        out.append(bytes(b))
    return out


def _assert_contract(decode, payloads):
    for i, p in enumerate(payloads):
        try:
            decode(p)
        except ALLOWED:
            pass
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"mutation {i}: {type(e).__name__} escaped the decode "
                f"contract: {e!r}"
            ) from e


@pytest.mark.parametrize(
    "maker,decode,n",
    [
        (lambda: make_png_image(b"fz", 10, 6, 3), image_pixels, 120),
        (lambda: make_png_image(b"fz2", 8, 8, 1), _decode_payload_real, 120),
        (lambda: make_ppm_image(b"fz3", 8, 6), _decode_payload_real, 80),
        (lambda: make_wav_audio(b"fz4", 8000, 64), wav_samples, 120),
        (lambda: make_mjpeg_avi(b"fz5", 16, 16, 3), parse_mjpeg_avi, 120),
    ],
    ids=["png-pixels", "png-stats", "ppm", "wav", "avi"],
)
def test_corrupted_payloads_stay_inside_error_contract(maker, decode, n):
    rng = random.Random(20260814)
    _assert_contract(decode, _mutations(maker(), rng, n))


def test_corrupted_jpeg_stays_inside_error_contract():
    """JPEG gets a larger budget: the Huffman/marker state machine has
    the most internal state to corrupt (both past escapes were here)."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.jpeg import (
        encode_baseline_jpeg,
        encode_lossless_jpeg,
        encode_progressive_jpeg,
    )

    rng_img = np.random.default_rng(5)
    img = rng_img.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rng = random.Random(99)
    for enc in (
        encode_baseline_jpeg(img),
        encode_progressive_jpeg(img),
        encode_lossless_jpeg(img),
        encode_lossless_jpeg(img[:, :, 0], predictor=4, restart_interval=3),
    ):
        _assert_contract(decode_baseline_jpeg, _mutations(enc, rng, 150))
