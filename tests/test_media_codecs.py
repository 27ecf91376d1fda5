"""Pure-stdlib media codecs: PNG/WAV round-trips (no Spark, no PIL)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from solr_mapreduce_indexer_spark.operators.media_codecs import (
    audio_features, image_features, image_resize, png_decode, png_encode,
    real_decode, wav_decode, wav_encode)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(img)), img)


def test_png_roundtrip_gray_and_rgba():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    assert png_decode(png_encode(gray)).shape == (9, 5, 1)
    np.testing.assert_array_equal(
        png_decode(png_encode(gray))[:, :, 0], gray)
    rgba = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(rgba)), rgba)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward-apply the PNG spec's scanline filters so the decoder's
    unfiltering is exercised on every filter type, not just 0."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    payload = _png_with_filters(img, filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(png_decode(payload), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"\x01\x02\x03\x04\x05\x06\x07\x08more")


def test_wav_roundtrip():
    t = np.arange(3200)
    s = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    x, rate = wav_decode(wav_encode(s, 16000))
    assert rate == 16000 and len(x) == len(s)
    np.testing.assert_allclose(x, s / 32768.0, atol=1e-6)


def test_resize_and_features():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    small = image_resize(img, 8, 8)
    assert small.shape == (8, 8, 3)
    f = image_features(img)
    assert f.shape == (24,) and f.dtype == np.float32
    s, rate = wav_decode(wav_encode(
        (5000 * np.sin(np.arange(1600))).astype(np.int16)))
    af = audio_features(s, rate)
    assert af.shape == (11,) and 0 <= af[2] <= 1  # centroid normalized


def test_real_decode_sniffs_format():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert real_decode(png_encode(img), "image").shape == (24,)
    s = wav_encode(np.zeros(100, dtype=np.int16))
    assert real_decode(s, "audio").shape == (11,)
    with pytest.raises(ValueError):
        real_decode(b"\x00\x01\x02\x03garbagegarbage", "video")
