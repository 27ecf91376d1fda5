"""Pure-stdlib media codecs: PNG images and WAV audio, numpy end-to-end.

The sandbox ships no media libraries (no PIL/ffmpeg/librosa), but PNG and
WAV are decodable with nothing beyond zlib/wave from the standard library —
so the multimodal pipeline's decode stage is REAL for these formats and only
falls back to a deterministic stand-in for formats that genuinely need
external codecs (JPEG, MP3, MP4…). Encoders are provided too so tests can
round-trip real assets.

Formats covered:
* PNG: 8-bit grayscale / RGB / RGBA, non-interlaced, all five scanline
  filters (None/Sub/Up/Average/Paeth per the PNG spec §6).
* WAV: PCM 8/16/32-bit via the stdlib `wave` module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type → samples per pixel


def png_encode(img: np.ndarray) -> bytes:
    """Encode an HxW (gray) or HxWx{3,4} uint8 array as a PNG (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth)."""
    stride = w * c
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            res = line
        elif f == 2:  # Up
            res = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential along x
            res = line.copy()
            for x in range(c, stride):
                res[x] = (res[x] + res[x - c]) & 0xFF
        elif f == 3:  # Average
            res = line.copy()
            for x in range(stride):
                left = res[x - c] if x >= c else 0
                res[x] = (res[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            res = line.copy()
            for x in range(stride):
                a = res[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                res[x] = (res[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = res.astype(np.uint8)
    return out.reshape(h, w, c)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG into an HxWxC uint8 array (8-bit, non-interlaced)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace or ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, "
                                 f"ctype={ctype}, interlace={interlace})")
            meta = (w, h, _CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, c = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (w * c + 1):
        raise ValueError("PNG size mismatch")
    return _unfilter(raw, h, w, c)


def image_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_features(img: np.ndarray, thumb: int = 4) -> np.ndarray:
    """Fixed-length image feature: per-channel mean/std + a thumb×thumb
    grayscale thumbnail (the shape a CLIP-style embedder would replace)."""
    f = img.astype(np.float32)
    if f.ndim == 2:
        f = f[:, :, None]
    gray = f.mean(axis=2)
    t = image_resize(gray, thumb, thumb).ravel() / 255.0
    stats = []
    for ch in range(f.shape[2]):
        stats += [float(f[:, :, ch].mean()) / 255.0,
                  float(f[:, :, ch].std()) / 255.0]
    stats = (stats + [0.0] * 8)[:8]  # pad to 4 channels × (mean, std)
    return np.array(stats + t.tolist(), dtype=np.float32)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV → (float32 samples in [-1, 1] mono, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * width - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """Fixed-length audio feature: RMS, zero-cross rate, spectral centroid,
    and n_bands log-spaced FFT band energies."""
    x = np.asarray(samples, dtype=np.float32)
    if len(x) == 0:
        return np.zeros(3 + n_bands, dtype=np.float32)
    rms = float(np.sqrt((x ** 2).mean()))
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
    centroid = float((freqs * spec).sum() / spec.sum()) / (rate / 2) \
        if spec.sum() > 0 else 0.0
    edges = np.unique(np.geomspace(1, len(spec), n_bands + 1).astype(int))
    bands = np.zeros(n_bands, dtype=np.float32)
    tot = (spec ** 2).sum() or 1.0
    for i in range(min(n_bands, len(edges) - 1)):
        bands[i] = float((spec[edges[i]:edges[i + 1]] ** 2).sum() / tot)
    return np.concatenate(([rms, zcr, centroid], bands)).astype(np.float32)


def real_decode(payload: bytes, modality: str) -> np.ndarray:
    """Format-sniffing feature extractor: REAL decode for PNG and WAV
    (stdlib-only), ValueError for formats needing external codecs — callers
    (operators/multimodal.extract_features) surface that as decode_ok=False
    per row rather than failing the task."""
    if payload is None:
        raise ValueError("empty payload")
    if payload[:8] == _PNG_SIG:
        return image_features(png_decode(payload))
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(*wav_decode(payload))
    raise ValueError(f"no stdlib codec for this payload (modality={modality}); "
                     "plug a PIL/ffmpeg-backed decoder on a real cluster")
