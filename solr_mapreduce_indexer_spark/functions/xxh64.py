"""Vectorized XXH64 — bit-exact numpy twin of Spark's ``xxhash64``.

Spark's ``F.xxhash64`` expression is the standard XXH64 algorithm (Spark's
XXH64 implementation is verified against the reference C test vectors in its
own XXH64Suite) with seed 42. The engine's LSH operators hash millions of
short shingle strings; doing that through a JVM higher-order ``transform``
runs one interpreted expression tree per element (no codegen inside HOFs) and
was measured as the dominant cost of MinHash signatures. This module hashes a
whole batch of byte strings in numpy instead, grouping keys by byte length so
every step is a fixed-width matrix operation (the same structure as
functions.routing's murmur3 kernel).

Exactness contract: identical int64 output to ``F.xxhash64(col)`` for any
byte/string input — asserted against Spark itself in
tests/test_xxh64.py (empty, 1..64-byte, multi-stripe, and unicode inputs).

Reference: the public xxHash specification (Yann Collet,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
"""

from __future__ import annotations

import numpy as np

_U = np.uint64
_P1 = _U(11400714785074694791)
_P2 = _U(14029467366897019727)
_P3 = _U(1609587929392839161)
_P4 = _U(9650029242287828579)
_P5 = _U(2870177450012600261)

SPARK_SEED = 42  # Spark XxHash64's default seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _le64(mat: np.ndarray, base: int) -> np.ndarray:
    """Little-endian uint64 from 8 bytes at column `base` of a uint8 matrix."""
    out = mat[:, base].astype(_U)
    for j in range(1, 8):
        out |= mat[:, base + j].astype(_U) << _U(8 * j)
    return out


def _le32(mat: np.ndarray, base: int) -> np.ndarray:
    out = mat[:, base].astype(_U)
    for j in range(1, 4):
        out |= mat[:, base + j].astype(_U) << _U(8 * j)
    return out


def _xxh64_fixed_len(mat: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of every row of an (n, L) uint8 matrix of same-length inputs."""
    n, length = mat.shape
    s = _U(seed)
    if length >= 32:
        v1 = np.full(n, s + _P1 + _P2, dtype=_U)
        v2 = np.full(n, s + _P2, dtype=_U)
        v3 = np.full(n, s, dtype=_U)
        v4 = np.full(n, s - _P1, dtype=_U)
        end = (length // 32) * 32
        for base in range(0, end, 32):
            v1 = _rotl(v1 + _le64(mat, base) * _P2, 31) * _P1
            v2 = _rotl(v2 + _le64(mat, base + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + _le64(mat, base + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + _le64(mat, base + 24) * _P2, 31) * _P1
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
        base = end
    else:
        h = np.full(n, s + _P5, dtype=_U)
        base = 0
    h += _U(length)
    while length - base >= 8:
        k = _rotl(_le64(mat, base) * _P2, 31) * _P1
        h = _rotl(h ^ k, 27) * _P1 + _P4
        base += 8
    if length - base >= 4:
        h = _rotl(h ^ (_le32(mat, base) * _P1), 23) * _P2 + _P3
        base += 4
    for b in range(base, length):
        h = _rotl(h ^ (mat[:, b].astype(_U) * _P5), 11) * _P1
    h ^= h >> _U(33)
    h *= _P2
    h ^= h >> _U(29)
    h *= _P3
    h ^= h >> _U(32)
    return h


def xxh64_spans(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
                seed: int = SPARK_SEED) -> np.ndarray:
    """XXH64 of byte spans buf[starts[i] : starts[i]+lengths[i]] → int64.

    Spans are grouped by exact length; each group is gathered into a fixed-
    width matrix and hashed in one vectorized pass — zero per-span Python
    objects. `buf` must be a uint8 array.
    """
    n = len(starts)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    with np.errstate(over="ignore"):
        for length in np.unique(lengths):
            idx = np.flatnonzero(lengths == length)
            li = int(length)
            if li == 0:
                mat = np.empty((len(idx), 0), dtype=np.uint8)
            else:
                # (n_idx, L) gather: one fancy-index per group
                mat = buf[starts[idx][:, None] + np.arange(li)]
            out[idx] = _xxh64_fixed_len(mat, seed).view(np.int64)
    return out


def xxh64_bytes(keys, seed: int = SPARK_SEED) -> np.ndarray:
    """XXH64 of an iterable of str/bytes → int64 array (oracle/test entry)."""
    enc = [k.encode("utf-8") if isinstance(k, str) else bytes(k) for k in keys]
    if not enc:
        return np.empty(0, dtype=np.int64)
    lengths = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    return xxh64_spans(buf, starts, lengths, seed)
