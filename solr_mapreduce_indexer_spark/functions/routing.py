"""Document routing: murmur3_x86_32 hash-range sharding + micro-shard mapping.

Reproduces the reference's SolrCloudPartitioner semantics exactly
(reference: SolrCloudPartitioner.java:112-142):

  hash      = murmurhash3_x86_32(utf8(doc_key), seed=0)
  root      = slice whose hash-range contains `hash` (Solr HashBasedRouter:
              S slices uniformly partition the signed 32-bit range; see
              Solr DocRouter.partitionRange — step = floor((2^32 - 1) / S),
              last slice absorbs the remainder)
  micro     = root * (R/S) + (hash & MAX_INT) % (R/S)   with R % S == 0

The murmur3 kernel is numpy-vectorized by grouping keys by byte length so the
block-mixing loop runs over 4-byte positions, not over keys. Exposed both as a
plain numpy function (for oracles/tests) and as a Spark pandas_udf factory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U32 = np.uint32
_C1 = _U32(0xCC9E2D51)
_C2 = _U32(0x1B873593)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _fmix32(h: np.ndarray) -> np.ndarray:
    h ^= h >> _U32(16)
    h *= _U32(0x85EBCA6B)
    h ^= h >> _U32(13)
    h *= _U32(0xC2B2AE35)
    h ^= h >> _U32(16)
    return h


def _murmur3_fixed_len(mat: np.ndarray, seed: int) -> np.ndarray:
    """murmur3_x86_32 over a (n, L) uint8 matrix of same-length keys."""
    n, length = mat.shape
    h = np.full(n, seed, dtype=_U32)
    nblocks = length // 4
    if nblocks:
        # little-endian 4-byte blocks
        blocks = mat[:, : nblocks * 4].reshape(n, nblocks, 4).astype(_U32)
        k_all = (blocks[:, :, 0]
                 | (blocks[:, :, 1] << _U32(8))
                 | (blocks[:, :, 2] << _U32(16))
                 | (blocks[:, :, 3] << _U32(24)))
        for i in range(nblocks):
            k = k_all[:, i].copy()
            k *= _C1
            k = _rotl32(k, 15)
            k *= _C2
            h ^= k
            h = _rotl32(h, 13)
            h = h * _U32(5) + _U32(0xE6546B64)
    tail = length & 3
    if tail:
        k = np.zeros(n, dtype=_U32)
        base = nblocks * 4
        if tail >= 3:
            k ^= mat[:, base + 2].astype(_U32) << _U32(16)
        if tail >= 2:
            k ^= mat[:, base + 1].astype(_U32) << _U32(8)
        k ^= mat[:, base].astype(_U32)
        k *= _C1
        k = _rotl32(k, 15)
        k *= _C2
        h ^= k
    h ^= _U32(length)
    return _fmix32(h)


def murmur3_x86_32(keys, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 of an iterable of str/bytes → int32 array."""
    enc = [k.encode("utf-8") if isinstance(k, str) else bytes(k) for k in keys]
    n = len(enc)
    out = np.empty(n, dtype=np.int32)
    if n == 0:
        return out
    lengths = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    with np.errstate(over="ignore"):
        for length in np.unique(lengths):
            idx = np.flatnonzero(lengths == length)
            if length == 0:
                out[idx] = _fmix32(np.full(len(idx), seed, dtype=_U32)).astype(np.int32)
                continue
            flat = np.frombuffer(b"".join(enc[i] for i in idx), dtype=np.uint8)
            mat = flat.reshape(len(idx), int(length))
            out[idx] = _murmur3_fixed_len(mat, seed).astype(np.int32)
    return out


def hash_range_slice(hashes: np.ndarray, shards: int) -> np.ndarray:
    """Root-shard assignment: Solr DocRouter.partitionRange over the full
    signed-32-bit range. step = floor((2^32 - 1) / S); slice i covers
    [MIN + i*step, MIN + (i+1)*step), last slice extends to MAX."""
    h = hashes.astype(np.int64) + 2**31  # shift to [0, 2^32)
    step = (2**32 - 1) // shards
    return np.minimum(h // step, shards - 1).astype(np.int32)


def micro_shard(hashes: np.ndarray, shards: int, partitions: int) -> np.ndarray:
    """Full micro-shard routing (SolrCloudPartitioner.java:133-136)."""
    if partitions % shards != 0:
        raise ValueError("partitions must be a multiple of shards (R % S == 0)")
    per = partitions // shards
    root = hash_range_slice(hashes, shards).astype(np.int64)
    offset = (hashes.astype(np.int64) & 0x7FFFFFFF) % per
    return (root * per + offset).astype(np.int32)


def route_keys(keys, shards: int, partitions: int | None = None) -> np.ndarray:
    """doc_key → micro-shard (or root shard when partitions is None/S)."""
    h = murmur3_x86_32(keys, seed=0)
    if partitions is None or partitions == shards:
        return hash_range_slice(h, shards)
    return micro_shard(h, shards, partitions)


def routing_pandas_udf(shards: int, partitions: int | None = None):
    """Factory: Arrow-vectorized pandas UDF  doc_key:string → shard_id:int."""
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def _route(keys: pd.Series) -> pd.Series:
        return pd.Series(route_keys(keys.to_numpy(), shards, partitions))

    return _route
