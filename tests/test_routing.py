import numpy as np
import pytest

from solr_mapreduce_indexer_spark.functions.routing import (
    hash_range_slice, micro_shard, murmur3_x86_32, route_keys)
from solr_mapreduce_indexer_spark.query.oracle import murmur3_scalar, route_scalar


def test_murmur3_known_vectors():
    # public MurmurHash3 test vectors (x86_32)
    assert murmur3_scalar(b"", 0) == 0
    assert murmur3_scalar(b"", 1) == 0x514E28B7
    assert murmur3_scalar(b"hello", 0) == 0x248BFA47
    got = murmur3_x86_32(["", "hello"], seed=0)
    assert got[0] == 0
    assert got[1] == 0x248BFA47


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(3)
    keys = []
    for _ in range(500):
        n = int(rng.integers(0, 40))
        keys.append(bytes(rng.integers(0, 256, size=n, dtype=np.uint8)))
    vec = murmur3_x86_32(keys, seed=0)
    for k, v in zip(keys, vec):
        assert murmur3_scalar(k, 0) == v
    vec7 = murmur3_x86_32(keys, seed=7)
    for k, v in zip(keys, vec7):
        assert murmur3_scalar(k, 7) == v


def test_micro_shard_formula_matches_scalar_oracle():
    keys = [f"conv{i:08d}#{i % 13}" for i in range(2000)]
    got = route_keys(keys, shards=4, partitions=16)
    for k, g in zip(keys, got):
        assert route_scalar(k, 4, 16) == g
    # invariant from the reference: micro in [0, R), R % S == 0
    assert got.min() >= 0 and got.max() < 16
    # every root shard non-empty at this scale
    roots = got // 4
    assert set(roots.tolist()) == {0, 1, 2, 3}


def test_partitions_must_be_multiple_of_shards():
    with pytest.raises(ValueError):
        micro_shard(np.array([1, 2], dtype=np.int32), shards=3, partitions=8)


def test_hash_range_slice_uniformish():
    rng = np.random.default_rng(5)
    h = rng.integers(-2**31, 2**31, size=20_000).astype(np.int64).astype(np.int32)
    s = hash_range_slice(h, 8)
    counts = np.bincount(s, minlength=8)
    assert counts.min() > 0.8 * counts.mean()
