"""Bit-exactness of the numpy XXH64 twin (functions/xxh64.py) against
Spark's own `xxhash64` expression, and of the vectorized shingle-hash kernel
against the JVM higher-order expression it replaced.

The MinHash xxhash64 family now hashes shingles in numpy (dedupe_ops.
_shingle_xxh64_flat); these tests pin that every hash — and therefore every
signature, band bucket, and candidate pair — is identical to what the JVM
expression produced."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.config import IndexConfig
from solr_mapreduce_indexer_spark.functions.analysis import (tokenize_col,
                                                             tokenize_pandas)
from solr_mapreduce_indexer_spark.functions.xxh64 import xxh64_bytes
from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
    _shingle_hash_expr, _shingle_xxh64_flat)


def _spark_xxh64(spark, values: list[str]) -> list[int]:
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["h"] for r in
            df.select(F.xxhash64("s").alias("h")).collect()]


def test_xxh64_matches_spark_all_lengths(spark):
    rng = np.random.default_rng(7)
    vals = [""]
    # every tail-path combination: lengths 0..40 cover <32 fully and one
    # stripe + every remainder; 64/65/100 cover multi-stripe
    for ln in list(range(1, 41)) + [63, 64, 65, 100, 1000]:
        vals.append("".join(chr(rng.integers(32, 127)) for _ in range(ln)))
    vals += ["tok00001 tok00002 tok00003", "héllo wörld", "日本語テキスト",
             "a" * 31, "a" * 32, "a" * 33]
    expect = _spark_xxh64(spark, vals)
    got = xxh64_bytes(vals).tolist()
    assert got == expect


def test_xxh64_null_input_is_seed(spark):
    df = spark.createDataFrame([(None,)], "s string")
    h = df.select(F.xxhash64("s").alias("h")).first()["h"]
    assert h == 42  # seed passes through — _shingle_xxh64_flat's null case


@pytest.mark.parametrize("w", [1, 2, 3, 5])
def test_shingle_kernel_matches_jvm_expression(spark, w):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "one two",           # fewer tokens than w=3/5 → whole-doc shingle
        "single",
        "",                  # no tokens → hash of ""
        None,                # null text → null token array → seed hash
        "Hello, WORLD! 123 mixed-CASE punct...",
        "tok " * 40,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    cfg = IndexConfig()
    toks = tokenize_col("text", cfg)
    jvm = df.select(_shingle_hash_expr(toks, w, "xxhash64").alias("sh")) \
            .collect()
    expect = [list(r["sh"]) if r["sh"] is not None else None for r in jvm]

    tok_arrays = tokenize_pandas(pd.Series(texts), cfg)
    tok_arrays = [None if texts[i] is None else list(tok_arrays.iloc[i])
                  for i in range(len(texts))]
    flat, n_sh = _shingle_xxh64_flat(np.array(tok_arrays, dtype=object), w)
    starts = np.zeros(len(n_sh), dtype=np.int64)
    np.cumsum(n_sh[:-1], out=starts[1:])
    for i, exp in enumerate(expect):
        got = flat[starts[i]:starts[i] + n_sh[i]].tolist()
        if exp is None:
            # JVM: null token array → hash expression returns the seed; the
            # kernel emits one seed-valued shingle so signatures agree
            assert got == [42]
        else:
            assert got == exp, f"doc {i} (w={w})"


def test_minhash_signatures_unchanged_values(spark):
    """End-to-end pin: signatures from the vectorized path equal a direct
    replay of the legacy recipe (JVM shingle hashes → (a*h+b) % p mins)."""
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        MERSENNE, _minhash_params, minhash_signatures)
    texts = ["alpha beta gamma delta epsilon zeta", "alpha beta gamma",
             "completely different words here now", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: list(r["sig"])
           for r in minhash_signatures(df, num_perm=8).collect()}

    cfg = IndexConfig()
    toks = tokenize_col("text", cfg)
    jvm = df.select("doc_id",
                    _shingle_hash_expr(toks, 3, "xxhash64").alias("sh")) \
            .collect()
    a, b = _minhash_params(8, 42, "xxhash64")
    for r in jvm:
        h = np.asarray(list(r["sh"]), dtype=np.int64)
        with np.errstate(over="ignore"):
            hv = h.astype(np.uint64) % np.uint64(MERSENNE)
            exp = [int(np.int64(((np.uint64(a[q]) * hv + np.uint64(b[q]))
                                 % np.uint64(MERSENNE)).min()))
                   for q in range(8)]
        assert got[r["doc_id"]] == exp
