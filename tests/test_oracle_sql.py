"""The DuckDB oracle-SQL generators must replay the engine's hash kernels
bit-identically. These tests compare the generated SQL (run in a local DuckDB)
against independent scalar Python implementations — no Spark involved."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest

from solr_mapreduce_indexer_spark.functions import oracle_sql as O
from solr_mapreduce_indexer_spark.query.oracle import murmur3_scalar, route_scalar

KEYS = ["conv0#0", "conv123#7", "a", "ab", "abc", "abcd", "abcde", "",
        "conv99999999#3", "x" * 13, "hello world!", "1234567890123456"]


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
              + ",".join(f"('{k}')" for k in KEYS) + ") v(key)")
    return c


def test_murmur3_sql_matches_scalar(con):
    sql = "WITH " + O.murmur3_cte("t", "key") + " SELECT _mkey, hs FROM mm_out"
    got = dict(con.execute(sql).fetchall())
    for k in KEYS:
        assert got[k] == murmur3_scalar(k.encode()), k


def test_routing_sql_matches_scalar(con):
    S, R = 2, 8
    step = (2**32 - 1) // S
    per = R // S
    sql = ("WITH " + O.murmur3_cte("t", "key") + f"""
        SELECT _mkey,
               (least(((h32 + 2147483648) % 4294967296) // {step}, {S - 1}) * {per}
                + (hs & 2147483647) % {per})::INT AS shard
        FROM mm_out""")
    got = dict(con.execute(sql).fetchall())
    for k in KEYS:
        if k:
            assert got[k] == route_scalar(k, S, R), k


def test_md5_int_sql(con):
    for n in (7, 15):
        sql = f"SELECT key, {O.md5_int_sql('key', n)} FROM t"
        for k, v in con.execute(sql).fetchall():
            assert v == int(hashlib.md5(k.encode()).hexdigest()[:n], 16), (k, n)


def _tok(t: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", t.lower())


def _md5i(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


def _py_winnow(toks: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Published winnowing definition (Schleimer et al. SIGMOD'03 §4):
    window of w consecutive k-gram hashes, select the minimum, rightmost on
    ties; fingerprint = distinct (position, hash) selections."""
    if len(toks) >= k:
        hs = [_md5i(" ".join(toks[i:i + k]), 15)
              for i in range(len(toks) - k + 1)]
    else:
        hs = [_md5i(" ".join(toks), 15)]
    sels = set()
    for j in range(max(len(hs) - w + 1, 1)):
        sl = hs[j:j + w]
        mv = min(sl)
        rpos = len(sl) - sl[::-1].index(mv) - 1
        sels.add((j + rpos + 1, mv))
    return sels


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "do run run run do run run",            # repeated shingles → ties
    "a b c d e f g h i j k l",
    "one two",                              # fewer tokens than k
    "",                                     # empty
    "Winnowing local algorithms for document fingerprinting classic",
]


def test_winnow_sql_matches_python():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
                + ") v(doc_id, text)")
    sql = O.winnow_sql("regexp_extract_all(lower(text), '[a-z0-9]+')", 3, 4)
    got: dict[int, set] = {}
    for doc_id, pos, fp in con.execute(sql).fetchall():
        got.setdefault(doc_id, set()).add((pos, fp))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _py_winnow(_tok(t), 3, 4), (i, t)


def test_winnow_guarantee_shared_run():
    """Winnowing guarantee: two docs sharing a token run of >= w + k - 1
    tokens share at least one fingerprint hash."""
    a = "xx yy " + "shared run of many common tokens here" + " tail one"
    b = "completely different start " + "shared run of many common tokens here"
    fa = _py_winnow(_tok(a), 3, 4)
    fb = _py_winnow(_tok(b), 3, 4)
    assert {h for _, h in fa} & {h for _, h in fb}
