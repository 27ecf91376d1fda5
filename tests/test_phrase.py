"""Positions + PHRASE queries (Q5-adjacent stretch parity: the reference's
Lucene 7.7.2 output stores positions and serves phrase queries).

Oracle: pure-python per-doc evaluation — tokenize with the config regex,
count consecutive-position phrase occurrences, score with Lucene phrase
BM25 (tf = phrase freq, weight = Σ idf of the phrase slots).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from solr_mapreduce_indexer_spark.config import IndexConfig
from solr_mapreduce_indexer_spark.index.build import build_index
from solr_mapreduce_indexer_spark.index.codec import (
    decode_positions, encode_positions)
from solr_mapreduce_indexer_spark.query.bm25 import bm25_topk, load_index
from solr_mapreduce_indexer_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TEXTS = [
    "quick brown fox jumps over the lazy dog",
    "the quick brown cat sat still",
    "brown quick reversed words here now",
    "quick brown quick brown quick brown",   # 3 phrase occurrences
    "nothing relevant at all in this one",
    "ends with quick brown",
    "quick then gap then brown apart",
    "repeat repeat repeat repeat",
    "a quick brown moment then another quick brown moment",
]


def _corpus(spark):
    rows = [(f"c{i}", 0, "user", t, None, "2024-01-01T00:00:00")
            for i, t in enumerate(TEXTS)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def phrase_oracle(texts, phrase, k1=1.2, b=0.75):
    """Per-doc (phrase_freq, dl) + BM25 phrase scores over the corpus."""
    pat = re.compile("[a-z0-9]+")
    toks = [pat.findall(t.lower()) for t in texts]
    n = len(toks)
    avgdl = sum(map(len, toks)) / n
    dfs = {t: sum(1 for tk in toks if t in tk) for t in set(phrase)}
    idf_sum = sum(math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                  for t in phrase)
    out = {}
    for i, tk in enumerate(toks):
        pf = sum(1 for j in range(len(tk) - len(phrase) + 1)
                 if tk[j:j + len(phrase)] == phrase)
        if pf:
            dl = len(tk)
            out[i] = idf_sum * pf * (k1 + 1) / (
                pf + k1 * (1 - b + b * dl / avgdl))
    return out


def test_position_codec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n_post = rng.integers(1, 50)
        tfs = rng.integers(1, 9, size=n_post)
        pos = np.concatenate([np.sort(rng.choice(5000, size=t, replace=False))
                              for t in tfs]).astype(np.int64)
        buf = encode_positions(pos, tfs)
        back, offs = decode_positions(buf, tfs)
        assert np.array_equal(back, pos)
        assert np.array_equal(offs, np.cumsum(tfs) - tfs)


def test_position_codec_large_count():
    # >65535 positions in one block exercises the 4-byte-count tag-2 path
    tfs = np.full(700, 100, dtype=np.int64)
    pos = np.concatenate([np.arange(100, dtype=np.int64)] * 700)
    back, _ = decode_positions(encode_positions(pos, tfs), tfs)
    assert len(back) == 70000 and np.array_equal(back, pos)


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("pidx") / "idx")
    cfg = IndexConfig(shards=2, positions=True)
    build_index(spark, _corpus(spark), cfg, idx)
    return idx


def _got_scores(spark, idx, phrase, k=10):
    res = bm25_topk(spark, load_index(idx), phrase, k=k, mode="PHRASE")
    return {int(r["conv_id"][1:]): r["score"] for r in res.collect()}


def test_phrase_matches_oracle(pidx, spark):
    got = _got_scores(spark, pidx, ["quick", "brown"])
    want = phrase_oracle(TEXTS, ["quick", "brown"])
    assert set(got) == set(want)  # docs 0,1,3,5,8 — not the reversed/gapped
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_phrase_counts_multiple_occurrences(pidx, spark):
    got = _got_scores(spark, pidx, ["quick", "brown"])
    want = phrase_oracle(TEXTS, ["quick", "brown"])
    # doc 3 has pf=3, doc 8 pf=2 — higher pf ⇒ higher score at similar dl
    assert got[3] == pytest.approx(want[3], rel=1e-12)
    assert want[3] > want[1]


def test_phrase_three_terms_and_duplicates(pidx, spark):
    got = _got_scores(spark, pidx, ["quick", "brown", "fox"])
    want = phrase_oracle(TEXTS, ["quick", "brown", "fox"])
    assert set(got) == {0} and got[0] == pytest.approx(want[0], rel=1e-12)
    got2 = _got_scores(spark, pidx, ["repeat", "repeat"])
    want2 = phrase_oracle(TEXTS, ["repeat", "repeat"])
    assert set(got2) == {7} and got2[7] == pytest.approx(want2[7], rel=1e-12)


def test_phrase_no_match_and_absent_term(pidx, spark):
    assert _got_scores(spark, pidx, ["brown", "dog"]) == {}
    assert _got_scores(spark, pidx, ["quick", "zzznope"]) == {}


def test_phrase_survives_compact(pidx, spark):
    from solr_mapreduce_indexer_spark.index.merge import compact_final
    from solr_mapreduce_indexer_spark.index.validate import validate_index
    before = _got_scores(spark, pidx, ["quick", "brown"])
    compact_final(spark, pidx)
    after = _got_scores(spark, pidx, ["quick", "brown"])
    assert before == after
    rep = validate_index(spark, pidx)
    assert rep["ok"], rep


def test_phrase_requires_positions(spark, tmp_path):
    idx = str(tmp_path / "nopos")
    build_index(spark, _corpus(spark), IndexConfig(shards=1), idx)
    with pytest.raises(Exception, match="positions"):
        bm25_topk(spark, load_index(idx), ["quick", "brown"],
                  mode="PHRASE").collect()


def test_validate_checks_positions(pidx, spark):
    from solr_mapreduce_indexer_spark.index.validate import validate_index
    rep = validate_index(spark, pidx)
    assert rep["ok"], rep
