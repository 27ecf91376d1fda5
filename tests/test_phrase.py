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
    h = load_index(idx)
    # eager driver-side ValueError at plan time, not a wrapped executor
    # error after a doomed batch (and not 0 silent rows when the phrase
    # happens to have no doc-level candidates — the lazy kernel check
    # never fires for those)
    with pytest.raises(ValueError, match="positions"):
        bm25_topk(spark, h, ["quick", "brown"], mode="PHRASE")
    with pytest.raises(ValueError, match="positions"):
        bm25_topk(spark, h, ["zzabsent", "alsoabsent"], mode="PHRASE")


def test_validate_checks_positions(pidx, spark):
    from solr_mapreduce_indexer_spark.index.validate import validate_index
    rep = validate_index(spark, pidx)
    assert rep["ok"], rep


# ---------------------------------------------------------------------------
# Conjunction-driven pruning (round-4): PHRASE must NOT decode every block of
# a Zipf-head phrase term — doc-level intersection drives which blocks (and
# which position streams) are touched, mirroring Lucene PhraseQuery's
# two-phase iteration. These tests run the kernel in-process and count block
# decodes via DECODE_STATS, exactly like tests/test_blockmax.py.
# ---------------------------------------------------------------------------

def _positional_table(docs_tokens, avgdl, block_size=32, k1=1.2, b=0.75):
    """Token lists → posting-block pandas table WITH position streams."""
    from solr_mapreduce_indexer_spark.index.codec import (
        encode_blocks, encode_positions)
    postings = {}  # term -> list[(doc, positions)]
    for d, toks in enumerate(docs_tokens):
        per = {}
        for i, t in enumerate(toks):
            per.setdefault(t, []).append(i)
        for t, ps in per.items():
            postings.setdefault(t, []).append((d, ps))
    doc_lens = np.array([len(t) for t in docs_tokens], dtype=np.int64)
    rows = []
    for term, pl in postings.items():
        pl.sort()
        docs = np.array([p[0] for p in pl], dtype=np.int64)
        tfs = np.array([len(p[1]) for p in pl], dtype=np.int64)
        flat = np.concatenate([np.asarray(p[1], np.int64) for p in pl])
        offs = np.cumsum(tfs) - tfs
        for bi, blk in enumerate(encode_blocks(
                docs, tfs, doc_lens[docs], avgdl, block_size=block_size,
                k1=k1, b=b)):
            s, e = bi * block_size, bi * block_size + blk["n"]
            lo = offs[s]
            hi = offs[e - 1] + tfs[e - 1]
            blk["pos_bytes"] = encode_positions(flat[lo:hi], tfs[s:e])
            rows.append(dict(shard_id=0, term=term, **blk))
    n = len(docs_tokens)
    dfs = {t: len(pl) for t, pl in postings.items()}
    idfs = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            for t, d in dfs.items()}
    return pd.DataFrame(rows), idfs, doc_lens


@pytest.fixture(scope="module")
def zipf_positional():
    """4000 docs; 'hot' appears in nearly every doc (Zipf head), 'rare' in a
    handful — and the phrase 'rare hot' occurs in exactly those docs."""
    rng = np.random.default_rng(11)
    fillers = [f"f{i:02d}" for i in range(30)]
    docs = []
    for d in range(4000):
        toks = list(rng.choice(fillers, rng.integers(8, 30)))
        toks.insert(int(rng.integers(0, len(toks))), "hot")
        if d % 100 == 0:  # 40 docs contain the phrase
            j = int(rng.integers(0, len(toks)))
            toks[j:j] = ["rare", "hot"]
        docs.append(toks)
    avgdl = float(np.mean([len(t) for t in docs]))
    pdf, idfs, doc_lens = _positional_table(docs, avgdl)
    return docs, pdf, idfs, doc_lens, avgdl


def test_phrase_prunes_hot_term_blocks(zipf_positional):
    from solr_mapreduce_indexer_spark.query import bm25 as Q
    docs, pdf, idfs, doc_lens, avgdl = zipf_positional
    Q.DECODE_STATS["blocks_decoded"] = 0
    Q.DECODE_STATS["pos_blocks_decoded"] = 0
    kern = Q._score_shard_kernel(
        [{"query_id": 0, "terms": ["rare", "hot"], "mode": "PHRASE",
          "k": 100}], idfs, avgdl, 1.2, 0.75)
    res = kern(pdf)
    pos_decoded = Q.DECODE_STATS["pos_blocks_decoded"]
    postings_decoded = Q.DECODE_STATS["blocks_decoded"] - pos_decoded
    total = int(pdf.term.isin(["rare", "hot"]).sum())
    # exhaustive (round-3 behavior) decoded every block of both terms;
    # conjunction-driven must touch a small fraction PER PAYLOAD: all of
    # 'rare' (1-2 blocks) + only candidate-overlapping blocks of 'hot' —
    # for the postings stream in phase 1 and (since round-5 lazy decode,
    # counted separately) the position stream in phase 2
    assert postings_decoded < 0.6 * total, (postings_decoded, total)
    assert pos_decoded < 0.6 * total, (pos_decoded, total)
    # and the results must still be exactly right
    want = phrase_oracle([" ".join(t) for t in docs], ["rare", "hot"])
    got = dict(zip(res.doc_id, res.score))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_phrase_position_payload_io_pruned(zipf_positional):
    """Direct-plan shape: position payloads are READ (pos_fetch point-read),
    not shipped up front — and only for candidate-overlapping blocks. The
    hot term's non-candidate pos_bytes must never be requested from
    storage, and results must equal the column-shipped path exactly."""
    from solr_mapreduce_indexer_spark.query import bm25 as Q
    docs, pdf, idfs, doc_lens, avgdl = zipf_positional
    queries = [{"query_id": 0, "terms": ["rare", "hot"], "mode": "PHRASE",
                "k": 100}]

    # reference: legacy path with the pos_bytes column present
    ref = Q._score_shard_kernel(queries, idfs, avgdl, 1.2, 0.75)(pdf)

    # direct-plan simulation: no pos_bytes column; a counting fetcher serves
    # point-reads from the same table
    requested: dict[str, set] = {}

    def pos_fetch(term, first_docs):
        requested.setdefault(term, set()).update(int(x) for x in first_docs)
        g = pdf[(pdf["term"] == term)
                & pdf["first_doc"].isin(list(first_docs))]
        return dict(zip(g["first_doc"].astype(int), g["pos_bytes"]))

    Q.DECODE_STATS["pos_blocks_fetched"] = 0
    got = Q._score_shard_kernel(queries, idfs, avgdl, 1.2, 0.75)(
        pdf.drop(columns=["pos_bytes"]), pos_fetch)
    assert dict(zip(got.doc_id, got.score)) == dict(zip(ref.doc_id, ref.score))

    n_hot = int((pdf["term"] == "hot").sum())
    assert "hot" in requested
    # non-candidate hot blocks are never requested from storage
    assert len(requested["hot"]) < 0.6 * n_hot, (len(requested["hot"]), n_hot)
    assert Q.DECODE_STATS["pos_blocks_fetched"] == sum(
        len(v) for v in requested.values())


def test_phrase_position_overflow_fails_loudly():
    """In-doc positions beyond the 32-bit key field must raise, not silently
    drop matches (the round-3 21-bit packing lost hits past ~2.09M tokens)."""
    from solr_mapreduce_indexer_spark.index.codec import (
        encode_blocks, encode_positions)
    from solr_mapreduce_indexer_spark.query import bm25 as Q
    big = (1 << 32) + 10  # a (pathological) position past the key field
    rows = []
    for term, pos in (("aa", np.array([big], np.int64)),
                      ("bb", np.array([big + 1], np.int64))):
        blk = encode_blocks(np.array([5]), np.array([1]),
                            np.array([big + 100]), avgdl=50.0)[0]
        blk["pos_bytes"] = encode_positions(pos, np.array([1]))
        rows.append(dict(shard_id=0, term=term, **blk))
    idfs = {"aa": 1.0, "bb": 1.0}
    kern = Q._score_shard_kernel(
        [{"query_id": 0, "terms": ["aa", "bb"], "mode": "PHRASE", "k": 10}],
        idfs, 50.0, 1.2, 0.75)
    with pytest.raises(ValueError, match="2\\^32"):
        kern(pd.DataFrame(rows))


def test_phase1_ruled_out_blocks_never_pay_position_decode():
    """Round-5 lazy decode: phase 1 is postings-only, so a lead-term block
    whose docs are all eliminated by the conjunction NEVER decodes its
    position payload. Fixture: 'lead' (rarest, leads) spans 16 blocks across
    the whole doc range; 'com' restricts candidates to the first ~90 docs —
    phase 2 must touch positions for only the few candidate-overlapping
    blocks, while phase 1 postings-decodes dozens."""
    from solr_mapreduce_indexer_spark.query import bm25 as Q
    rng = np.random.default_rng(23)
    fillers = [f"g{i:02d}" for i in range(20)]
    docs = []
    for d in range(4000):
        toks = list(rng.choice(fillers, rng.integers(8, 20)))
        if d % 8 == 0:
            j = int(rng.integers(0, len(toks)))
            if d < 96:  # phrase "lead com" adjacent here only
                toks[j:j] = ["lead", "com"]
            else:
                toks.insert(j, "lead")
        elif d < 96 or (d >= 2000 and d % 2 == 1):
            toks.insert(int(rng.integers(0, len(toks))), "com")
    # 'lead' df=500 (rarest -> leads, ~16 blocks over the full range);
    # 'com' df~1080; candidates = docs {0,8,...,88} only.
        docs.append(toks)
    avgdl = float(np.mean([len(t) for t in docs]))
    pdf, idfs, doc_lens = _positional_table(docs, avgdl)
    assert idfs["lead"] > idfs["com"]  # 'lead' really is the lead term
    n_lead_blocks = int((pdf.term == "lead").sum())
    assert n_lead_blocks >= 12
    Q.DECODE_STATS["blocks_decoded"] = 0
    Q.DECODE_STATS["pos_blocks_decoded"] = 0
    kern = Q._score_shard_kernel(
        [{"query_id": 0, "terms": ["lead", "com"], "mode": "PHRASE",
          "k": 100}], idfs, avgdl, 1.2, 0.75)
    res = kern(pdf)
    pos_decoded = Q.DECODE_STATS["pos_blocks_decoded"]
    all_decoded = Q.DECODE_STATS["blocks_decoded"]
    # candidates live in docs 0..88: <=2 lead blocks + <=4 com blocks
    assert pos_decoded <= 6, (pos_decoded, all_decoded)
    # phase 1 postings-decoded far more (all 16 lead + most com blocks)
    assert all_decoded - pos_decoded >= 3 * pos_decoded, \
        (pos_decoded, all_decoded)
    # results still exactly right
    want = phrase_oracle([" ".join(t) for t in docs], ["lead", "com"])
    got = dict(zip(res.doc_id, res.score))
    assert set(got) == set(want) != set()
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
