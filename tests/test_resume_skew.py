"""Checkpoint-resume at phase granularity and hot-term skew behavior
(SURVEY §5 test strategy; north rule: resumable from checkpoint with
per-partition lineage)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.config import IndexConfig
from solr_mapreduce_indexer_spark.index import manifest as mf
from solr_mapreduce_indexer_spark.index.build import build_index
from solr_mapreduce_indexer_spark.query.bm25 import bm25_topk, load_index
from solr_mapreduce_indexer_spark.sources.transcripts import synth_transcripts


def test_resume_skips_completed_phases(spark, tmp_path):
    """A build interrupted after level_0 must resume without redoing the
    completed phases, and finish to an identical index."""
    tr = synth_transcripts(spark, n_convs=80, turns_per_conv=4)
    cfg = IndexConfig(shards=2, reducers=8, fanout=2)
    full = str(tmp_path / "full")
    build_index(spark, tr, cfg, full)
    partial = str(tmp_path / "partial")
    build_index(spark, tr, cfg, partial)

    # simulate an interrupt AFTER level_0: drop every later phase artifact
    for phase in ("term_stats", "level_1", "level_2"):
        p = mf.checkpoint_path(partial, phase)
        if os.path.exists(p):
            os.remove(p)
    os.remove(os.path.join(partial, "manifest.json"))
    docmap_mtime = os.path.getmtime(mf.checkpoint_path(partial, "docmap"))
    level0_mtime = os.path.getmtime(mf.checkpoint_path(partial, "level_0"))

    build_index(spark, tr, cfg, partial, resume=True)
    # completed phases untouched (same checkpoint files, not rewritten)
    assert os.path.getmtime(mf.checkpoint_path(partial, "docmap")) == docmap_mtime
    assert os.path.getmtime(mf.checkpoint_path(partial, "level_0")) == level0_mtime
    # resumed index answers identically to the uninterrupted one
    a = bm25_topk(spark, load_index(full), ["tok00001", "tok00002"],
                  k=10, mode="OR").collect()
    b = bm25_topk(spark, load_index(partial), ["tok00001", "tok00002"],
                  k=10, mode="OR").collect()
    assert [(r["doc_id"], round(r["score"], 10)) for r in a] == \
           [(r["doc_id"], round(r["score"], 10)) for r in b]


def test_hot_term_skew_uniform_shards(spark, tmp_path):
    """Every document contains the same hot term: shard sizes must stay
    uniform (murmur3 routing is key-based, not term-based) and the hot
    term's postings spread across all shards; queries stay correct."""
    import pandas as pd
    n = 4000
    texts = [f"hotterm filler{i % 37} x{i % 11} unique{i}" for i in range(n)]
    pdf = pd.DataFrame({
        "conv_id": [f"c{i // 4}" for i in range(n)],
        "turn_idx": [i % 4 for i in range(n)],
        "role": ["user"] * n,
        "text": texts,
        "tool": [None] * n,
        "ts": pd.to_datetime("2024-01-01"),
    })
    df = spark.createDataFrame(pdf)
    cfg = IndexConfig(shards=4, reducers=8, fanout=2)
    idx = str(tmp_path / "skew_idx")
    build_index(spark, df, cfg, idx)

    with open(os.path.join(idx, "manifest.json")) as f:
        m = json.load(f)
    segs = m["levels"][0]["segments"]
    sizes = [s["n_postings"] for s in segs]
    assert len(sizes) == 8
    assert max(sizes) < 2.0 * min(sizes), sizes  # uniform micro-shards

    h = load_index(idx)
    # the hot term matches EVERY doc; top-k must return k rows, scores equal
    # up to doc-length variation, ties broken by ascending doc_id
    got = bm25_topk(spark, h, ["hotterm"], k=20, mode="AND").collect()
    assert len(got) == 20
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    docs_at_tie = [r["doc_id"] for r in got if r["score"] == scores[0]]
    assert docs_at_tie == sorted(docs_at_tie)
    # selective AND with the hot term still returns exactly the one doc
    one = bm25_topk(spark, h, ["hotterm", "unique137"], k=5, mode="AND").collect()
    assert len(one) == 1
