"""Merge-equivalence + resume (FIXTURES.md §6, mirroring the reference's
mtree-correctness claim, IndexMergeTool.java:207-235)."""

import glob
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.config import IndexConfig
from solr_mapreduce_indexer_spark.index.build import build_index
from solr_mapreduce_indexer_spark.index.manifest import checkpoint_path, read_manifest
from solr_mapreduce_indexer_spark.query.bm25 import load_index, run_queries
from solr_mapreduce_indexer_spark.sources.transcripts import NEEDLES

QUERIES = [
    {"query_id": 0, "terms": [NEEDLES[0]], "mode": "AND", "k": 10},
    {"query_id": 1, "terms": ["tok00000", "tok00002"], "mode": "AND", "k": 10},
    {"query_id": 2, "terms": ["tok00001", NEEDLES[1]], "mode": "OR", "k": 10},
]


@pytest.fixture(scope="module")
def direct_idx(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("direct"))
    build_index(spark, transcripts_df, IndexConfig(shards=2, reducers=-2), d)
    return d


@pytest.fixture(scope="module")
def merged_idx(spark, transcripts_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("merged"))
    build_index(spark, transcripts_df,
                IndexConfig(shards=2, reducers=8, fanout=2), d)
    return d


def _results(spark, idx_dir):
    res = run_queries(spark, load_index(idx_dir), QUERIES).toPandas()
    # compare by externally-meaningful identity; sort out tie-order noise
    return (res.assign(score=res["score"].round(9))
               .sort_values(["query_id", "score", "conv_id", "turn_idx"],
                            ascending=[True, False, True, True])
               [["query_id", "conv_id", "turn_idx", "score"]]
               .reset_index(drop=True))


def test_merge_tree_shape(spark, merged_idx):
    m = read_manifest(merged_idx)
    assert [l["n_shards"] for l in m["levels"]] == [8, 4, 2]
    # every level checkpoint carries per-shard lineage/metrics
    for lvl in m["levels"]:
        assert all("n_postings" in s for s in lvl["segments"])


def test_merged_equals_direct(spark, direct_idx, merged_idx):
    md, mm = read_manifest(direct_idx), read_manifest(merged_idx)
    assert md["stats"] == mm["stats"]
    a = _results(spark, direct_idx)
    b = _results(spark, merged_idx)
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()
    np.testing.assert_allclose(a["score"], b["score"], atol=1e-9)


def test_merged_posting_counts_match(spark, direct_idx, merged_idx):
    pa = (spark.read.parquet(os.path.join(direct_idx, "segments", "level_0"))
          .groupBy("term").agg(F.sum("n").alias("n")).toPandas()
          .set_index("term")["n"].sort_index())
    pb = (spark.read.parquet(read_manifest(merged_idx)["levels"][-1]["path"])
          .groupBy("term").agg(F.sum("n").alias("n")).toPandas()
          .set_index("term")["n"].sort_index())
    assert pa.equals(pb)


def test_resume_after_partial_merge(spark, transcripts_df, merged_idx, tmp_path_factory):
    """Kill-after-level-1 simulation: drop the level_2 checkpoint + manifest,
    rerun; earlier phases must be reused (not rebuilt), results identical."""
    before = _results(spark, merged_idx)
    os.remove(checkpoint_path(merged_idx, "level_2"))
    os.remove(os.path.join(merged_idx, "manifest.json"))
    docmap_mtime = {p: os.path.getmtime(p) for p in
                    glob.glob(os.path.join(merged_idx, "docmap", "**", "*.parquet"),
                              recursive=True)}
    build_index(spark, transcripts_df,
                IndexConfig(shards=2, reducers=8, fanout=2), merged_idx)
    after_mtime = {p: os.path.getmtime(p) for p in docmap_mtime}
    assert docmap_mtime == after_mtime, "docmap was rebuilt on resume"
    after = _results(spark, merged_idx)
    assert before.equals(after)


def test_merge_independent_indexes_matches_union_build(spark, tmp_path):
    """merge_indexes over two independently built indexes must answer
    queries with the SAME (conv_id, turn_idx, score) results as one index
    built over the union of their inputs (BM25 depends on tf/dl/df/N/avgdl —
    all identical; only doc-id assignment differs)."""
    from solr_mapreduce_indexer_spark.config import IndexConfig
    from solr_mapreduce_indexer_spark.index.build import build_index
    from solr_mapreduce_indexer_spark.index.merge import merge_indexes
    from solr_mapreduce_indexer_spark.index.validate import validate_index
    from solr_mapreduce_indexer_spark.query.bm25 import bm25_topk, load_index
    from solr_mapreduce_indexer_spark.sources.transcripts import (
        synth_transcripts_pandas, TRANSCRIPT_SCHEMA)

    pdf_a = synth_transcripts_pandas(n_convs=60, turns_per_conv=4, seed=1)
    pdf_b = synth_transcripts_pandas(n_convs=50, turns_per_conv=4, seed=2)
    pdf_b["conv_id"] = "b" + pdf_b["conv_id"]  # disjoint keys
    df_a = spark.createDataFrame(pdf_a, schema=TRANSCRIPT_SCHEMA)
    df_b = spark.createDataFrame(pdf_b, schema=TRANSCRIPT_SCHEMA)

    cfg = IndexConfig(shards=2, reducers=4, fanout=2)
    ia, ib = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, df_a, cfg, ia)
    build_index(spark, df_b, cfg, ib)
    merged_dir = str(tmp_path / "merged")
    m = merge_indexes(spark, [ia, ib], merged_dir)
    assert m["shards"] == 4
    assert m["stats"]["n_docs"] == len(pdf_a) + len(pdf_b)

    union_dir = str(tmp_path / "union")
    build_index(spark, df_a.unionByName(df_b), cfg, union_dir)

    hm, hu = load_index(merged_dir), load_index(union_dir)
    for terms, mode in ([["tok00001", "tok00005"], "OR"],
                        [["tok00000", "tok00002"], "AND"],
                        [["zyzzyva"], "OR"]):
        got = bm25_topk(spark, hm, terms, k=15, mode=mode).collect()
        want = bm25_topk(spark, hu, terms, k=15, mode=mode).collect()
        key = lambda r: (round(r["score"], 9), r["conv_id"], r["turn_idx"])
        assert sorted(map(key, got)) == sorted(map(key, want)), (terms, mode)

    # the merged index passes full read-back validation (df/cf, doc_len
    # cross-check, block bounds under the merged avgdl)
    assert validate_index(spark, merged_dir)["ok"]
