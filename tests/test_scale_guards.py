"""Scale guards: degenerate-bucket caps (mass-duplicated corpora must not
quadratically explode LSH joins), max_segments compaction, publish swap,
and input-format parity features."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
    minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs)


@pytest.fixture(scope="module")
def dup_heavy_docs(spark):
    """5k near-identical docs (one degenerate LSH bucket) + 20 distinct."""
    texts = (["common boilerplate text repeated across the whole corpus "
              "with the same tokens every time"] * 5000
             + [f"unique document number {i} with distinct content {i * 37}"
                for i in range(20)])
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf)


def test_minhash_bucket_cap_bounds_output(dup_heavy_docs):
    # uncapped, the 5k-dup bucket alone is ~12.5M pairs × 16 bands; with the
    # cap the degenerate bucket is dropped and the job stays tiny
    metrics: dict = {}
    got = minhash_lsh_pairs(dup_heavy_docs, num_perm=16, bands=4,
                            jaccard_threshold=0.5, max_bucket_size=100,
                            metrics=metrics)
    assert got.count() == 0  # only the degenerate clique collides
    # dropped work is observable, not silent: the 5000-doc clique lands in
    # one bucket per band (4 bands) → exactly 4 dropped buckets, 20000 rows
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        collect_cap_metrics)
    caps = collect_cap_metrics(metrics)["minhash_bucket_cap"]
    assert caps["dropped_buckets"] == 4
    assert caps["dropped_rows"] == 4 * 5000
    assert caps["max_bucket_seen"] == 5000


def test_simhash_bucket_cap_bounds_output(dup_heavy_docs):
    metrics: dict = {}
    got = simhash_near_pairs(dup_heavy_docs, max_hamming=3,
                             max_bucket_size=100, metrics=metrics)
    assert got.count() == 0
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        collect_cap_metrics)
    caps = collect_cap_metrics(metrics)["simhash_bucket_cap"]
    # identical docs share one simhash → one degenerate bucket per band
    assert caps["dropped_buckets"] >= 4
    assert caps["dropped_rows"] >= 4 * 5000
    assert caps["max_bucket_seen"] >= 5000


def test_embedding_bucket_cap_metrics(spark):
    import numpy as np
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        collect_cap_metrics, embedding_near_pairs)
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    vecs = [list(map(float, base))] * 300 \
        + [list(map(float, rng.standard_normal(8))) for _ in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs}))
    metrics: dict = {}
    got = embedding_near_pairs(df, threshold=0.99, n_planes=16, bands=4,
                               dim=8, max_bucket_size=50, metrics=metrics)
    got.count()
    caps = collect_cap_metrics(metrics)["embedding_bucket_cap"]
    # 300 identical vectors share every band bucket → ≥4 dropped buckets
    assert caps["dropped_buckets"] >= 4
    assert caps["dropped_rows"] >= 4 * 300
    assert caps["max_bucket_seen"] >= 300


def test_ngram_shingle_cap_metrics(spark):
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        collect_cap_metrics)
    texts = [f"shared prefix tokens here then unique {i} {i * 13}"
             for i in range(100)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    metrics: dict = {}
    ngram_jaccard_pairs(df, n=3, threshold=0.2, max_shingle_df=50,
                        metrics=metrics).count()
    caps = collect_cap_metrics(metrics)["shingle_df_cap"]
    # 'shared prefix tokens', 'prefix tokens here', 'tokens here then' have
    # df=100 > 50; 'here then unique' too → 4 shingles × 100 docs dropped
    assert caps["dropped_shingles"] == 4
    assert caps["dropped_occurrences"] == 400
    assert caps["max_shingle_df_seen"] == 100


def test_ngram_shingle_cap(spark):
    # a hot shingle shared by every doc must not create all-pairs candidates
    texts = [f"shared prefix tokens here then unique {i} {i * 13} {i * 7}"
             for i in range(200)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.2, max_shingle_df=50)
    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.2,
                                   max_shingle_df=None)
    # the hot prefix shingles are df=200 > 50: capped candidate generation
    # must not enumerate the 200² prefix-only pairs
    assert capped.count() < uncapped.count()


def test_cap_disabled_matches_exact(spark):
    # with a cap far above every shingle df, results are identical
    texts = ["alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon eta",
             "totally different words in this one right here"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3), "text": texts}))
    a = sorted(ngram_jaccard_pairs(df, n=3, threshold=0.3,
                                   max_shingle_df=10_000).collect())
    b = sorted(ngram_jaccard_pairs(df, n=3, threshold=0.3,
                                   max_shingle_df=None).collect())
    assert a == b


def test_compact_max_segments(spark, tmp_path):
    from solr_mapreduce_indexer_spark.config import IndexConfig
    from solr_mapreduce_indexer_spark.index.build import build_index
    from solr_mapreduce_indexer_spark.index.merge import compact_final
    from solr_mapreduce_indexer_spark.sources.transcripts import synth_transcripts

    tr = synth_transcripts(spark, n_convs=60, turns_per_conv=4)
    idx = str(tmp_path / "idx")
    build_index(spark, tr, IndexConfig(shards=2, reducers=4, fanout=2), idx)
    m = compact_final(spark, idx, max_segments=2)
    final = m["levels"][-1]["path"]
    for shard_dir in os.scandir(final):
        if shard_dir.name.startswith("shard_id="):
            files = [f for f in os.listdir(shard_dir.path)
                     if f.endswith(".parquet")]
            assert 1 <= len(files) <= 2, (shard_dir.name, files)
    # compacted index still answers queries
    from solr_mapreduce_indexer_spark.query.bm25 import bm25_topk, load_index
    assert bm25_topk(spark, load_index(idx), ["tok00001"], k=5).count() > 0


def test_publish_atomic_swap(spark, tmp_path):
    from solr_mapreduce_indexer_spark.config import IndexConfig
    from solr_mapreduce_indexer_spark.index.build import build_index
    from solr_mapreduce_indexer_spark.index.manifest import publish_index
    from solr_mapreduce_indexer_spark.query.bm25 import bm25_topk, load_index
    from solr_mapreduce_indexer_spark.sources.transcripts import synth_transcripts

    import shutil

    tr = synth_transcripts(spark, n_convs=40, turns_per_conv=4)
    idx = str(tmp_path / "idx")
    serving = str(tmp_path / "serving")
    build_index(spark, tr, IndexConfig(shards=2), idx)
    out = publish_index(idx, serving)
    current = os.path.join(serving, "current")
    assert os.path.islink(current)
    assert out["snapshot"].endswith("snap_000000")
    # the published snapshot is a complete, queryable index
    h = load_index(current)
    assert bm25_topk(spark, h, ["tok00001"], k=3).count() > 0
    # re-publish of the SAME manifest is an idempotent rerun: no new snapshot
    out2 = publish_index(idx, serving)
    assert out2.get("rerun") is True
    assert os.readlink(current).endswith("snap_000000")
    # a CHANGED index publishes as the next snapshot and swaps the link
    idx2 = str(tmp_path / "idx2")
    tr2 = synth_transcripts(spark, n_convs=50, turns_per_conv=4)
    build_index(spark, tr2, IndexConfig(shards=2), idx2)
    out3 = publish_index(idx2, serving)
    assert out3["snapshot"].endswith("snap_000001")
    assert os.readlink(current).endswith("snap_000001")
    # REGRESSION (round-2 advice): after pruning an OLD snapshot, the next
    # publish must not collide with the newest one — names are max+1, not a
    # count of existing dirs (count-naming silently deleted the fresh
    # snapshot and left 'current' serving stale data forever)
    shutil.rmtree(os.path.join(serving, "snapshots", "snap_000000"))
    out4 = publish_index(idx, serving)
    assert out4["snapshot"].endswith("snap_000002")
    assert os.readlink(current).endswith("snap_000002")
    assert bm25_topk(spark, load_index(current), ["tok00001"], k=3).count() > 0
    # publishing an uncommitted dir fails up front
    with pytest.raises(FileNotFoundError):
        publish_index(str(tmp_path / "not_an_index"), serving)


def test_read_formats_and_overrides(spark, tmp_path):
    from solr_mapreduce_indexer_spark.sources.transcripts import (
        apply_field_overrides, read_transcripts, synth_transcripts)

    tr = synth_transcripts(spark, n_convs=10, turns_per_conv=4)
    csv_dir = str(tmp_path / "c")
    json_dir = str(tmp_path / "j")
    tr.write.option("header", "true").option("timestampFormat",
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").csv(csv_dir)
    tr.write.json(json_dir)
    back_csv = read_transcripts(spark, f"csv:{csv_dir}")
    back_json = read_transcripts(spark, f"json:{json_dir}")
    assert back_csv.count() == 40 and back_json.count() == 40
    assert [f.name for f in back_csv.schema] == [f.name for f in tr.schema]
    # text survives CSV round-trip (quoting) — per-row equality
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tr.collect()}
    for r in back_csv.collect():
        assert orig[(r["conv_id"], r["turn_idx"])] == r["text"]

    forced = apply_field_overrides(tr, {"role": "assistant", "pipeline": "v2"})
    rows = forced.select("role", "pipeline").distinct().collect()
    assert rows == [("assistant", "v2")] or \
        [tuple(r) for r in rows] == [("assistant", "v2")]


def test_avro_round_trip_if_available(spark, tmp_path):
    """Avro input parity — gated: the sandbox image ships no spark-avro jar
    (it is a cluster-side package), so this runs wherever the package
    exists and skips cleanly here."""
    from py4j.protocol import Py4JJavaError

    from solr_mapreduce_indexer_spark.sources.transcripts import (
        read_transcripts, synth_transcripts)

    tr = synth_transcripts(spark, n_convs=5, turns_per_conv=2)
    avro_dir = str(tmp_path / "avro")
    try:
        tr.write.format("avro").save(avro_dir)
    except (Py4JJavaError, Exception) as e:  # noqa: BLE001
        if "avro" in str(e).lower() or "Failed to find" in str(e):
            pytest.skip("spark-avro package not available in this image")
        raise
    back = read_transcripts(spark, f"avro:{avro_dir}")
    assert back.count() == 10
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tr.collect()}
    for r in back.collect():
        assert orig[(r["conv_id"], r["turn_idx"])] == r["text"]
