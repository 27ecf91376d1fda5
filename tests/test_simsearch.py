import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.simsearch import (
    cosine_topk, ivf_assign, ivf_topk, kmeans_centroids)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def qvec():
    return duckdb.sql(f"SELECT embedding FROM '{EMB}' WHERE vec_id = 0").fetchone()[0]


def test_bruteforce_cosine_matches_duckdb(spark, emb, qvec):
    got = cosine_topk(emb, qvec, k=10).toPandas()
    want = duckdb.sql(f"""
        SELECT vec_id, list_cosine_similarity(embedding, ?::FLOAT[]) AS cosine
        FROM '{EMB}' ORDER BY cosine DESC, vec_id LIMIT 10
    """, params=[qvec]).df()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    np.testing.assert_allclose(got["cosine"], want["cosine"], atol=1e-5)
    assert got["vec_id"].iloc[0] == 0  # self-match first


def test_bruteforce_against_numpy(spark, emb, qvec):
    got = cosine_topk(emb, qvec, k=5).toPandas()
    pdf = emb.toPandas()
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:5]
    assert got["vec_id"].tolist() == pdf["vec_id"].to_numpy()[order].tolist()


def test_ivf_recall(spark, emb, qvec):
    cents = kmeans_centroids(emb, n_centroids=8, iters=4)
    assigned = ivf_assign(emb, cents)
    exact = cosine_topk(emb, qvec, k=10).toPandas()["vec_id"].tolist()
    approx = ivf_topk(assigned, cents, qvec, k=10, nprobe=4).toPandas()["vec_id"].tolist()
    # recall@10 with half the centroids probed should be high
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, (exact, approx)
    # full probe == exact
    allprobe = ivf_topk(assigned, cents, qvec, k=10, nprobe=8).toPandas()["vec_id"].tolist()
    assert allprobe == exact


def test_ivf_persisted_index_prunes_partitions(spark, emb, qvec, tmp_path):
    """The persisted IVF index must answer probes by PARTITION PRUNING: the
    probe plan's parquet scan carries PartitionFilters on `centroid`, so only
    nprobe/K of the files are read at 100 TB."""
    from solr_mapreduce_indexer_spark.operators.simsearch import (
        build_ivf_index, load_ivf_index)

    path = str(tmp_path / "ivf")
    cents = build_ivf_index(spark, emb, path, n_centroids=8, iters=3)
    vecs, cents2 = load_ivf_index(spark, path)
    np.testing.assert_allclose(cents, cents2)

    probe = ivf_topk(vecs, cents2, qvec, k=10, nprobe=8)
    # nprobe = K → identical to exact brute force
    exact = cosine_topk(emb, qvec, k=10).toPandas()["vec_id"].tolist()
    assert probe.toPandas()["vec_id"].tolist() == exact

    # plan audit: the filter must reach the scan as a partition filter
    plan = ivf_topk(vecs, cents2, qvec, k=10, nprobe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "centroid" in plan.split(
        "PartitionFilters")[1][:200]
