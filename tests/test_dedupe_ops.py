import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
    embedding_near_pairs, exact_dedup, minhash_lsh_pairs, minhash_signatures,
    ngram_jaccard_pairs, simhash, simhash_near_pairs)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),          # near dup of 0
        (3, "completely different content about spark query engines and indexes"),
        (4, BASE + " extra trailing words appended here"),  # near dup of 0
        (5, "another unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    got = exact_dedup(dup_docs).toPandas()
    grp = got[got["n_copies"] > 1]
    assert len(grp) == 1 and grp.iloc[0]["keep_id"] == 0 and grp.iloc[0]["n_copies"] == 2
    assert got["n_copies"].sum() == 6


def test_minhash_estimates_jaccard(spark, dup_docs):
    pairs = minhash_lsh_pairs(dup_docs, num_perm=128, bands=32,
                              jaccard_threshold=0.3).toPandas()
    found = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in found            # exact dup -> jaccard 1.0
    est = pairs.set_index(["id_a", "id_b"])["est_jaccard"]
    assert est[(0, 1)] == 1.0
    # near dups found with plausible estimates
    assert (0, 2) in found or (0, 4) in found
    # unrelated docs not paired
    assert not any(3 in p or 5 in p for p in found)


def test_minhash_signature_deterministic(spark, dup_docs):
    a = minhash_signatures(dup_docs).orderBy("doc_id").toPandas()
    b = minhash_signatures(dup_docs.repartition(3)).orderBy("doc_id").toPandas()
    assert a["sig"].map(list).tolist() == b["sig"].map(list).tolist()


def test_simhash_near_pairs(spark, dup_docs):
    sh = {r["doc_id"]: r["simhash64"] for r in simhash(dup_docs).collect()}
    assert sh[0] == sh[1]
    pairs = simhash_near_pairs(dup_docs, max_hamming=10).toPandas()
    found = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    assert (0, 1) in found
    ham = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert ham[(0, 1)] == 0


def test_ngram_jaccard_exact(spark, dup_docs):
    pairs = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.2).toPandas()
    jac = pairs.set_index(["id_a", "id_b"])["jaccard"]
    assert jac[(0, 1)] == 1.0
    # hand-check (0,2): 14 tokens -> 12 distinct 3-shingles each; one word
    # changed at position 7 affects shingles starting at idx 5,6,7 -> 3
    # differing shingles each side: inter=9, union=15 -> 0.6
    assert jac[(0, 2)] == pytest.approx(9 / 15)


def test_embedding_near_pairs_and_recall(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
    # 20..24: tiny perturbations of 0..4 (cos ~ 1)
    for j in range(5):
        rows.append((20 + j, (base[j] + 0.01 * rng.standard_normal(16)
                              .astype(np.float32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_pairs(df, threshold=0.95, n_planes=8,
                                 bands=2).toPandas()
    found = {tuple(x) for x in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # banded LSH keeps near-identical vectors in one bucket w.h.p.
    assert sum((j, 20 + j) in found for j in range(5)) >= 4
    assert (pairs["cosine"] >= 0.95).all()
    # quantized variant: same near-dups found, exact integer bucket signs
    qpairs = embedding_near_pairs(df, threshold=0.95, n_planes=8, bands=2,
                                  quantize=1000).toPandas()
    qfound = {tuple(x) for x in qpairs[["id_a", "id_b"]].itertuples(index=False)}
    assert sum((j, 20 + j) in qfound for j in range(5)) >= 4
