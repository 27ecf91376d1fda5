import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.functions.textops import (
    fingerprint, lang_id, quality_features, token_counts, winnow_fingerprint)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_quality_features_against_duckdb(spark, docs):
    got = quality_features(docs).orderBy("doc_id").toPandas()
    want = duckdb.sql(f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                          text FROM '{DOCS}')
        SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars,
               CASE WHEN len(toks) > 0 THEN
                 list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
               ELSE 0 END AS avg_token_len,
               CASE WHEN len(toks) > 0 THEN
                 len(list_filter(toks, x -> x IN ('the','of','and','to','in','a','is','that','it','for')))::DOUBLE / len(toks)
               ELSE 0 END AS stopword_ratio
        FROM t ORDER BY doc_id
    """).df()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
    np.testing.assert_allclose(got["avg_token_len"], want["avg_token_len"], atol=1e-9)
    np.testing.assert_allclose(got["stopword_ratio"], want["stopword_ratio"], atol=1e-9)
    assert got["quality"].between(0, 1).all()


def test_lang_id_markers(spark):
    rows = [(0, "the cat is in the hat and it is fine"),
            (1, "el gato y la casa de que en un los"),
            (2, "le chat et les maisons de la une pour"),
            (3, "zzz qqq www")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "fr" and got[3] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "Hello, world! 42 foo-bar")],
                               "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 4
    assert r["n_word_tokens"] == 5  # hello world 42 foo bar
    # bpe-ish: Hello , world ! 4 2 foo - bar
    assert r["n_bpe_tokens"] == 9


def test_fingerprint_matches_duckdb_and_detects_dups(spark, docs):
    got = fingerprint(docs).orderBy("doc_id").toPandas()
    want = duckdb.sql(f"""
        SELECT doc_id, md5(array_to_string(
            regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
        FROM '{DOCS}' ORDER BY doc_id
    """).df()
    assert got["fingerprint_md5"].tolist() == want["fp"].tolist()


def test_winnow_fingerprint_shift_invariance(spark):
    # identical 5-token windows → overlapping winnow sets; min survives edits
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "ZZZ a b c d e f g h i j")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in winnow_fingerprint(df, w=5).collect()}
    # doc1 contains every 5-shingle of doc0 plus one more; min must be <=
    assert got[1]["winnow_min64"] <= got[0]["winnow_min64"]
    assert got[0]["n_tokens"] == 10 and got[1]["n_tokens"] == 11
