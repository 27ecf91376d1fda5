import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.dedup import (
    ConflictError, dedup_metrics, no_change, reject_conflicts,
    retain_most_recent, sort_updates)
from solr_mapreduce_indexer_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA, synth_transcripts_pandas)


@pytest.fixture(scope="module")
def conflicts_df(spark):
    pdf = synth_transcripts_pandas(n_convs=40, turns_per_conv=5,
                                   vocab_size=500, conflict_frac=0.1)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA), pdf


def test_retain_most_recent_keeps_max_ts(spark, conflicts_df):
    df, pdf = conflicts_df
    got = retain_most_recent(df).toPandas()
    # one row per key
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
    assert len(got) == pdf.groupby(["conv_id", "turn_idx"]).ngroups
    # survivor has the max ts of its key (reference:
    # dedup/RetainMostRecentUpdateConflictResolver.java:71-112)
    max_ts = pdf.groupby(["conv_id", "turn_idx"])["ts"].max().reset_index()
    merged = got.merge(max_ts, on=["conv_id", "turn_idx"], suffixes=("", "_max"))
    assert (merged["ts"] == merged["ts_max"]).all()


def test_retain_most_recent_deterministic_on_ts_ties(spark, conflicts_df):
    df, _ = conflicts_df
    a = retain_most_recent(df).orderBy("conv_id", "turn_idx").toPandas()
    b = retain_most_recent(df.repartition(7)).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_sort_updates_keeps_all_ordered(spark, conflicts_df):
    df, pdf = conflicts_df
    got = sort_updates(df)
    assert got.count() == len(pdf)
    # within each spark partition, rows of a key are adjacent & ts-ascending
    def check(it):
        import pandas as pd_
        for p in it:
            for _, g in p.groupby(["conv_id", "turn_idx"]):
                ok = g["ts"].is_monotonic_increasing
                yield pd_.DataFrame({"ok": [bool(ok)]})
    res = got.mapInPandas(check, schema="ok boolean").toPandas()
    assert res["ok"].all()


def test_reject_conflicts_raises(spark, conflicts_df):
    # the check is lazy (an assert inside the plan, not a hidden eager job):
    # constructing the plan succeeds, executing it fails on a duplicate key
    df, _ = conflicts_df
    plan = reject_conflicts(df)
    with pytest.raises(Exception, match="duplicate unique key"):
        plan.count()
    clean = retain_most_recent(df)
    assert reject_conflicts(clean).count() == clean.count()


def test_no_change_passthrough(spark, conflicts_df):
    df, pdf = conflicts_df
    assert no_change(df).count() == len(pdf)


def test_dedup_metrics_counters(spark, conflicts_df):
    df, pdf = conflicts_df
    m = dedup_metrics(df).collect()[0]
    n_keys = pdf.groupby(["conv_id", "turn_idx"]).ngroups
    assert m["n_docs"] == len(pdf)
    assert m["n_keys"] == n_keys
    assert m["n_duplicates"] == len(pdf) - n_keys
