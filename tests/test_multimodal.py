import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.multimodal import (
    extract_features, fake_decode, frame_sample_plan, synth_assets)


@pytest.fixture(scope="module")
def assets(spark):
    return synth_assets(spark, n=30)


def test_extract_features_plumbing(spark, assets):
    got = extract_features(assets).toPandas()
    assert len(got) == 30
    assert got["decode_ok"].all()
    assert got["feature"].map(len).eq(8).all()
    # deterministic: same payload -> same feature regardless of partitioning
    again = extract_features(assets.repartition(5)).toPandas()
    a = got.sort_values("asset_id")["feature"].map(tuple).tolist()
    b = again.sort_values("asset_id")["feature"].map(tuple).tolist()
    assert a == b


def test_decode_failure_isolated(spark):
    rows = [(0, "image", "x", b"\x01\x02\x03\x04\x05\x06\x07\x08", None),
            (1, "image", "x", None, None)]
    from solr_mapreduce_indexer_spark.operators.multimodal import ASSET_SCHEMA
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    got = extract_features(df).orderBy("asset_id").toPandas()
    assert got["decode_ok"].tolist() == [True, False]
    assert got["feature"].iloc[1] is None


def test_frame_sample_plan(spark, assets):
    plan = frame_sample_plan(assets, every_ms=1000).toPandas()
    n_videos = assets.where(F.col("modality") == "video").count()
    assert set(plan["asset_id"].unique()) == \
        set(range(2, 30, 3))  # every third asset is video
    assert len(plan) == n_videos * 5  # 5000ms / 1000ms
    assert (plan["frame_ts_ms"] == plan["frame_idx"] * 1000).all()
