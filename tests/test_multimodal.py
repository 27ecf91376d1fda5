import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_mapreduce_indexer_spark.operators.multimodal import (
    extract_features, fake_decode, frame_sample_plan, synth_assets)


@pytest.fixture(scope="module")
def assets(spark):
    return synth_assets(spark, n=30)


def test_extract_features_real_codecs(spark, assets):
    """PNG/WAV payloads decode for real (stdlib codecs); opaque video bytes
    surface decode_ok=False per row instead of failing the task."""
    got = extract_features(assets).toPandas().sort_values("asset_id")
    assert len(got) == 30
    by_mod = got.groupby("modality")["decode_ok"].all()
    assert by_mod["image"] and by_mod["audio"]
    assert not got[got.modality == "video"]["decode_ok"].any()
    assert got[got.modality == "image"]["feature"].map(len).eq(24).all()
    assert got[got.modality == "audio"]["feature"].map(len).eq(11).all()
    # deterministic: same payload -> same feature regardless of partitioning
    again = extract_features(assets.repartition(5)).toPandas()
    a = got.sort_values("asset_id")["feature"].map(
        lambda v: None if v is None else tuple(v)).tolist()
    b = again.sort_values("asset_id")["feature"].map(
        lambda v: None if v is None else tuple(v)).tolist()
    assert a == b


def test_decode_failure_isolated(spark):
    rows = [(0, "image", "x", b"\x01\x02\x03\x04\x05\x06\x07\x08", None),
            (1, "image", "x", None, None)]
    from solr_mapreduce_indexer_spark.operators.multimodal import ASSET_SCHEMA
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    got = extract_features(df, decoder=fake_decode).orderBy("asset_id").toPandas()
    assert got["decode_ok"].tolist() == [True, False]
    assert got["feature"].iloc[1] is None


def test_frame_sample_plan(spark, assets):
    plan = frame_sample_plan(assets, every_ms=1000).toPandas()
    n_videos = assets.where(F.col("modality") == "video").count()
    assert set(plan["asset_id"].unique()) == \
        set(range(2, 30, 3))  # every third asset is video
    assert len(plan) == n_videos * 5  # 5000ms / 1000ms
    assert (plan["frame_ts_ms"] == plan["frame_idx"] * 1000).all()
