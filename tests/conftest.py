from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_mapreduce_indexer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="engine-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from solr_mapreduce_indexer_spark.sources.transcripts import synth_transcripts_pandas
    return synth_transcripts_pandas(n_convs=120, turns_per_conv=8, vocab_size=2000)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from solr_mapreduce_indexer_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    return spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
