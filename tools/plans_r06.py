"""Capture .explain("formatted") plans for the round-6 optimization evidence.

Usage:  python tools/plans_r06.py <repo_root> <out_dir> <suffix>

Runs against whichever tree <repo_root> points at (the round-5 worktree for
"_before", the optimized tree for "_after"), so each plan file reflects that
tree's real code. The bm25 plans are captured from the ACTUAL executed
DataFrames by spying on DataFrame.collect/toPandas during run_queries —
not reconstructions.
"""

from __future__ import annotations

import inspect
import os
import shutil
import sys

REPO, OUT, SUFFIX = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, REPO)
os.makedirs(OUT, exist_ok=True)

from pyspark.sql import DataFrame  # noqa: E402

from solr_mapreduce_indexer_spark.session import get_spark  # noqa: E402

spark = get_spark(app=f"plans{SUFFIX}", master="local[8]",
                  shuffle_partitions=16, driver_memory="8g")


def explain_str(df: DataFrame) -> str:
    jvm = df._sc._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def dump(name: str, df: DataFrame) -> None:
    with open(os.path.join(OUT, f"{name}{SUFFIX}.txt"), "w") as f:
        f.write(explain_str(df))
    print("wrote", name + SUFFIX)


SF = "/root/testdata/sf0.01"
docs = spark.read.parquet(f"{SF}/documents.parquet")

# --- minhash_pairs (bench section) -----------------------------------------
from solr_mapreduce_indexer_spark.operators.dedupe_ops import (  # noqa: E402
    minhash_lsh_pairs)

dump("minhash_pairs",
     minhash_lsh_pairs(docs, num_perm=64, bands=16, jaccard_threshold=0.5))

# --- quality (bench section quality_scan) ----------------------------------
from pyspark.sql import functions as F  # noqa: E402

from solr_mapreduce_indexer_spark.functions.textops import (  # noqa: E402
    quality_features)

dump("quality_scan", quality_features(docs).agg(F.avg("quality")))

# --- index build: docmap write side + postings source ----------------------
from solr_mapreduce_indexer_spark.config import IndexConfig  # noqa: E402
from solr_mapreduce_indexer_spark.index.build import (  # noqa: E402
    build_index, build_postings, docmap_cols, prepare_docs)
from solr_mapreduce_indexer_spark.sources.transcripts import (  # noqa: E402
    transcripts_from_documents)

tr = transcripts_from_documents(spark, SF)
cfg = IndexConfig(shards=4, reducers=32, fanout=8)
prep = prepare_docs(tr, cfg, 32)
dump("index_docmap", docmap_cols(prep, cfg))
kw = {}
if "pre_partitioned" in inspect.signature(build_postings).parameters:
    kw["pre_partitioned"] = True
dump("index_postings", build_postings(prep, cfg, 42.0, 32, **kw))

# --- bm25 batch: spy on the executed candidate/top-k DataFrames ------------
from solr_mapreduce_indexer_spark.query.bm25 import (  # noqa: E402
    load_index, run_queries)

idx = f"/tmp/plans_r06_idx{SUFFIX}"
shutil.rmtree(idx, ignore_errors=True)
build_index(spark, tr, IndexConfig(shards=2, reducers=8, fanout=2), idx,
            input_path=SF)
h = load_index(idx)

try:  # Spark 4: the concrete class (whose methods instances resolve) is
    # pyspark.sql.classic.dataframe.DataFrame; the imported name is an ABC
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: F811
except ImportError:
    pass

captured: list[tuple[str, str]] = []
orig_collect, orig_topandas = DataFrame.collect, DataFrame.toPandas


def spy_collect(self):
    captured.append(("collect", explain_str(self)))
    return orig_collect(self)


def spy_topandas(self):
    captured.append(("toPandas", explain_str(self)))
    return orig_topandas(self)


DataFrame.collect = spy_collect
DataFrame.toPandas = spy_topandas
try:
    out = run_queries(spark, h, [
        {"query_id": 0, "terms": ["merge", "window"], "mode": "AND", "k": 10},
        {"query_id": 1, "terms": ["stream", "spark", "hash"], "mode": "OR",
         "k": 10}])
    final_plan = explain_str(out)
finally:
    DataFrame.collect, DataFrame.toPandas = orig_collect, orig_topandas

with open(os.path.join(OUT, f"bm25_batch{SUFFIX}.txt"), "w") as f:
    for i, (how, plan) in enumerate(captured):
        f.write(f"=== executed DataFrame #{i} (via {how}) during "
                f"run_queries ===\n{plan}\n")
    f.write(f"=== returned DataFrame ===\n{final_plan}\n")
print("wrote bm25_batch" + SUFFIX)
shutil.rmtree(idx, ignore_errors=True)
