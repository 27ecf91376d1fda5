"""1M-turn build+query A/B for a given tree (argv[1]=repo, argv[2]=label)."""
import os, sys, time, shutil, json
repo = sys.argv[1]; label = sys.argv[2]
sys.path.insert(0, repo)
from solr_mapreduce_indexer_spark.session import get_spark
spark = get_spark(app=f"ab_{label}", master="local[32]", shuffle_partitions=32, driver_memory="16g")
from pyspark.sql import functions as F
from solr_mapreduce_indexer_spark.config import IndexConfig
from solr_mapreduce_indexer_spark.index.build import build_index
from solr_mapreduce_indexer_spark.index import manifest as mf
from solr_mapreduce_indexer_spark.query.bm25 import load_index, run_queries
from solr_mapreduce_indexer_spark.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pandas
sys.path.insert(0, "/root/repo")  # bench.make_queries is tree-independent
from bench import make_queries

work = f"/tmp/ab_{label}"
shutil.rmtree(work, ignore_errors=True); os.makedirs(work)
src = os.path.join(work, "transcripts")
n_turns = 1_000_000
pdf = synth_transcripts_pandas(n_convs=n_turns//8, turns_per_conv=8, vocab_size=10_000, seed=42)
chunk = 131_072
for i, start in enumerate(range(0, len(pdf), chunk)):
    spark.createDataFrame(pdf.iloc[start:start+chunk], schema=TRANSCRIPT_SCHEMA) \
         .write.mode("overwrite" if i == 0 else "append").parquet(src)
del pdf
tr = spark.read.parquet(src); tr.count()
cfg = IndexConfig(shards=4, reducers=32, fanout=8)
# warm-up: 1/10 subset build + small batch
warm = tr.where(F.abs(F.xxhash64("conv_id")) % 10 == 0)
build_index(spark, warm, cfg, os.path.join(work, "warm"), resume=False)
run_queries(spark, load_index(os.path.join(work, "warm")), make_queries(16)).count()
out = {"label": label, "builds": [], "batches": []}
for rep in range(2):
    d = os.path.join(work, f"idx{rep}")
    t0 = time.time(); build_index(spark, tr, cfg, d, resume=False)
    wall = time.time() - t0
    phases = {ph: (mf.read_checkpoint(d, ph) or {}).get("wall_s")
              for ph in ("docmap","level_0","term_stats","level_1")}
    out["builds"].append({"wall": round(wall,2), **phases})
    h = load_index(d)
    for _ in range(2):
        t0 = time.time(); n = run_queries(spark, h, make_queries(64)).count()
        out["batches"].append(round(time.time()-t0, 2))
    out["rows"] = n
shutil.rmtree(work, ignore_errors=True)
print(json.dumps(out))
