"""Round-6 optimization profiling harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen. This file isolates each bench.py
section with noop sinks / per-phase timers so optimization work is guided by
where the time actually goes, at the same scale and session config as
bench.py. Usage:

  python bench_extra.py [section ...] [--reps N]

Sections: build, minhash, bm25, dedup, cosine, quality, all (default all).
Prints one JSON line per section with the sub-step breakdown.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_queries, parse_sf  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    return time.time() - t0, out


def profile_build(spark, tr, src_path, work_dir, reps=2):
    """index_build with per-phase wall times from the checkpoints."""
    from solr_mapreduce_indexer_spark.config import IndexConfig
    from solr_mapreduce_indexer_spark.index import manifest as mf
    from solr_mapreduce_indexer_spark.index.build import build_index

    cfg = IndexConfig(shards=4, reducers=32, fanout=8)
    out = {"reps": []}
    for r in range(reps):
        idx_dir = os.path.join(work_dir, f"idx_prof_{r}")
        spark.sparkContext.setJobDescription(f"build rep{r}")
        t0 = time.time()
        build_index(spark, tr, cfg, idx_dir, input_path=src_path,
                    resume=False)
        total = time.time() - t0
        phases = {}
        for ph in ("docmap", "level_0", "term_stats", "level_1"):
            ck = mf.read_checkpoint(idx_dir, ph)
            if ck:
                phases[ph] = ck.get("wall_s")
        phases["total"] = round(total, 2)
        phases["unaccounted"] = round(
            total - sum(v for k, v in phases.items()
                        if k not in ("total", "unaccounted") and v), 2)
        out["reps"].append(phases)
    return out


def profile_minhash(spark, docs, reps=2):
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        _bucket_pair_candidates, minhash_lsh_pairs, minhash_signatures)
    out = {"reps": []}
    for r in range(reps):
        d = {}
        spark.sparkContext.setJobDescription(f"minhash sigs rep{r}")
        sigs = minhash_signatures(docs, num_perm=64)
        d["sigs_noop"], _ = timed(noop, sigs)
        spark.sparkContext.setJobDescription(f"minhash full rep{r}")
        t0 = time.time()
        n = minhash_lsh_pairs(docs, num_perm=64, bands=16,
                              jaccard_threshold=0.5).count()
        d["full_count"] = time.time() - t0
        d["n_pairs"] = n
        out["reps"].append({k: round(v, 3) if isinstance(v, float) else v
                            for k, v in d.items()})
    return out


def profile_bm25(spark, idx_dir, reps=3):
    from solr_mapreduce_indexer_spark.query.bm25 import load_index, run_queries
    h = load_index(idx_dir)
    queries = make_queries(64)
    out = {"reps": []}
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"bm25 batch rep{r}")
        t0 = time.time()
        n = run_queries(spark, h, queries).count()
        out["reps"].append({"batch": round(time.time() - t0, 3), "rows": n})
    return out


def profile_small(spark, sf_dir, reps=3):
    from pyspark.sql import functions as F

    from solr_mapreduce_indexer_spark.functions.textops import quality_features
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import exact_dedup
    from solr_mapreduce_indexer_spark.operators.simsearch import cosine_topk
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {"reps": []}
    for r in range(reps):
        d = {}
        spark.sparkContext.setJobDescription(f"exact_dedup rep{r}")
        d["exact_dedup"], _ = timed(lambda: exact_dedup(docs).count())
        spark.sparkContext.setJobDescription(f"cosine rep{r}")
        t0 = time.time()
        qv = [float(x) for x in
              emb.where(F.col("vec_id") == 0).first()["embedding"]]
        d["cosine_first"] = time.time() - t0
        t0 = time.time()
        cosine_topk(emb, qv, k=10).count()
        d["cosine_topk"] = time.time() - t0
        spark.sparkContext.setJobDescription(f"quality rep{r}")
        d["quality"], _ = timed(
            lambda: quality_features(docs).agg(F.avg("quality")).collect())
        out["reps"].append({k: round(v, 3) for k, v in d.items()})
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1])
    sections = set(args) or {"all"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from solr_mapreduce_indexer_spark.session import get_spark
    spark = get_spark(app="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                                   "16g"))
    sf = parse_sf(sf_dir)
    work_dir = f"/tmp/smis_profile_{os.getpid()}"
    shutil.rmtree(work_dir, ignore_errors=True)
    results = {}

    need_corpus = sections & {"all", "build", "bm25"}
    tr = src_path = None
    if need_corpus:
        from pyspark.sql import functions as F

        from solr_mapreduce_indexer_spark.config import IndexConfig
        from solr_mapreduce_indexer_spark.index.build import build_index
        from solr_mapreduce_indexer_spark.query.bm25 import (load_index,
                                                             run_queries)
        from solr_mapreduce_indexer_spark.sources.transcripts import (
            TRANSCRIPT_SCHEMA, synth_transcripts_pandas)
        n_turns = max(10_000, int(1_000_000 * sf))
        pdf = synth_transcripts_pandas(n_convs=n_turns // 8, turns_per_conv=8,
                                       vocab_size=10_000, seed=42)
        src_path = os.path.join(work_dir, "transcripts")
        chunk = 131_072
        for i, start in enumerate(range(0, len(pdf), chunk)):
            spark.createDataFrame(pdf.iloc[start:start + chunk],
                                  schema=TRANSCRIPT_SCHEMA) \
                 .write.mode("overwrite" if i == 0 else "append") \
                 .parquet(src_path)
        del pdf
        tr = spark.read.parquet(src_path)
        tr.count()
        # warm-up identical to bench.py
        cfg = IndexConfig(shards=4, reducers=32, fanout=8)
        warm_dir = os.path.join(work_dir, "warm_idx")
        warm = tr.where(F.abs(F.xxhash64("conv_id")) % 10 == 0)
        build_index(spark, warm, cfg, warm_dir, input_path=src_path,
                    resume=False)
        run_queries(spark, load_index(warm_dir), make_queries(16)).count()

    if sections & {"all", "build"}:
        results["build"] = profile_build(spark, tr, src_path, work_dir, reps)
    if sections & {"all", "bm25"}:
        from solr_mapreduce_indexer_spark.config import IndexConfig
        from solr_mapreduce_indexer_spark.index.build import build_index
        idx_dir = os.path.join(work_dir, "idx_q")
        build_index(spark, tr, IndexConfig(shards=4, reducers=32, fanout=8),
                    idx_dir, input_path=src_path, resume=False)
        results["bm25"] = profile_bm25(spark, idx_dir, max(reps, 3))
    if sections & {"all", "minhash"}:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        results["minhash"] = profile_minhash(spark, docs, reps)
    if sections & {"all", "small"}:
        results["small"] = profile_small(spark, sf_dir, max(reps, 3))

    shutil.rmtree(work_dir, ignore_errors=True)
    print(json.dumps({"sf": sf, "cpus": cpus, "results": results}))


if __name__ == "__main__":
    main()
