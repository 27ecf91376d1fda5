"""Benchmark harness (driver contract): runs the headline operations at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "turns_per_sec": ..., "bm25_qps": ...}

Headline ops: full inverted-index build (dedup -> route -> tokenize ->
posting blocks -> tree merge) over a deterministic synthetic transcript
corpus sized by sf (BASELINE.json metric is turns indexed/sec), a 64-query
BM25 batch (queries/sec), and the training-data operators over the
driver-provided documents/embeddings tables.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else 0.1


def make_queries(n: int = 64, seed: int = 7) -> list[dict]:
    """Deterministic query mix: Zipf-head terms (stress block volume),
    mid/tail terms, planted needles, and absent terms; AND + OR."""
    import numpy as np
    from solr_mapreduce_indexer_spark.sources.transcripts import NEEDLES
    rng = np.random.default_rng(seed)
    qs = []
    for i in range(n):
        kind = i % 4
        if kind == 0:      # hot AND
            terms = [f"tok{int(rng.integers(0, 20)):05d}",
                     f"tok{int(rng.integers(0, 20)):05d}"]
            mode = "AND"
        elif kind == 1:    # mid OR
            terms = [f"tok{int(rng.integers(20, 500)):05d}",
                     f"tok{int(rng.integers(20, 500)):05d}",
                     f"tok{int(rng.integers(500, 2000)):05d}"]
            mode = "OR"
        elif kind == 2:    # needle AND (selective)
            terms = [NEEDLES[i % len(NEEDLES)], f"tok{int(rng.integers(0, 50)):05d}"]
            mode = "AND"
        else:              # tail + absent OR
            terms = [f"tok{int(rng.integers(2000, 9999)):05d}", "absentterm"]
            mode = "OR"
        qs.append({"query_id": i, "terms": terms, "mode": mode, "k": 10})
    return qs


def bench_run(spark, sf_dir: str, n_turns: int | None = None,
              work_dir: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from solr_mapreduce_indexer_spark.config import IndexConfig
    from solr_mapreduce_indexer_spark.index.build import build_index
    from solr_mapreduce_indexer_spark.operators.dedupe_ops import (
        exact_dedup, minhash_lsh_pairs)
    from solr_mapreduce_indexer_spark.operators.simsearch import cosine_topk
    from solr_mapreduce_indexer_spark.functions.textops import quality_features
    from solr_mapreduce_indexer_spark.query.bm25 import load_index, run_queries
    from solr_mapreduce_indexer_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA, synth_transcripts_pandas)

    sf = parse_sf(sf_dir)
    if n_turns is None:
        n_turns = max(10_000, int(1_000_000 * sf))
    turns_per_conv = 8
    n_convs = n_turns // turns_per_conv
    work_dir = work_dir or f"/tmp/smis_bench_{os.getpid()}"
    shutil.rmtree(work_dir, ignore_errors=True)

    timings: dict[str, float] = {}

    # --- corpus synthesis (not timed as a query; deterministic, seeded) ----
    # Chunk the pandas->Spark transfer: one giant createDataFrame of the full
    # sf corpus was the round-1 driver-OOM signature (1g default heap died in
    # Arrow conversion). 128k-row chunks keep peak driver memory flat at any sf.
    pdf = synth_transcripts_pandas(n_convs=n_convs, turns_per_conv=turns_per_conv,
                                   vocab_size=10_000, seed=42)
    src_path = os.path.join(work_dir, "transcripts")
    chunk = 131_072
    for i, start in enumerate(range(0, len(pdf), chunk)):
        spark.createDataFrame(pdf.iloc[start:start + chunk],
                              schema=TRANSCRIPT_SCHEMA) \
             .write.mode("overwrite" if i == 0 else "append").parquet(src_path)
    del pdf
    tr = spark.read.parquet(src_path)
    n_rows = tr.count()

    # --- warm-up (untimed): JIT, heap first-touch, python worker pool -------
    # This sandbox's cold JVM shows minutes-scale nondeterministic warm-up
    # (see BENCH.md); steady-state throughput is the metric. One small build
    # + query batch exercises every code path before the clocks start.
    # 32 micro-shards: one build task per core at local[32]; fanout 8 keeps
    # the merge tree at a single level (32 -> 4)
    cfg = IndexConfig(shards=4, reducers=32, fanout=8)
    warm_dir = os.path.join(work_dir, "warm_idx")
    warm = tr.where(F.abs(F.xxhash64("conv_id")) % 10 == 0)
    build_index(spark, warm, cfg, warm_dir, input_path=src_path, resume=False)
    run_queries(spark, load_index(warm_dir), make_queries(16)).count()

    # --- index build (turns indexed / sec) ---------------------------------
    idx_dir = os.path.join(work_dir, "idx")
    t0 = time.time()
    build_index(spark, tr, cfg, idx_dir, input_path=src_path, resume=False)
    timings["index_build"] = time.time() - t0

    # --- BM25 query batch (queries / sec) ----------------------------------
    h = load_index(idx_dir)
    queries = make_queries(64)
    t0 = time.time()
    n_res = run_queries(spark, h, queries).count()
    timings["bm25_batch64"] = time.time() - t0

    # --- training-data operators over driver tables ------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    t0 = time.time()
    exact_dedup(docs).count()
    timings["exact_dedup"] = time.time() - t0

    t0 = time.time()
    minhash_lsh_pairs(docs, num_perm=64, bands=16, jaccard_threshold=0.5).count()
    timings["minhash_pairs"] = time.time() - t0

    t0 = time.time()
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    cosine_topk(emb, qv, k=10).count()
    timings["cosine_topk"] = time.time() - t0

    t0 = time.time()
    quality_features(docs).agg(F.avg("quality")).collect()
    timings["quality_scan"] = time.time() - t0

    shutil.rmtree(work_dir, ignore_errors=True)
    total = sum(timings.values())
    return {
        "metric": "index_build+bm25+pipeline ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_turns": n_rows,
        "turns_per_sec": round(n_rows / timings["index_build"], 1),
        "bm25_qps": round(len(queries) / timings["bm25_batch64"], 1),
        "bm25_result_rows": n_res,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from solr_mapreduce_indexer_spark.session import get_spark
    # driver_memory is mandatory here: local-mode driver defaults to 1g on
    # this box and the sf0.1 build kills the JVM (round-1 bench rc=1); the
    # factory also pre-sizes -Xms to avoid first-touch heap noise.
    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16),
                      driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    try:
        out = bench_run(spark, sf_dir)
    except BaseException as e:  # noqa: BLE001 — always emit a parseable line
        out = {"metric": "index_build+bm25+pipeline ops wall time",
               "value": -1.0, "unit": "sec", "queries": {},
               "sf": parse_sf(sf_dir), "error": f"{type(e).__name__}: {e}"[:500]}
        print(json.dumps(out))
        raise
    print(json.dumps(out))


if __name__ == "__main__":
    main()
