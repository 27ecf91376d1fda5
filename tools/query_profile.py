"""Decompose a BM25 batch's wall time into its sub-phases.

The 16M scaling runs show the 256-query batch fitting f + w/N with a large
f that GROWS with corpus size (~9s at 4M docs, ~44s at 16M) even after the
map-back point-fetch removed the corpus-proportional docmap scan. This tool
times each driver-visible phase of run_queries separately on an existing
index so the residual fixed cost can be attributed before optimizing:

  1. term_stats lookup (df collect for the batch's distinct terms)
  2. the kernel job: postings scan (term IN pushdown) -> shuffle to shards
     -> applyInPandas scoring -> window top-k -> collect
  3. docmap point-fetch (pyarrow)
  4. result assembly (pandas merge + createDataFrame)

Usage:
    python tools/query_profile.py --index /tmp/.../idx --cpus 8 [--n 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.makedirs("/dev/shm/smis_localdir", exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/smis_localdir"

    from pyspark.sql import functions as F  # noqa: E402

    from bench import make_queries  # noqa: E402
    from solr_mapreduce_indexer_spark.query import bm25  # noqa: E402
    from solr_mapreduce_indexer_spark.session import get_spark  # noqa: E402

    spark = get_spark(app="qprofile", master=f"local[{args.cpus}]",
                      shuffle_partitions=64, driver_memory="16g")
    h = bm25.load_index(args.index)
    qs = make_queries(args.n)

    # Warm up: JIT + python worker pool + page cache (steady state is the
    # number that matters; see BENCH.md sandbox caveats).
    bm25.run_queries(spark, h, qs).count()

    phases: dict[str, list[float]] = {}

    def rec(name: str, t0: float) -> float:
        t1 = time.time()
        phases.setdefault(name, []).append(t1 - t0)
        return t1

    for _ in range(args.reps):
        t = time.time()
        all_terms = sorted({x.lower() for q in qs for x in q["terms"]})
        dfs = bm25._lookup_dfs(spark, h, all_terms)
        t = rec("term_stats_lookup", t)

        idfs = {x: bm25.idf(h.n_docs, dfs.get(x, 0)) for x in all_terms}
        norm = [{"query_id": int(q["query_id"]),
                 "terms": sorted({x.lower() for x in q["terms"]}),
                 "mode": q.get("mode", "AND"), "k": int(q.get("k", 10))}
                for q in qs]
        present = [x for x in all_terms if x in dfs]
        blocks = (spark.read.parquet(h.postings_path)
                  .where(F.col("term").isin(present)))
        t = rec("plan_and_read_footers", t)

        cand = blocks.groupBy("shard_id").applyInPandas(
            bm25._score_shard_kernel(norm, idfs, h.avgdl, h.cfg.k1, h.cfg.b,
                                     tombstones_path=h.tombstones_path,
                                     doc_bits=h.cfg.doc_bits),
            schema="query_id long, doc_id long, score double")
        from pyspark.sql import Window
        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.asc("doc_id"))
        kmap = F.create_map(*[F.lit(x) for q in norm
                              for x in (q["query_id"], q["k"])])
        topk = (cand.withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= kmap[F.col("query_id")]))
        rows = topk.collect()
        t = rec("kernel_job_and_collect", t)

        ids = sorted({int(r["doc_id"]) for r in rows})
        hit_shards = sorted({i >> h.cfg.doc_bits for i in ids})
        import pyarrow.dataset as pads

        from solr_mapreduce_indexer_spark.fsutil import local_path
        (pads.dataset(local_path(h.docmap_path), format="parquet",
                      partitioning="hive")
         .to_table(columns=["doc_id", "conv_id", "turn_idx"],
                   filter=(pads.field("shard_id").isin(hit_shards)
                           & pads.field("doc_id").isin(ids))))
        rec("docmap_point_fetch", t)

        t = time.time()
        bm25.DIRECT_FETCH = False
        bm25.run_queries(spark, h, qs).count()
        t = rec("end_to_end_legacy", t)
        bm25.DIRECT_FETCH = True
        bm25.run_queries(spark, h, qs).count()
        rec("end_to_end_direct", t)

    out = {k: [round(x, 2) for x in v] for k, v in phases.items()}
    out["min"] = {k: round(min(v), 2) for k, v in phases.items()}
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()
