"""Index build pipeline: transcripts → posting-block segments + manifest.

Spark-first restatement of the reference's five-phase MR pipeline
(MapReduceIndexerTool five phases, MapReduceIndexerToolArgumentParser.java:66-102):

  randomize  → subsumed by hash routing (uniform by construction)
  mapper     → tokenize via built-in regexp_extract_all (JVM-side, codegen)
  reducer    → per-micro-shard doc-id assignment + posting aggregation
               (groupBy, map-side partial agg; salted by doc-id range chunk so
               a hot term never materializes one giant group)
  mtree merge→ index/merge.py (block concat, addIndexes analog)
  go-live    → manifest commit (atomic JSON rename)

Doc IDs are two-level exactly like Lucene's per-segment docBase:
  doc_id = (micro_shard << doc_bits) | local_idx
with local_idx = row_number() ordered by (conv_id, turn_idx) within the
micro-shard. This avoids the global-sort shuffle a flat row_number() would
need at 10^12 rows: ordering is only established within each micro-shard (one
window per shard = one reducer's work in the reference), and doc_id order
remains globally consistent with (micro_shard, conv_id, turn_idx).
"""

from __future__ import annotations

import os
from dataclasses import asdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analysis import tokenize_col
from ..functions.routing import routing_pandas_udf
from ..operators.dedup import RESOLVERS
from . import manifest as mf
from .codec import encode_blocks

POSTINGS_SCHEMA = ("shard_id int, term string, first_doc long, last_doc long, "
                   "n int, max_tf int, sum_tf long, min_dl int, "
                   "max_tfnorm double, "
                   "doc_bytes binary, tf_bytes binary, len_bytes binary")
POSTINGS_COLS = [f.split()[0] for f in POSTINGS_SCHEMA.split(", ")]


def prepare_docs(df: DataFrame, cfg: IndexConfig, partitions: int) -> DataFrame:
    """dedup → route → assign two-level doc ids → tokenize.

    Output: shard_id, doc_id, conv_id, turn_idx, role, ts, doc_len,
    text_hash, tokens.
    """
    resolver = RESOLVERS[cfg.conflict_resolver]
    deduped = resolver(df, order_by=cfg.order_by_field) \
        if cfg.conflict_resolver != "no_change" else df

    route = routing_pandas_udf(cfg.shards, partitions)
    keyed = (deduped
             .withColumn("doc_key", F.concat_ws("#", F.col("conv_id"),
                                                F.col("turn_idx").cast("string")))
             .withColumn("shard_id", route(F.col("doc_key")))
             .withColumn("tokens", tokenize_col("text", cfg)))

    w = Window.partitionBy("shard_id").orderBy("conv_id", "turn_idx")
    return (keyed
            .withColumn("doc_id",
                        F.col("shard_id").cast("long") * F.lit(1 << cfg.doc_bits)
                        + F.row_number().over(w).cast("long") - 1)
            .withColumn("doc_len", F.size("tokens"))
            .withColumn("text_hash", F.xxhash64("text"))
            .select("shard_id", "doc_id", "conv_id", "turn_idx", "role", "ts",
                    "doc_len", "text_hash", "tokens"))


def term_doc_tf(docs: DataFrame) -> DataFrame:
    """Exploded (shard_id, doc_id, doc_len, term, tf) table — the relational
    core of the index build (reference analog: what the EmbeddedSolrServer's
    Lucene writer derives internally per reducer, SolrRecordWriter.java:258-284)."""
    return (docs
            .select("shard_id", "doc_id", "doc_len",
                    F.explode("tokens").alias("term"))
            .groupBy("shard_id", "doc_id", "doc_len", "term")
            .agg(F.count(F.lit(1)).cast("int").alias("tf")))


def _encode_mapper(cfg: IndexConfig, avgdl: float):
    """mapInPandas kernel: (shard, term, chunk, docs[], tfs[], dls[]) rows →
    posting-block rows. Vectorized inside each group via codec.encode_blocks."""
    block_size, k1, b = cfg.block_size, cfg.k1, cfg.b

    def encode_iter(batches):
        for pdf in batches:
            out: list[tuple] = []
            for shard, term, docs, tfs, dls in zip(
                    pdf["shard_id"].to_numpy(), pdf["term"].to_numpy(),
                    pdf["docs"].to_numpy(), pdf["tfs"].to_numpy(),
                    pdf["dls"].to_numpy()):
                docs = np.asarray(docs, dtype=np.int64)
                tfs = np.asarray(tfs, dtype=np.int64)
                dls = np.asarray(dls, dtype=np.int64)
                for blk in encode_blocks(docs, tfs, dls, avgdl,
                                         block_size=block_size, k1=k1, b=b):
                    out.append((int(shard), term, blk["first_doc"],
                                blk["last_doc"], blk["n"], blk["max_tf"],
                                blk["sum_tf"], blk["min_dl"],
                                blk["max_tfnorm"], blk["doc_bytes"],
                                blk["tf_bytes"], blk["len_bytes"]))
            yield pd.DataFrame(out, columns=POSTINGS_COLS)

    return encode_iter


def build_postings(tf: DataFrame, cfg: IndexConfig, avgdl: float,
                   partitions: int) -> DataFrame:
    """tf table → compressed posting-block rows (one row per block).

    Skew safety: grouping key is (shard, term, chunk) where
    chunk = local_doc_id >> chunk_bits — a *range*-based salt, so each group
    is bounded by 2^chunk_bits docs and the encoded sub-blocks of consecutive
    chunks concatenate into a globally doc-id-sorted posting list without
    re-encoding (each block stores its absolute first_doc)."""
    local_mask = (1 << cfg.doc_bits) - 1
    chunked = tf.withColumn(
        "chunk", F.shiftright(F.col("doc_id").bitwiseAND(F.lit(local_mask)),
                              cfg.chunk_bits))
    grouped = (chunked
               .groupBy("shard_id", "term", "chunk")
               .agg(F.sort_array(F.collect_list(
                   F.struct("doc_id", "tf", "doc_len"))).alias("p"))
               .select("shard_id", "term", "chunk",
                       F.col("p.doc_id").alias("docs"),
                       F.col("p.tf").alias("tfs"),
                       F.col("p.doc_len").alias("dls")))
    return (grouped
            .repartition(partitions, "shard_id")
            .mapInPandas(_encode_mapper(cfg, avgdl), schema=POSTINGS_SCHEMA))


def segment_metrics(spark: SparkSession, segments_path: str) -> list[dict]:
    """Per-shard lineage/metrics rows for the manifest (north rule: per-
    partition lineage + posting/byte metrics; reference counters analog
    SolrCounters.java:23-39)."""
    seg = spark.read.parquet(segments_path)
    rows = (seg.groupBy("shard_id")
            .agg(F.countDistinct("term").alias("n_terms"),
                 F.count(F.lit(1)).alias("n_blocks"),
                 F.sum("n").alias("n_postings"),
                 (F.sum(F.length("doc_bytes")) + F.sum(F.length("tf_bytes"))
                  + F.sum(F.length("len_bytes"))).alias("payload_bytes"))
            .orderBy("shard_id").collect())
    return [r.asDict() for r in rows]


def build_index(spark: SparkSession, df: DataFrame, cfg: IndexConfig,
                index_dir: str, input_path: str = "<dataframe>",
                resume: bool = True) -> dict:
    """Full build: docs → docmap+stats → postings level 0 → tree merge →
    manifest. Checkpoint-resumable at phase/level granularity."""
    from ..session import ensure_shipped
    from .merge import merge_to_target  # local import to avoid cycle

    ensure_shipped(spark)
    os.makedirs(index_dir, exist_ok=True)
    partitions, fanout, n_iters = cfg.plan_build_partitions()

    docmap_path = os.path.join(index_dir, "docmap")
    term_stats_path = os.path.join(index_dir, "term_stats")
    level0_path = os.path.join(index_dir, "segments", "level_0")

    docs = None
    tf_cached = None

    def get_docs() -> DataFrame:
        nonlocal docs
        if docs is None:
            docs = prepare_docs(df, cfg, partitions).persist()
        return docs

    def get_tf() -> DataFrame:
        # One explode + partial agg feeds BOTH term_stats and level-0
        # postings; at 10^12 turns re-deriving it would double the most
        # expensive shuffle in the pipeline.
        nonlocal tf_cached
        if tf_cached is None:
            tf_cached = term_doc_tf(get_docs()).persist()
        return tf_cached

    # --- phase: docmap + corpus stats ---------------------------------------
    import time
    ck = mf.read_checkpoint(index_dir, "docmap") if resume else None
    if ck is None:
        t0 = time.time()
        d = get_docs()
        (d.drop("tokens")
          .repartition(partitions, "shard_id")
          .write.mode("overwrite").partitionBy("shard_id").parquet(docmap_path))
        agg = d.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.avg("doc_len").alias("avgdl"),
                    F.sum("doc_len").alias("total_tokens")).collect()[0]
        stats = {"n_docs": int(agg["n_docs"]),
                 "avgdl": float(agg["avgdl"]),
                 "total_tokens": int(agg["total_tokens"])}
        mf.write_checkpoint(index_dir, "docmap",
                            {"path": docmap_path, "stats": stats,
                             "partitions": partitions,
                             "wall_s": round(time.time() - t0, 2)})
        ck = mf.read_checkpoint(index_dir, "docmap")
    stats = ck["stats"]

    # --- phase: level-0 posting segments ------------------------------------
    if not (resume and mf.read_checkpoint(index_dir, "level_0")):
        t0 = time.time()
        postings = build_postings(get_tf(), cfg, stats["avgdl"], partitions)
        (postings.sortWithinPartitions("term", "first_doc")
                 .write.mode("overwrite").partitionBy("shard_id")
                 .parquet(level0_path))
        mf.write_checkpoint(index_dir, "level_0", {
            "path": level0_path, "n_shards": partitions,
            "wall_s": round(time.time() - t0, 2),
            "segments": segment_metrics(spark, level0_path),
            "lineage": {"input": input_path,
                        "resolver": cfg.conflict_resolver,
                        "routing": f"murmur3_x86_32 % (S={cfg.shards}, R={partitions})"},
        })
    if tf_cached is not None:
        tf_cached.unpersist()
    if docs is not None:
        docs.unpersist()

    # --- phase: term stats (global df/cf for BM25 idf) ----------------------
    # Derived from level-0 block METADATA (term, n, sum_tf): parquet column
    # pruning means this never touches posting payload bytes — much cheaper
    # than re-exploding tokens for a second full shuffle.
    if not (resume and mf.read_checkpoint(index_dir, "term_stats")):
        t0 = time.time()
        ts = (spark.read.parquet(level0_path)
              .groupBy("term")
              .agg(F.sum("n").cast("long").alias("df"),
                   F.sum("sum_tf").cast("long").alias("cf")))
        n_part = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")) // 4)
        (ts.repartitionByRange(n_part, "term").sortWithinPartitions("term")
           .write.mode("overwrite").parquet(term_stats_path))
        n_terms = spark.read.parquet(term_stats_path).count()
        mf.write_checkpoint(index_dir, "term_stats",
                            {"path": term_stats_path, "n_terms": n_terms,
                             "wall_s": round(time.time() - t0, 2)})
    stats["n_terms"] = mf.read_checkpoint(index_dir, "term_stats")["n_terms"]

    # --- phase: tree merge to target shard count ----------------------------
    levels = [mf.read_checkpoint(index_dir, "level_0")
              | {"level": 0, "fanout": fanout}]
    levels += merge_to_target(spark, index_dir, cfg, partitions, fanout,
                              n_iters, resume=resume)

    return mf.write_manifest(index_dir, cfg, stats, levels, input_path)
