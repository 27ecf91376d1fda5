"""mtree merge: fanout-F tree reduction of micro-shard segments.

Spark restatement of the reference's mapper-only merge jobs
(IndexMergeTool.java:104-171, iteration count `:96-101`): each iteration maps
micro-shard F-groups to one merged shard. Because our doc ids embed the
micro-shard in the high bits and micro-shards of a root shard are contiguous
(micro = root*(R/S) + offset, SolrCloudPartitioner.java:133-136), merging is a
*metadata-level concat* exactly like Lucene IndexWriter.addIndexes
(TreeMergeOutputFormat.java:141-158): posting blocks from sibling micro-shards
have disjoint, ordered doc-id ranges, so the merged posting list is just the
union of block rows — no decode, no rewrite, no shuffle beyond the re-tag.

Physical compaction (the forceMerge(maxSegments) analog,
TreeMergeOutputFormat.java:170-183) optionally re-encodes each (shard, term)'s
blocks into full-size blocks at the final level.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from . import manifest as mf
from .codec import decode_block, encode_blocks


def level_path(index_dir: str, level: int) -> str:
    return os.path.join(index_dir, "segments", f"level_{level}")


def merge_level(spark: SparkSession, index_dir: str, level: int,
                fanout: int, n_shards_in: int,
                compression: str = "zstd") -> tuple[str, int]:
    """One tree-merge iteration: level → level+1, shard_id //= fanout."""
    src = spark.read.parquet(level_path(index_dir, level))
    n_out = -(-n_shards_in // fanout)
    dst_path = level_path(index_dir, level + 1)
    # Sub-split each output shard by term so write parallelism isn't capped
    # at the (shrinking) shard count: a shard dir holds several term-hashed
    # files, each internally sorted — readers sort blocks by first_doc anyway
    # and a term's blocks stay within one file.
    n_tasks = max(n_out, 2 * spark.sparkContext.defaultParallelism)
    (src.withColumn("shard_id",
                    (F.col("shard_id") / fanout).cast("int"))
        .repartition(n_tasks, "shard_id", "term")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite").option("compression", compression)
        .partitionBy("shard_id").parquet(dst_path))
    return dst_path, n_out


def _compact_mapper(cfg: IndexConfig, avgdl: float):
    """applyInPandas kernel: all blocks of one (shard, term) → re-encoded
    full-size blocks (decode + concat + encode). Exactness: tf/doc/len values
    round-trip the codec; max_tfnorm recomputed from the same avgdl."""
    def compact(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("first_doc")
        docs, tfs, lens = [], [], []
        for r in pdf.itertuples(index=False):
            d, t, ln = decode_block(r.doc_bytes, r.tf_bytes, r.len_bytes,
                                    r.first_doc)
            docs.append(d); tfs.append(t); lens.append(ln)
        d = np.concatenate(docs); t = np.concatenate(tfs); ln = np.concatenate(lens)
        shard = int(pdf["shard_id"].iloc[0]); term = pdf["term"].iloc[0]
        # explicit column order — a partitioned-parquet read reorders input
        # columns (partition col last), so pdf.columns must not be reused
        from .build import POSTINGS_COLS
        rows = [(shard, term, b["first_doc"], b["last_doc"], b["n"],
                 b["max_tf"], b["sum_tf"], b["min_dl"], b["max_tfnorm"],
                 b["doc_bytes"], b["tf_bytes"], b["len_bytes"])
                for b in encode_blocks(d, t, ln, avgdl, cfg.block_size,
                                       cfg.k1, cfg.b, cfg.posting_codec)]
        return pd.DataFrame(rows, columns=POSTINGS_COLS)

    return compact


def compact_level(spark: SparkSession, index_dir: str, level: int,
                  cfg: IndexConfig, avgdl: float, n_shards: int) -> str:
    """forceMerge(maxSegments) analog: rewrite a level so every (shard, term)
    posting list uses full blocks (fragmentation from chunked encoding / tree
    merge gone), leaving at most cfg.max_segments files per shard directory
    (reference --max-segments, default 1,
    MapReduceIndexerToolArgumentParser.java:269-283; BatchWriter.java:205-208).

    max_segments > 1 trades file count for write parallelism: each shard's
    rows are salted into max_segments groups by term hash (a term's blocks
    stay within one file), so a shard is written by up to max_segments tasks."""
    from .build import POSTINGS_SCHEMA
    src = spark.read.parquet(level_path(index_dir, level))
    dst = level_path(index_dir, level) + "_compact"
    m = max(1, int(cfg.max_segments))
    out = (src.groupBy("shard_id", "term")
           .applyInPandas(_compact_mapper(cfg, avgdl), schema=POSTINGS_SCHEMA))
    if m == 1:
        out = out.repartition(n_shards, "shard_id")
    else:
        out = out.repartition(n_shards * m, F.col("shard_id"),
                              F.pmod(F.xxhash64("term"), F.lit(m)))
    (out.sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite").option("compression", cfg.compression)
        .partitionBy("shard_id").parquet(dst))
    return dst


def rollup_metrics(segments: list[dict], fanout: int) -> list[dict]:
    """Derive a merged level's per-shard metrics from the previous level's.

    The tree merge is a metadata-level concat (shard_id //= fanout, block rows
    unchanged), so n_terms is the only non-additive field — we upper-bound it
    by the sum (exact recount happens once at the final level). Avoids a full
    payload re-scan per level, which would read every posting byte N_levels
    times at 10^12 scale."""
    out: dict[int, dict] = {}
    for s in segments:
        dst = int(s["shard_id"]) // fanout
        acc = out.setdefault(dst, {"shard_id": dst, "n_terms": 0,
                                   "n_blocks": 0, "n_postings": 0,
                                   "payload_bytes": 0})
        for k in ("n_terms", "n_blocks", "n_postings", "payload_bytes"):
            acc[k] += int(s[k])
    return [out[k] for k in sorted(out)]


def merge_to_target(spark: SparkSession, index_dir: str, cfg: IndexConfig,
                    partitions: int, fanout: int, n_iters: int,
                    resume: bool = True) -> list[dict]:
    """Run the full merge tree; returns checkpoint payloads per level.
    Skip-if-done semantics mirror IndexMergeTool.mergeIfNeeded
    (IndexMergeTool.java:68-78)."""
    from .build import segment_metrics

    levels: list[dict] = []
    cur = partitions
    prev_segments = (mf.read_checkpoint(index_dir, "level_0") or {}).get("segments", [])
    for it in range(1, n_iters + 1):
        phase = f"level_{it}"
        ck = mf.read_checkpoint(index_dir, phase) if resume else None
        if ck is None:
            import time
            t0 = time.time()
            path, cur = merge_level(spark, index_dir, it - 1, fanout, cur,
                                    compression=cfg.compression)
            segs = (segment_metrics(spark, path) if it == n_iters
                    else rollup_metrics(prev_segments, fanout))
            mf.write_checkpoint(index_dir, phase, {
                "path": path, "n_shards": cur, "fanout": fanout,
                "segments": segs, "wall_s": round(time.time() - t0, 2),
                "lineage": {"from_level": it - 1, "fanout": fanout},
            })
            ck = mf.read_checkpoint(index_dir, phase)
        else:
            cur = ck["n_shards"]
        prev_segments = ck.get("segments", [])
        levels.append(ck | {"level": it})
    return levels


def compact_final(spark: SparkSession, index_dir: str,
                  max_segments: int | None = None) -> dict:
    """forceMerge(maxSegments) analog as a standalone pass: rewrite the final
    level so every (shard, term) posting list uses full-size blocks in at
    most max_segments files per shard, then recommit the manifest pointing at
    the compacted level (TreeMergeOutputFormat.java:170-183). max_segments
    overrides the index config's value when given."""
    import dataclasses

    from ..config import IndexConfig
    from .build import segment_metrics

    m = mf.read_manifest(index_dir)
    cfg = IndexConfig(**{k: (tuple(v) if k == "stopwords" else v)
                         for k, v in m["config"].items()})
    if max_segments is not None:
        cfg = dataclasses.replace(cfg, max_segments=int(max_segments))
    final = m["levels"][-1]
    if final.get("compacted"):
        return m
    level_no = int(final["level"])
    path = compact_level(spark, index_dir, level_no, cfg,
                         float(m["stats"]["avgdl"]), int(final["n_shards"]))
    levels = m["levels"][:-1] + [dict(final, path=path, compacted=True,
                                      segments=segment_metrics(spark, path))]
    return mf.write_manifest(index_dir, dataclasses.asdict(cfg), m["stats"],
                             levels, m["input"])
