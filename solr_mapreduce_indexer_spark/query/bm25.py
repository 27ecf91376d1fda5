"""Top-k BM25 query evaluation over posting-block segments.

Semantics target (SURVEY §2.7): Lucene/Solr 7.7.2 BM25Similarity —
  idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  tfnorm(t,d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  score(q,d)  = Σ_t idf(t) * tfnorm(t,d)        (k1=1.2, b=0.75)
AND = posting intersection, OR = union; ties break by ascending doc_id.

Physical plan: parquet scan of block rows filtered by `term IN (...)` (pushed
to the scan; segments are written sorted by term so row-group stats prune),
then ONE applyInPandas per shard scores every query in the batch vectorized
(numpy), emits per-(query, shard) top-k candidates, and a final global
orderBy(score desc, doc_id asc).limit(k) resolves each query. All float math
is float64 with a fixed term-iteration order (sorted terms) so results are
reproducible and oracle-comparable.

AND queries prune blocks before decoding: the rarest term (min df) is the
essential list; other terms' blocks are skipped unless their [first_doc,
last_doc] range intersects an essential candidate (block-max skipping in the
spirit of WAND, Ding & Suel SIGIR'11).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..index.codec import bm25_tfnorm, decode_block
from ..index.manifest import read_manifest


@dataclass
class IndexHandle:
    index_dir: str
    cfg: IndexConfig
    n_docs: int
    avgdl: float
    postings_path: str
    term_stats_path: str
    docmap_path: str


def load_index(index_dir: str) -> IndexHandle:
    m = read_manifest(index_dir)
    cfg = IndexConfig(**{k: (tuple(v) if k == "stopwords" else v)
                         for k, v in m["config"].items()})
    final = m["levels"][-1]
    return IndexHandle(
        index_dir=index_dir,
        cfg=cfg,
        n_docs=int(m["stats"]["n_docs"]),
        avgdl=float(m["stats"]["avgdl"]),
        postings_path=final["path"],
        term_stats_path=os.path.join(index_dir, "term_stats"),
        docmap_path=os.path.join(index_dir, "docmap"),
    )


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _lookup_dfs(spark: SparkSession, h: IndexHandle, terms: list[str]) -> dict[str, int]:
    rows = (spark.read.parquet(h.term_stats_path)
            .where(F.col("term").isin(terms))
            .select("term", "df").collect())
    return {r["term"]: int(r["df"]) for r in rows}


def _score_shard_kernel(queries: list[dict], idfs: dict[str, float],
                        avgdl: float, k1: float, b: float):
    """applyInPandas kernel over one shard's blocks for the whole query
    batch. Input pdf: term, first_doc, last_doc, n, max_tfnorm, doc_bytes,
    tf_bytes, len_bytes. Output: query_id, doc_id, score (per-shard top-k
    candidates).

    Decode sharing is the key batch economics: a term referenced by many
    queries (Zipf head) is decoded ONCE per shard and its per-posting BM25
    contribution cached; ranged (block-skipping) requests reuse the cache via
    searchsorted when available. One task per shard mirrors how a Solr/ES
    query fans out — per-shard work is the unit of query parallelism."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term: dict[str, pd.DataFrame] = {
            t: g.sort_values("first_doc") for t, g in pdf.groupby("term")}
        full_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def decode_term(t: str, ranges: np.ndarray | None = None):
            """Decode a term's blocks; when `ranges` (sorted candidate doc
            ids) is given, skip blocks not intersecting any candidate."""
            if t in full_cache:
                d, c = full_cache[t]
                if ranges is None or len(d) <= 1024:
                    return d, c
                lo = np.searchsorted(d, ranges[0])
                hi = np.searchsorted(d, ranges[-1], side="right")
                return d[lo:hi], c[lo:hi]
            g = by_term[t]
            if ranges is not None and len(ranges):
                firsts = g["first_doc"].to_numpy()
                lasts = g["last_doc"].to_numpy()
                lo = np.searchsorted(ranges, firsts, side="left")
                hi = np.searchsorted(ranges, lasts, side="right")
                keep = hi > lo
            else:
                keep = np.ones(len(g), dtype=bool)
            docs, contribs = [], []
            for i, r in enumerate(g.itertuples(index=False)):
                if not keep[i]:
                    continue
                d, tf, dl = decode_block(r.doc_bytes, r.tf_bytes, r.len_bytes,
                                         r.first_doc)
                docs.append(d)
                contribs.append(idfs[t] * bm25_tfnorm(tf, dl, avgdl, k1, b))
            if not docs:
                out = (np.empty(0, np.int64), np.empty(0, np.float64))
            else:
                out = (np.concatenate(docs), np.concatenate(contribs))
            if ranges is None:
                full_cache[t] = out
            return out

        out_q, out_d, out_s = [], [], []
        for q in queries:
            terms = [t for t in q["terms"] if t in by_term] \
                if q["mode"] == "OR" else q["terms"]
            if q["mode"] == "AND":
                if any(t not in by_term for t in terms):
                    continue  # this shard can't contain a conjunctive match
                # essential list = rarest term; prune other terms' blocks
                terms_sorted = sorted(terms, key=lambda t: idfs[t], reverse=True)
                ess = terms_sorted[0]
                cand_docs, cand_scores = decode_term(ess)
                for t in sorted(terms_sorted[1:]):
                    d, c = decode_term(t, ranges=cand_docs)
                    # galloping-style intersection via searchsorted
                    pos = np.searchsorted(cand_docs, d)
                    pos = np.clip(pos, 0, len(cand_docs) - 1)
                    hit = cand_docs[pos] == d
                    keep_mask = np.zeros(len(cand_docs), dtype=bool)
                    keep_mask[pos[hit]] = True
                    add = np.zeros(len(cand_docs), dtype=np.float64)
                    add[pos[hit]] = c[hit]
                    cand_docs = cand_docs[keep_mask]
                    cand_scores = (cand_scores + add)[keep_mask]
                    if len(cand_docs) == 0:
                        break
                docs, scores = cand_docs, cand_scores
            else:  # OR — vectorized MaxScore (Turtle & Flood '95) with
                   # block-max skipping for non-essential terms (Q5).
                if not terms:
                    continue
                k = q["k"]
                # term-level score upper bound: idf * max block tfnorm
                ubs = {t: idfs[t] * float(by_term[t]["max_tfnorm"].max())
                       for t in terms}
                # stable order: ub desc, term asc (reproducible float sums)
                ts_sorted = sorted(terms, key=lambda t: (-ubs[t], t))
                suffix = np.cumsum([ubs[t] for t in ts_sorted][::-1])[::-1]
                cand_docs = np.empty(0, np.int64)
                cand_scores = np.empty(0, np.float64)
                theta = -1.0  # k-th best accumulated score so far
                for i, t in enumerate(ts_sorted):
                    if i > 0 and suffix[i] < theta:
                        # non-essential: no unseen doc can reach top-k;
                        # only update existing candidates, skipping blocks
                        # outside the candidate doc-id ranges.
                        d, c = decode_term(t, ranges=cand_docs)
                        pos = np.searchsorted(cand_docs, d)
                        pos = np.clip(pos, 0, max(len(cand_docs) - 1, 0))
                        hit = (cand_docs[pos] == d) if len(cand_docs) else \
                            np.zeros(len(d), dtype=bool)
                        np.add.at(cand_scores, pos[hit], c[hit])
                    else:
                        d, c = decode_term(t)
                        alld = np.concatenate([cand_docs, d])
                        allc = np.concatenate([cand_scores, c])
                        cand_docs, inv = np.unique(alld, return_inverse=True)
                        cand_scores = np.bincount(inv, weights=allc)
                    if len(cand_scores) >= k:
                        theta = float(np.partition(cand_scores, -k)[-k])
                docs, scores = cand_docs, cand_scores
            if len(docs) == 0:
                continue
            k = q["k"]
            if len(docs) > k:
                # top-k by (score desc, doc asc): lexsort on (-score, doc)
                idx = np.lexsort((docs, -scores))[:k]
            else:
                idx = np.lexsort((docs, -scores))
            out_q.extend([q["query_id"]] * len(idx))
            out_d.append(docs[idx])
            out_s.append(scores[idx])
        if not out_q:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.DataFrame({
            "query_id": np.asarray(out_q, dtype=np.int64),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        })

    return score


def run_queries(spark: SparkSession, h: IndexHandle,
                queries: list[dict]) -> DataFrame:
    """Batch top-k evaluation. Each query: {query_id, terms: [str], mode:
    'AND'|'OR', k: int}. Returns (query_id, rank, doc_id, conv_id, turn_idx,
    score) with rank 1..k ordered by (score desc, doc_id asc)."""
    from ..session import ensure_shipped
    ensure_shipped(spark)
    cfg = h.cfg
    all_terms = sorted({t.lower() for q in queries for t in q["terms"]})
    dfs = _lookup_dfs(spark, h, all_terms)
    idfs = {t: idf(h.n_docs, dfs.get(t, 0)) for t in all_terms}

    norm_queries = [{"query_id": int(q["query_id"]),
                     "terms": sorted({t.lower() for t in q["terms"]}),
                     "mode": q.get("mode", "AND"),
                     "k": int(q.get("k", 10))} for q in queries]
    present = [t for t in all_terms if t in dfs]
    empty = spark.createDataFrame(
        [], "query_id long, rank int, doc_id long, conv_id string, "
            "turn_idx int, score double")
    if not present:
        return empty

    blocks = (spark.read.parquet(h.postings_path)
              .where(F.col("term").isin(present)))
    cand = (blocks.groupBy("shard_id")
            .applyInPandas(
                _score_shard_kernel(norm_queries, idfs, h.avgdl,
                                    cfg.k1, cfg.b),
                schema="query_id long, doc_id long, score double"))

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ks = {q["query_id"]: q["k"] for q in norm_queries}
    kmap = F.create_map(*[F.lit(x) for kv in ks.items() for x in kv])
    topk = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= kmap[F.col("query_id")]))

    docmap = spark.read.parquet(h.docmap_path).select("doc_id", "conv_id", "turn_idx")
    return (docmap.join(F.broadcast(topk), "doc_id")
            .select("query_id", "rank", "doc_id", "conv_id", "turn_idx", "score")
            .orderBy("query_id", "rank"))


def bm25_topk(spark: SparkSession, h: IndexHandle, terms: list[str],
              k: int = 10, mode: str = "AND") -> DataFrame:
    return run_queries(spark, h, [{"query_id": 0, "terms": terms,
                                   "mode": mode, "k": k}]).drop("query_id")
