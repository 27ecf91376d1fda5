"""Top-k BM25 query evaluation over posting-block segments.

Semantics target (SURVEY §2.7): Lucene/Solr 7.7.2 BM25Similarity —
  idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  tfnorm(t,d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  score(q,d)  = Σ_t idf(t) * tfnorm(t,d)        (k1=1.2, b=0.75)
AND = posting intersection, OR = union; ties break by ascending doc_id.

Physical plan (default, Solr/ES fan-out shape): ONE task per shard reads its
own hive partition of the served level directly — pyarrow with the batch's
`term IN (...)` pushed down; segments are written sorted by term so
row-group stats prune — and scores every query in the batch vectorized
(numpy), emitting per-(query, shard) top-k candidates; a final global
orderBy(score desc, doc_id asc).limit(k) resolves each query. No shuffle
touches payload bytes. A legacy plan (parquet scan stage → hash exchange →
per-shard applyInPandas kernel) remains as the automatic fallback for
storage only Spark's Hadoop conf can open. All float math is float64 with a
fixed term-iteration order (sorted terms) so results are reproducible and
oracle-comparable across both plans.

Block-max pruning (SURVEY §2.7 Q5; Ding & Suel SIGIR'11, reference semantics
from shaded Lucene's BlockMax WAND): every block stores max_tfnorm, so
idf·max_tfnorm is a sound per-block score bound. The kernel uses it three ways:

* AND: the rarest term is the essential list, processed in descending
  per-block bound order (bound = block ub + Σ other-term ubs); once k
  conjunctive matches are scored, all remaining essential blocks whose bound
  falls below the running k-th score are never decoded. Non-essential terms
  decode only blocks whose doc range intersects surviving candidates.
* OR: vectorized MaxScore (Turtle & Flood '95). Essential terms decode fully
  only the blocks that could mint a NEW top-k doc (block ub + remaining
  suffix ≥ θ); their other blocks decode update-only where they overlap
  candidates. Non-essential terms first drop candidates whose partial score
  + remaining suffix can't reach θ, then decode only candidate-overlapping
  blocks.
* All decoded blocks are cached per (term, block) for the whole query batch,
  so a Zipf-head term is decoded at most once per shard per batch.

Skipping is exact, not approximate: bounds are accumulated in the same
left-to-right order as real scores (floating-point monotonicity) and compared
with a 1e-9 absolute slack, so skipped docs are provably below the k-th score
— results are bit-identical to exhaustive evaluation.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..index.codec import (bm25_tfnorm, decode_block, decode_positions,
                           tune_allocator)
from ..index.manifest import read_manifest
from ..index.tombstones import load_tombstones_range


@dataclass
class IndexHandle:
    index_dir: str
    cfg: IndexConfig
    n_docs: int
    avgdl: float
    postings_path: str
    term_stats_path: str
    docmap_path: str
    tombstones_path: str | None = None
    shard_ids: tuple = ()  # shard ids of the final (served) level


def load_index(index_dir: str) -> IndexHandle:
    m = read_manifest(index_dir)
    cfg = IndexConfig(**{k: (tuple(v) if k == "stopwords" else v)
                         for k, v in m["config"].items()})
    final = m["levels"][-1]
    tombs = m.get("tombstones")
    # The served level's shard ids come from the manifest, NOT cfg.shards:
    # a merge-less or streaming-generation index serves straight from a
    # micro-sharded level.
    # set(): a duplicate shard id would double-read (and double-score) that
    # shard under the direct-fetch plan
    sids = tuple(sorted({int(s["shard_id"]) for s in final.get("segments", [])}))
    if not sids and "n_shards" in final:
        sids = tuple(range(int(final["n_shards"])))
    return IndexHandle(
        index_dir=index_dir,
        cfg=cfg,
        n_docs=int(m["stats"]["n_docs"]),
        avgdl=float(m["stats"]["avgdl"]),
        postings_path=final["path"],
        term_stats_path=os.path.join(index_dir, "term_stats"),
        docmap_path=os.path.join(index_dir, "docmap"),
        tombstones_path=tombs["path"] if tombs else None,
        shard_ids=sids,
    )


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _lookup_dfs(spark: SparkSession, h: IndexHandle, terms: list[str]) -> dict[str, int]:
    """df per term — a coordinator POINT-READ, not a Spark job. term_stats is
    written range-partitioned + sorted by term, so pyarrow's `term IN` filter
    prunes to the overlapping row groups; the read is bounded by |terms|, not
    corpus size, and skips a whole Spark job's scheduling latency per batch.
    Falls back to the Spark read when pyarrow's filesystem stack can't open
    the path (same credential split as the docmap point-fetch; README
    "Storage access")."""
    try:
        import pyarrow.dataset as pads

        from ..fsutil import local_path
        tbl = (pads.dataset(local_path(h.term_stats_path), format="parquet")
               .to_table(columns=["term", "df"],
                         filter=pads.field("term").isin(terms)))
        return {t: int(d) for t, d in
                zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())}
    except Exception:
        rows = (spark.read.parquet(h.term_stats_path)
                .where(F.col("term").isin(terms))
                .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in rows}


# Decoded-block observability: incremented on every block-cache MISS inside
# the scoring kernel. Executors each have their own copy; tests call the
# kernel in-process to measure pruning (see tests/test_blockmax.py).
DECODE_STATS = {"blocks_decoded": 0, "pos_blocks_decoded": 0,
                "pos_blocks_fetched": 0}

_EPS = 1e-9  # absolute slack on bound-vs-theta comparisons (scores are O(10))

DIRECT_FETCH = True
"""When True (default), each shard's scoring task reads its own hive
partition of the served postings level directly (pyarrow, term-IN pushdown,
row-group pruning via the term-sorted file layout) — a Solr/ES shard reading
its own segment files. The whole batch then runs as ONE stage of |shards|
tasks with no exchange. The legacy plan (parquet scan stage → hash shuffle →
per-shard kernel) moved every matching block's payload bytes through the
shuffle — on positional indexes including pos_bytes for every term in the
batch — which at 16M docs is GBs per Zipf-head batch and was the dominant
poorly-scaling query cost. Falls back to the legacy plan when pyarrow's own
filesystem stack can't see the postings path (same credential split as the
docmap point-fetch; see README "Storage access")."""


def _direct_fetch_gen(postings_path: str, present: list[str],
                      phrase_terms: list[str], score_fn):
    """mapInPandas generator: rows of shard ids → scored candidates.

    Reads ONLY the columns the kernel touches (term, doc range, max_tfnorm,
    payload bytes) — the legacy exchange also carried n/max_tf/sum_tf/min_dl.
    Position payloads are not read up front at all: the kernel's phase 2
    calls back into `pos_fetch` for exactly the candidate-overlapping blocks
    of the batch's PHRASE terms (filter `term == t AND first_doc IN (...)`,
    row-group pruned by the term-sorted layout) — a Zipf-head phrase term's
    non-candidate position payloads never leave storage, where previously
    every block of every phrase term paid the pos_bytes I/O even though the
    lazy decode then ignored most of it."""
    cols = ["term", "first_doc", "last_doc", "max_tfnorm",
            "doc_bytes", "tf_bytes", "len_bytes"]

    def gen(pdfs):
        import pyarrow.dataset as pads

        from ..fsutil import local_path
        root = local_path(postings_path).rstrip("/")
        for pdf in pdfs:
            for sid in pdf["shard_id"].tolist():
                # Each task opens ONLY its own partition directory: a
                # root-level hive discovery would list all S shard dirs in
                # every one of the S tasks — O(S²) storage listings per
                # batch at 1000 shards. (Dir name is Spark's partitionBy
                # layout; shard ids come from the manifest, so the dir
                # exists for every id handed to us.)
                ds = pads.dataset(f"{root}/shard_id={int(sid)}",
                                  format="parquet")
                blocks = ds.to_table(
                    columns=cols,
                    filter=pads.field("term").isin(present)).to_pandas()
                pos_fetch = None
                if phrase_terms and "pos_bytes" in ds.schema.names:
                    def pos_fetch(term, first_docs, ds=ds):
                        t = ds.to_table(
                            columns=["first_doc", "pos_bytes"],
                            filter=(pads.field("term") == term)
                            & pads.field("first_doc").isin(
                                [int(x) for x in first_docs]))
                        return dict(zip(t["first_doc"].to_pylist(),
                                        t["pos_bytes"].to_pylist()))
                yield score_fn(blocks, pos_fetch)
    return gen


def _score_shard_kernel(queries: list[dict], idfs: dict[str, float],
                        avgdl: float, k1: float, b: float,
                        tombstones_path: str | None = None,
                        doc_bits: int = 40):
    """applyInPandas kernel over one shard's blocks for the whole query
    batch. Input pdf: term, first_doc, last_doc, n, max_tfnorm, doc_bytes,
    tf_bytes, len_bytes. Output: query_id, doc_id, score (per-shard top-k
    candidates).

    Decode sharing is the key batch economics: blocks are cached per
    (term, block), so a term referenced by many queries (Zipf head) is
    decoded at most once per shard per batch regardless of which query (or
    which pruning path) touches it. One task per shard mirrors how a Solr/ES
    query fans out — per-shard work is the unit of query parallelism.

    Tombstones (duplicate-key losers awaiting compaction) are read HERE, per
    shard: the kernel loads only its own doc-id slice of the tombstone
    parquet (sorted by doc_id, so the read is row-group-pruned) — the
    tombstone set never lands on the driver, so even adversarially
    collision-heavy merges (two overlapping 100 TB generations) stay
    O(shard slice) per task."""

    def score(pdf: pd.DataFrame, pos_fetch=None) -> pd.DataFrame:
        # pos_fetch(term, first_docs) → {first_doc: pos_bytes}: supplied by
        # the direct-fetch plan so position payloads are READ (not just
        # decoded) only for candidate-overlapping blocks; the legacy
        # applyInPandas plan passes pos_bytes in pdf instead.
        tune_allocator()
        tombstones = None
        if tombstones_path is not None and len(pdf):
            tombstones = load_tombstones_range(
                tombstones_path, int(pdf["first_doc"].min()),
                int(pdf["last_doc"].max()), doc_bits)
            if not len(tombstones):
                tombstones = None
        by_term: dict[str, pd.DataFrame] = {
            t: g.sort_values("first_doc").reset_index(drop=True)
            for t, g in pdf.groupby("term")}
        meta: dict[str, tuple] = {}
        block_cache: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}

        def term_meta(t: str) -> tuple:
            """(firsts, lasts, block score ubs, doc/tf/len byte arrays)."""
            m = meta.get(t)
            if m is None:
                g = by_term[t]
                m = (g["first_doc"].to_numpy(), g["last_doc"].to_numpy(),
                     idfs[t] * g["max_tfnorm"].to_numpy(),
                     g["doc_bytes"].to_numpy(), g["tf_bytes"].to_numpy(),
                     g["len_bytes"].to_numpy())
                meta[t] = m
            return m

        def decode_blocks(t: str, idx: np.ndarray):
            """Decode the given block ordinals of term t (per-block cache);
            returns (doc_ids, bm25 contributions) concatenated. Tombstoned
            docs (duplicate-key losers awaiting compaction) are dropped at
            decode, before caching — Lucene live-docs semantics, so they can
            never enter a candidate set or displace a live top-k doc."""
            firsts, _lasts, _ubs, db, tb, lb = term_meta(t)
            docs, contribs = [], []
            for i in idx:
                i = int(i)
                got = block_cache.get((t, i))
                if got is None:
                    d, tf, dl = decode_block(db[i], tb[i], lb[i],
                                             int(firsts[i]))
                    if tombstones is not None and len(tombstones) and len(d):
                        pos = np.clip(np.searchsorted(tombstones, d), 0,
                                      len(tombstones) - 1)
                        keep = tombstones[pos] != d
                        d, tf, dl = d[keep], tf[keep], dl[keep]
                    got = (d, idfs[t] * bm25_tfnorm(tf, dl, avgdl, k1, b))
                    block_cache[(t, i)] = got
                    DECODE_STATS["blocks_decoded"] += 1
                docs.append(got[0])
                contribs.append(got[1])
            if not docs:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            return np.concatenate(docs), np.concatenate(contribs)

        def blocks_hitting(t: str, cand: np.ndarray) -> np.ndarray:
            """Ordinals of t's blocks whose [first_doc, last_doc] range
            intersects any of the sorted candidate doc ids."""
            if len(cand) == 0:
                return np.empty(0, np.int64)
            firsts, lasts, *_ = term_meta(t)
            lo = np.searchsorted(cand, firsts, side="left")
            hi = np.searchsorted(cand, lasts, side="right")
            return np.flatnonzero(hi > lo)

        pos_cache: dict[tuple[str, int], tuple] = {}

        def decode_pos_blocks(t: str, idx: np.ndarray):
            """Decode the given block ordinals of term t WITH positions →
            concatenated (docs, tfs, dls, pos_flat), tombstones applied.
            Per-block cache for the whole batch: the phrase doc-intersection
            phase and the position-intersection phase touch each block ONCE.
            Only the rarest term decodes all its blocks; every other term's
            blocks reach here through blocks_hitting, so a Zipf-head phrase
            term never decodes its full posting+position stream — Lucene
            PhraseQuery's two-phase iteration, where positions are consulted
            only for docs passing the conjunctive doc-level approximation."""
            firsts, _lasts, _ubs, db, tb, lb = term_meta(t)
            pb_col = by_term[t]["pos_bytes"].to_numpy() \
                if "pos_bytes" in by_term[t].columns else None
            idx_sorted = np.sort(np.asarray(idx, dtype=np.int64))
            fetched: dict[int, bytes] = {}
            if pb_col is None and pos_fetch is not None:
                # point-read exactly the missing candidate blocks' position
                # payloads (first_doc is unique per block within a term)
                need = [int(firsts[int(i)]) for i in idx_sorted
                        if (t, int(i)) not in pos_cache]
                if need:
                    fetched = pos_fetch(t, need)
                    DECODE_STATS["pos_blocks_fetched"] += len(fetched)
            ds_, ts_, ls_, ps_ = [], [], [], []
            for i in idx_sorted:
                i = int(i)
                got = pos_cache.get((t, i))
                if got is None:
                    pb = pb_col[i] if pb_col is not None \
                        else fetched.get(int(firsts[i]))
                    if pb is None or len(pb) == 0:
                        raise ValueError(
                            "PHRASE queries require an index built with "
                            "positions=True (IndexConfig.positions)")
                    d, tf, dl = decode_block(db[i], tb[i], lb[i],
                                             int(firsts[i]))
                    p, _ = decode_positions(pb, tf)
                    if tombstones is not None and len(tombstones) and len(d):
                        ix = np.clip(np.searchsorted(tombstones, d), 0,
                                     len(tombstones) - 1)
                        keep = tombstones[ix] != d
                        p = p[np.repeat(keep, tf)]
                        d, tf, dl = d[keep], tf[keep], dl[keep]
                    got = (d, tf, dl, p)
                    pos_cache[(t, i)] = got
                    DECODE_STATS["blocks_decoded"] += 1
                    DECODE_STATS["pos_blocks_decoded"] += 1
                ds_.append(got[0]); ts_.append(got[1])
                ls_.append(got[2]); ps_.append(got[3])
            if not ds_:
                z = np.empty(0, np.int64)
                return z, z, z, z
            return (np.concatenate(ds_), np.concatenate(ts_),
                    np.concatenate(ls_), np.concatenate(ps_))

        def intersect_update(cand_docs, cand_scores, d, c):
            """AND-step: keep candidates present in (d, c), add contribution."""
            pos = np.searchsorted(cand_docs, d)
            pos = np.clip(pos, 0, max(len(cand_docs) - 1, 0))
            hit = (cand_docs[pos] == d) if len(cand_docs) else \
                np.zeros(len(d), dtype=bool)
            keep_mask = np.zeros(len(cand_docs), dtype=bool)
            keep_mask[pos[hit]] = True
            add = np.zeros(len(cand_docs), dtype=np.float64)
            add[pos[hit]] = c[hit]
            return cand_docs[keep_mask], (cand_scores + add)[keep_mask]

        out_q, out_d, out_s = [], [], []
        for q in queries:
            k = q["k"]
            if q["mode"] == "AND":
                terms = q["terms"]
                if any(t not in by_term for t in terms):
                    continue  # this shard can't contain a conjunctive match
                # essential list = rarest term (highest idf); process its
                # blocks in descending score-bound order with early stop.
                terms_sorted = sorted(terms, key=lambda t: idfs[t],
                                      reverse=True)
                ess = terms_sorted[0]
                others = sorted(terms_sorted[1:])
                bounds = term_meta(ess)[2].astype(np.float64).copy()
                for t in others:  # same accumulation order as real scores
                    bounds = bounds + float(term_meta(t)[2].max())
                order = np.argsort(-bounds, kind="stable")
                acc_d: list[np.ndarray] = []
                acc_s: list[np.ndarray] = []
                n_acc = 0
                theta = -np.inf
                CHUNK = 32
                for cs in range(0, len(order), CHUNK):
                    sel = order[cs:cs + CHUNK]
                    if bounds[sel[0]] < theta - _EPS:
                        break  # desc bound order: every later block is below
                    cd, csc = decode_blocks(ess, np.sort(sel))
                    o = np.argsort(cd, kind="stable")
                    cd, csc = cd[o], csc[o]
                    for t in others:
                        d, c = decode_blocks(t, blocks_hitting(t, cd))
                        cd, csc = intersect_update(cd, csc, d, c)
                        if len(cd) == 0:
                            break
                    if len(cd):
                        acc_d.append(cd)
                        acc_s.append(csc)
                        n_acc += len(cd)
                        if n_acc >= k:
                            allsc = np.concatenate(acc_s)
                            theta = float(np.partition(allsc, -k)[-k])
                docs = np.concatenate(acc_d) if acc_d else np.empty(0, np.int64)
                scores = (np.concatenate(acc_s) if acc_s
                          else np.empty(0, np.float64))
            elif q["mode"] == "PHRASE":
                # Exact-phrase BM25 (Lucene PhraseQuery semantics): docs
                # containing the terms at CONSECUTIVE positions; tf = number
                # of phrase occurrences; weight = Σ idf(tᵢ) over the phrase
                # slots. CONJUNCTION-DRIVEN, two-phase like Lucene 7.7.2
                # PhraseQuery (the reference output format's evaluator):
                # phase 1 intersects doc sets rarest-term-outward — only the
                # rarest term's postings decode fully; every other term
                # decodes only blocks whose doc range intersects surviving
                # candidates (block metadata, no payload touch otherwise).
                # Phase 2 decodes POSITIONS only for candidate-overlapping
                # blocks and intersects per-slot (doc, pos − slot) key sets;
                # survivors' counts are the phrase freqs. A Zipf-head term
                # in the phrase therefore costs O(candidate blocks), not a
                # full posting+position decode.
                terms = q["terms"]  # ordered, duplicates meaningful
                uniqs = sorted(set(terms))
                if not terms or any(t not in by_term for t in uniqs):
                    continue
                PAD = 64  # slot shift head-room; bounds phrase length
                if len(terms) > PAD:
                    raise ValueError(f"phrase longer than {PAD} terms "
                                     "is unsupported")
                if "pos_bytes" not in pdf.columns and pos_fetch is None:
                    raise ValueError(
                        "PHRASE queries require an index built with "
                        "positions=True (IndexConfig.positions)")
                by_rarity = sorted(uniqs, key=lambda t: (-idfs[t], t))
                # Phase 1 is postings-only (decode_blocks): the doc/tf/len
                # streams are separate payloads from positions, so a block
                # ruled out here NEVER pays position decode — even the lead
                # term's. Positions are decoded lazily in phase 2 for
                # candidate-overlapping blocks only (Lucene's two-phase
                # iterator: matches() runs only on approximation hits).
                t0 = by_rarity[0]
                d0, _c0 = decode_blocks(
                    t0, np.arange(len(term_meta(t0)[0])))
                cand = d0
                for t in by_rarity[1:]:
                    d, _c = decode_blocks(t, blocks_hitting(t, cand))
                    cand = cand[np.isin(cand, d, assume_unique=True)]
                    if not len(cand):
                        break
                if not len(cand):
                    continue
                dls_cand = None
                keys = None
                for i, t in enumerate(terms):
                    docs_t, tfs_t, dls_t, pflat = decode_pos_blocks(
                        t, blocks_hitting(t, cand))
                    offs = np.cumsum(tfs_t) - tfs_t
                    ix = np.searchsorted(docs_t, cand)
                    if dls_cand is None:
                        dls_cand = dls_t[ix]
                    ls, st = tfs_t[ix], offs[ix]
                    total = int(ls.sum())
                    gi = (np.arange(total, dtype=np.int64)
                          - np.repeat(np.cumsum(ls) - ls, ls)
                          + np.repeat(st, ls))
                    p = pflat[gi]
                    dord = np.repeat(np.arange(len(cand), dtype=np.int64),
                                     ls)
                    # pack (candidate ordinal, slot-aligned position) into
                    # one int64 key. 32-bit position field: in-doc positions
                    # are bounded by doc_len (< 2^31), and overflow fails
                    # LOUDLY instead of silently dropping matches (the old
                    # 21-bit field lost phrase hits past ~2.09M tokens).
                    shifted = p - i + PAD
                    if shifted.size and int(shifted.max()) >= (1 << 32):
                        raise ValueError(
                            "in-doc position exceeds 2^32 − 64: document "
                            "too long for the positional key packing")
                    valid = shifted >= 0
                    k_i = (dord[valid] << np.int64(32)) | shifted[valid]
                    keys = k_i if keys is None else \
                        keys[np.isin(keys, k_i, assume_unique=True)]
                    if not len(keys):
                        break
                if keys is None or not len(keys):
                    continue
                ords = (keys >> np.int64(32))
                pf = np.bincount(ords, minlength=len(cand))
                hit = pf > 0
                idf_sum = float(sum(idfs[t] for t in terms))
                docs = cand[hit]
                scores = idf_sum * bm25_tfnorm(pf[hit], dls_cand[hit],
                                               avgdl, k1, b)
            else:  # OR — vectorized MaxScore (Turtle & Flood '95) with
                   # block-max skipping in both phases (Q5).
                terms = [t for t in q["terms"] if t in by_term]
                if not terms:
                    continue
                # term-level score upper bound: idf * max block tfnorm
                ubs = {t: float(term_meta(t)[2].max()) for t in terms}
                # stable order: ub desc, term asc (reproducible float sums)
                ts_sorted = sorted(terms, key=lambda t: (-ubs[t], t))
                suffix = np.cumsum([ubs[t] for t in ts_sorted][::-1])[::-1]
                cand_docs = np.empty(0, np.int64)
                cand_scores = np.empty(0, np.float64)
                theta = -np.inf  # k-th best accumulated score so far
                for i, t in enumerate(ts_sorted):
                    rem_after = float(suffix[i + 1]) if i + 1 < len(ts_sorted) \
                        else 0.0
                    if i > 0 and suffix[i] < theta - _EPS:
                        # non-essential: no unseen doc can reach top-k. Drop
                        # candidates that can't reach theta either (their
                        # final score is provably below the k-th), then
                        # decode only candidate-overlapping blocks.
                        alive = cand_scores + suffix[i] >= theta - _EPS
                        cand_docs = cand_docs[alive]
                        cand_scores = cand_scores[alive]
                        d, c = decode_blocks(t, blocks_hitting(t, cand_docs))
                        pos = np.searchsorted(cand_docs, d)
                        pos = np.clip(pos, 0, max(len(cand_docs) - 1, 0))
                        hit = (cand_docs[pos] == d) if len(cand_docs) else \
                            np.zeros(len(d), dtype=bool)
                        np.add.at(cand_scores, pos[hit], c[hit])
                    else:
                        # essential: only blocks whose bound can mint a NEW
                        # top-k doc decode fully; the rest decode update-only
                        # where they overlap current candidates.
                        block_ubs = term_meta(t)[2]
                        new_idx = np.flatnonzero(
                            block_ubs + rem_after >= theta - _EPS)
                        upd_idx = np.setdiff1d(blocks_hitting(t, cand_docs),
                                               new_idx, assume_unique=True)
                        if len(upd_idx) and len(cand_docs):
                            du, cu = decode_blocks(t, upd_idx)
                            pos = np.searchsorted(cand_docs, du)
                            pos = np.clip(pos, 0, len(cand_docs) - 1)
                            hit = cand_docs[pos] == du
                            np.add.at(cand_scores, pos[hit], cu[hit])
                        d, c = decode_blocks(t, new_idx)
                        alld = np.concatenate([cand_docs, d])
                        allc = np.concatenate([cand_scores, c])
                        cand_docs, inv = np.unique(alld, return_inverse=True)
                        cand_scores = np.bincount(
                            inv, weights=allc, minlength=len(cand_docs))
                    if len(cand_scores) >= k:
                        theta = max(theta, float(
                            np.partition(cand_scores, -k)[-k]))
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
    if not cfg.positions and any(q.get("mode") == "PHRASE" for q in queries):
        # fail fast on the driver: without this, the kernel's lazy position
        # decode only raises when a phrase has doc-level candidates (a
        # zero-candidate phrase would return 0 rows with no signal), and the
        # executor-side ValueError reaches the caller wrapped in a
        # PythonException after a doomed batch has already run.
        raise ValueError("PHRASE queries require an index built with "
                         "positions=True (IndexConfig.positions)")
    all_terms = sorted({t.lower() for q in queries for t in q["terms"]})
    dfs = _lookup_dfs(spark, h, all_terms)
    idfs = {t: idf(h.n_docs, dfs.get(t, 0)) for t in all_terms}

    # Tombstones (duplicate-key losers; compact purges them physically) are
    # NOT loaded here: each shard kernel range-reads its own slice of the
    # sorted tombstone parquet — nothing collision-count-sized ever touches
    # the driver.
    norm_queries = [{"query_id": int(q["query_id"]),
                     # PHRASE keeps the given order (and duplicate slots);
                     # AND/OR sort+dedup for reproducible float sums
                     "terms": ([t.lower() for t in q["terms"]]
                               if q.get("mode") == "PHRASE"
                               else sorted({t.lower() for t in q["terms"]})),
                     "mode": q.get("mode", "AND"),
                     "k": int(q.get("k", 10))} for q in queries]
    present = [t for t in all_terms if t in dfs]
    empty = spark.createDataFrame(
        [], "query_id long, rank int, doc_id long, conv_id string, "
            "turn_idx int, score double")
    if not present:
        return empty

    # One kernel task per shard: query parallelism IS the shard count,
    # exactly like a Solr/ES fan-out — provision shards >= cores per the
    # deployment's query throughput needs. (A per-(shard, query-slice)
    # fan-out was measured here and REGRESSED 2x on Zipf-head batches:
    # the same hot terms appear in every slice, so slicing multiplies the
    # dominant decode work by the slice count while the per-shard batch
    # kernel already shares each decoded block across all queries.)
    kernel = _score_shard_kernel(norm_queries, idfs, h.avgdl,
                                 cfg.k1, cfg.b,
                                 tombstones_path=h.tombstones_path,
                                 doc_bits=cfg.doc_bits)
    cand_schema = "query_id long, doc_id long, score double"
    cand = None
    if DIRECT_FETCH and h.shard_ids:
        try:
            import pyarrow.dataset as pads

            from ..fsutil import local_path
            # Driver-side probe: fails fast when pyarrow's filesystem/
            # credential stack can't see the postings (kerberized HDFS,
            # cluster-side-only S3A creds) — degrade to the legacy Spark
            # scan, which reads through Spark's Hadoop conf.
            pads.dataset(local_path(h.postings_path), format="parquet",
                         partitioning="hive")
        except Exception:
            cand = None
        else:
            phrase_terms = sorted({t for q in norm_queries
                                   if q["mode"] == "PHRASE"
                                   for t in q["terms"] if t in dfs})
            sdf = spark.createDataFrame(
                spark.sparkContext.parallelize(
                    [(int(s),) for s in h.shard_ids], len(h.shard_ids)),
                "shard_id int")
            cand = sdf.mapInPandas(
                _direct_fetch_gen(h.postings_path, present, phrase_terms,
                                  kernel),
                schema=cand_schema)
    if cand is None:
        blocks = (spark.read.parquet(h.postings_path)
                  .where(F.col("term").isin(present)))

        # single-arg wrapper: applyInPandas dispatches on parameter count,
        # and the kernel's optional pos_fetch arg would make it look like
        # the (key, pdf) form; the legacy plan ships pos_bytes in the pdf
        def legacy_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return kernel(pdf)

        cand = (blocks.groupBy("shard_id")
                .applyInPandas(legacy_kernel, schema=cand_schema))

    # Land the per-shard candidates driver-side (≤ |shards| × Σ k rows —
    # tiny by construction: the kernel emits at most k rows per query per
    # shard) and resolve the global top-k in pandas. The previous plan ran a
    # row_number window over an Exchange(query_id) — a whole extra Spark
    # stage + shuffle to rank a few thousand rows; ranking them where they
    # already land removes the last exchange from the query path (the batch
    # is now ONE stage end to end). Ordering is identical: (score desc,
    # doc_id asc) per query, float64 on both sides.
    ks = {q["query_id"]: q["k"] for q in norm_queries}
    cpdf = cand.toPandas()
    if not len(cpdf):
        return empty
    cpdf = cpdf.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True], kind="stable")
    cpdf["rank"] = cpdf.groupby("query_id").cumcount() + 1
    cpdf = cpdf[cpdf["rank"] <= cpdf["query_id"].map(ks)]
    if not len(cpdf):
        return empty

    # FETCH the ≤ Σ k docmap rows as coordinator point lookups (the Solr/ES
    # stored-fields fetch phase): pyarrow.dataset prunes to the touched
    # micro-shard partitions via the doc-id high bits (hive dirs) and to
    # overlapping row groups via doc_id min/max stats — the same pruning
    # works against HDFS/S3 through pyarrow's filesystems. An earlier
    # implementation ran a Spark job that scanned every row of every hit
    # shard partition and broadcast-joined the top-k set: measured per-batch
    # cost grew from ~9s (4M docs) to ~44s (16M docs) — corpus-proportional,
    # fatal at 10^12 docs. The point-fetch reads 2.5k rows of a 16M-doc
    # docmap in 0.3-0.5s and is corpus-size-independent.
    ids = sorted(set(cpdf["doc_id"].astype(int).tolist()))
    hit_shards = sorted({i >> cfg.doc_bits for i in ids})
    try:
        import pyarrow.dataset as pads

        from ..fsutil import local_path
        dm = (pads.dataset(local_path(h.docmap_path), format="parquet",
                           partitioning="hive")
              .to_table(columns=["doc_id", "conv_id", "turn_idx"],
                        filter=(pads.field("shard_id").isin(hit_shards)
                                & pads.field("doc_id").isin(ids)))
              .to_pandas())
    except Exception:
        # pyarrow reads storage with ITS OWN filesystem/credential stack,
        # not Spark's Hadoop conf — on kerberized HDFS or S3A with
        # cluster-side-only credentials the point-fetch can fail even
        # though every Spark read works. Degrade to the partition-pruned
        # Spark read (slower: scheduling latency + row-group scan, still
        # pruned to hit shards and pushed doc_id IN filter) instead of
        # failing the batch. See README "Storage access" note.
        dm = (spark.read.parquet(h.docmap_path)
              .where(F.col("shard_id").isin([int(s) for s in hit_shards]))
              .where(F.col("doc_id").isin([int(i) for i in ids]))
              .select("doc_id", "conv_id", "turn_idx")
              .toPandas())
    tk = pd.DataFrame({
        "query_id": cpdf["query_id"].to_numpy(np.int64),
        "rank": cpdf["rank"].to_numpy(np.int32),
        "doc_id": cpdf["doc_id"].to_numpy(np.int64),
        "score": cpdf["score"].to_numpy(np.float64)})
    out = tk.merge(dm, on="doc_id", how="left").sort_values(
        ["query_id", "rank"], kind="stable")
    if out["conv_id"].isna().any():
        missing = out[out["conv_id"].isna()]["doc_id"].tolist()[:5]
        raise RuntimeError(f"scored doc ids missing from docmap: {missing}")
    out = out[["query_id", "rank", "doc_id", "conv_id", "turn_idx", "score"]]
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return spark.createDataFrame(
        out, "query_id long, rank int, doc_id long, conv_id string, "
             "turn_idx int, score double")


def bm25_topk(spark: SparkSession, h: IndexHandle, terms: list[str],
              k: int = 10, mode: str = "AND") -> DataFrame:
    return run_queries(spark, h, [{"query_id": 0, "terms": terms,
                                   "mode": mode, "k": k}]).drop("query_id")
