"""Deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join →
verified Jaccard), SimHash (hamming-banded), n-gram Jaccard, and
embedding-cosine near-dup. Shapes chosen for 100 TB: every candidate
generation is a bucket equi-join (shuffle on short hash keys, never O(n²));
verification only touches bucket-collision pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.analysis import tokenize_col

MERSENNE = (1 << 61) - 1
MERSENNE31 = (1 << 31) - 1  # md5 hash family: exact 64-bit (a*h+b) % p math
                            # on BOTH Spark-numpy and DuckDB-BIGINT sides


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                cfg: IndexConfig | None = None) -> DataFrame:
    """Exact duplicates on the normalized token stream: one row per distinct
    content with the canonical (min id) survivor and the duplicate count."""
    cfg = cfg or IndexConfig()
    norm = F.array_join(tokenize_col(text_col, cfg), " ")
    return (df.select(F.col(id_col), F.md5(norm).alias("content_md5"))
              .groupBy("content_md5")
              .agg(F.min(id_col).cast("long").alias("keep_id"),
                   F.count(F.lit(1)).cast("long").alias("n_copies")))


def _minhash_params(num_perm: int, seed: int = 42,
                    hash_family: str = "xxhash64") -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    p = MERSENNE31 if hash_family == "md5" else MERSENNE
    a = rng.integers(1, p, size=num_perm, dtype=np.int64)
    b = rng.integers(0, p, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hash_expr(toks, shingle_w: int, hash_family: str):
    """Array of w-token shingle hashes. xxhash64 (fast JVM path, default) or
    md5-derived 28-bit (DuckDB-replayable: the oracle needs exact (a*h+b)%p
    in 64-bit — 28-bit hashes × 31-bit constants never overflow)."""
    from ..functions.textops import md5_int
    if hash_family == "md5":
        def h(col):
            return md5_int(col, 7)
    else:
        h = F.xxhash64
    n = F.size(toks)
    return F.when(n >= shingle_w, F.transform(
        F.sequence(F.lit(1), n - shingle_w + 1),
        lambda i: h(F.array_join(F.slice(toks, i, shingle_w), " "))
    )).otherwise(F.array(h(F.array_join(toks, " "))))


def _shingle_xxh64_flat(tok_arrays, shingle_w: int):
    """Vectorized twin of the JVM `_shingle_hash_expr(..., 'xxhash64')`:
    per-doc w-token shingle hashes, flattened in doc order.

    Returns (flat int64 hashes, per-doc shingle counts). Bit-identical to
    `xxhash64(array_join(slice(toks, i, w), ' '))` for every shingle —
    including the JVM null-propagation edge (null token array → the hash
    expression sees a null child and returns the seed, 42). Each doc's
    tokens are joined ONCE; shingle strings are byte SPANS of the joined
    buffer (offsets from token byte lengths), so no per-shingle Python
    string is ever built (the JVM expression allocated a slice array + a
    joined string per position, interpreted per element — measured as the
    dominant MinHash cost)."""
    from ..functions.xxh64 import SPARK_SEED, xxh64_spans
    n_docs = len(tok_arrays)
    joined: list[bytes] = []
    tok_lens: list[np.ndarray] = []
    null_doc = np.zeros(n_docs, dtype=bool)
    for i in range(n_docs):
        t = tok_arrays[i]
        if t is None:
            null_doc[i] = True
            joined.append(b"")
            tok_lens.append(np.empty(0, np.int64))
            continue
        toks = list(t)
        s = " ".join(toks)
        enc = s.encode("utf-8")
        joined.append(enc)
        if len(enc) == len(s):  # pure ASCII: byte length == char length
            tok_lens.append(np.fromiter(map(len, toks), np.int64, len(toks)))
        else:
            tok_lens.append(np.fromiter(
                (len(x.encode("utf-8")) for x in toks), np.int64, len(toks)))
    doc_nt = np.fromiter(map(len, tok_lens), np.int64, n_docs)
    # shingle counts: n-w+1 full shingles, else ONE whole-doc shingle
    n_sh = np.where(doc_nt >= shingle_w, doc_nt - shingle_w + 1, 1)
    doc_lens = np.fromiter(map(len, joined), np.int64, n_docs)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=doc_starts[1:])
    buf = np.frombuffer(b"".join(joined), dtype=np.uint8)

    total = int(n_sh.sum())
    starts = np.empty(total, dtype=np.int64)
    lengths = np.empty(total, dtype=np.int64)
    out_pos = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=out_pos[1:])
    full = np.flatnonzero(doc_nt >= shingle_w)
    short = np.flatnonzero(doc_nt < shingle_w)
    # full docs: token start offsets via per-doc cumsum of (len + 1 sep)
    for i in full:
        tl = tok_lens[i]
        ts = np.zeros(len(tl), dtype=np.int64)
        np.cumsum(tl[:-1] + 1, out=ts[1:])
        k = int(n_sh[i])
        st = ts[:k] + doc_starts[i]
        en = ts[shingle_w - 1:] + tl[shingle_w - 1:] + doc_starts[i]
        starts[out_pos[i]:out_pos[i + 1]] = st
        lengths[out_pos[i]:out_pos[i + 1]] = en - st
    if len(short):
        starts[out_pos[short]] = doc_starts[short]
        lengths[out_pos[short]] = doc_lens[short]
    flat = xxh64_spans(buf, starts, lengths)
    if null_doc.any():
        flat[out_pos[np.flatnonzero(null_doc)]] = SPARK_SEED
    return flat, n_sh


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", shingle_w: int = 3,
                       num_perm: int = 64, seed: int = 42,
                       hash_family: str = "xxhash64",
                       cfg: IndexConfig | None = None) -> DataFrame:
    """MinHash signature per doc over w-token shingles.

    Default ('xxhash64') family: tokens cross to the Python worker once and
    shingle hashing + permutation mins run in ONE vectorized kernel
    (_shingle_xxh64_flat + reduceat) — the previous JVM higher-order
    `transform(sequence, xxhash64(array_join(slice(...))))` evaluated an
    interpreted expression tree per shingle (HOFs don't codegen) and
    dominated the whole LSH pipeline. Hash values are bit-identical
    (functions.xxh64 is an exact Spark-xxhash64 twin). The 'md5' family
    keeps JVM-side hashing — it exists for DuckDB oracle replay."""
    cfg = cfg or IndexConfig()
    a, b = _minhash_params(num_perm, seed, hash_family)
    toks = tokenize_col(text_col, cfg)

    if hash_family != "md5":
        @F.pandas_udf("array<long>")
        def minhash_tok(tok_arrays: pd.Series) -> pd.Series:
            flat, n_sh = _shingle_xxh64_flat(tok_arrays.to_numpy(), shingle_w)
            starts = np.zeros(len(n_sh), dtype=np.int64)
            np.cumsum(n_sh[:-1], out=starts[1:])
            sigs = np.zeros((len(n_sh), num_perm), dtype=np.int64)
            with np.errstate(over="ignore"):
                hv = flat.astype(np.uint64) % np.uint64(MERSENNE)
                au = a.astype(np.uint64)
                bu = b.astype(np.uint64)
                for q in range(num_perm):
                    mq = (au[q] * hv + bu[q]) % np.uint64(MERSENNE)
                    sigs[:, q] = np.minimum.reduceat(mq, starts) \
                        .astype(np.int64)
            return pd.Series(list(sigs))

        return df.select(F.col(id_col), minhash_tok(toks).alias("sig"))

    shingles = _shingle_hash_expr(toks, shingle_w, hash_family)

    @F.pandas_udf("array<long>")
    def minhash(hashes: pd.Series) -> pd.Series:
        # Batch-vectorized: flatten every doc's shingle hashes into ONE
        # array, apply each permutation to the whole batch, and take per-doc
        # mins with minimum.reduceat — no per-doc python loop, one pass per
        # permutation (memory O(total shingles), not O(perms × shingles)).
        lens = np.fromiter((len(h) for h in hashes), np.int64, len(hashes))
        nz = np.flatnonzero(lens)
        sigs = np.zeros((len(hashes), num_perm), dtype=np.int64)
        if len(nz):
            flat = np.concatenate([np.asarray(hashes.iat[i], dtype=np.int64)
                                   for i in nz])
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            # exact int64 math (< 2^59); identical in DuckDB BIGINT
            for q in range(num_perm):
                mq = (a[q] * flat + b[q]) % MERSENNE31
                sigs[nz, q] = np.minimum.reduceat(mq, starts)
        return pd.Series(list(sigs))

    return df.select(F.col(id_col), minhash(shingles).alias("sig"))


def _cap_buckets(banded: DataFrame, keys: list[str],
                 max_bucket_size: int | None,
                 metrics: dict | None = None,
                 name: str = "bucket_cap") -> DataFrame:
    """Drop degenerate LSH buckets (size > cap) before the self-join.

    A corpus with m mass-duplicated docs puts all m in one bucket in EVERY
    band → O(m²) join rows per band; at 100 TB that single hot bucket is the
    job. Capping bounds the join at cap² per bucket. The dropped pairs are
    exact/near-exact duplicate cliques — the standard pipeline removes those
    with exact_dedup first (capping is the common practice trade, e.g.
    Spark MLlib's MinHashLSH leaves it to the caller entirely).

    Dropped work is never silent: pass `metrics` (a dict) and the cap
    attaches a named Observation (reference analog: the tool counts every
    skipped doc, SolrCounters.java:23-39). After any action on the returned
    frame, ``collect_cap_metrics(metrics)`` yields exact counts:
    dropped_rows (banded rows removed), dropped_buckets (distinct
    (band,bucket) groups removed), max_bucket_seen."""
    if max_bucket_size is None:
        return banded
    from pyspark.sql import Window
    w = Window.partitionBy(*keys)
    banded = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
    if metrics is not None:
        from pyspark.sql import Observation
        over = F.col("_bsz") > max_bucket_size
        # one marker row per bucket so dropped_buckets counts groups, not rows
        first = F.row_number().over(w.orderBy(*keys)) == 1
        banded = banded.withColumn("_bfirst", first)
        obs = Observation(name)
        banded = banded.observe(
            obs,
            F.sum(over.cast("long")).alias("dropped_rows"),
            F.sum((over & F.col("_bfirst")).cast("long")).alias("dropped_buckets"),
            F.max("_bsz").alias("max_bucket_seen"))
        metrics[name] = obs
        banded = banded.drop("_bfirst")
    return (banded.where(F.col("_bsz") <= max_bucket_size)
                  .drop("_bsz"))


def collect_cap_metrics(metrics: dict) -> dict[str, dict]:
    """Resolve the cap metrics (Observations or lazy one-row DataFrames)
    into plain dicts — blocking until the observed action has run / running
    the audit aggregation — and log any nonzero drop so truncation is
    visible in operational logs, never silent."""
    import logging
    out: dict[str, dict] = {}
    log = logging.getLogger(__name__)
    for name, obs in metrics.items():
        if isinstance(obs, DataFrame):
            got = {k: (0 if v is None else v)
                   for k, v in obs.first().asDict().items()}
        else:
            got = dict(obs.get)
        out[name] = got
        if got.get("dropped_rows") or got.get("dropped_shingles"):
            log.warning("scale cap '%s' dropped work: %s", name, got)
    return out


def _bucket_pair_candidates(banded: DataFrame, id_col: str,
                            max_bucket_size: int | None,
                            metrics: dict | None = None,
                            name: str = "bucket_cap") -> DataFrame:
    """(band, bucket, id) rows → distinct candidate id pairs via a NARROW
    self-join: only (band, bucket, id) shuffles; payload columns
    (signatures/vectors) are joined back by id afterwards, keeping the
    quadratic join rows as thin as possible. (A per-bucket applyInPandas
    pair enumerator was measured 16x SLOWER here: LSH buckets are mostly
    singletons, and python-worker overhead per tiny group dwarfs the JVM
    join, which handles singletons for free.)"""
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size,
                          metrics, name)
    left = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (left.join(right, ["band", "bucket"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .dropDuplicates(["id_a", "id_b"]))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_w: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.5, seed: int = 42,
                      max_bucket_size: int | None = 5000,
                      hash_family: str = "xxhash64",
                      cfg: IndexConfig | None = None,
                      metrics: dict | None = None) -> DataFrame:
    """Near-dup pairs: band the signatures, bucket-join, verify estimated
    Jaccard (fraction of agreeing permutations) ≥ threshold. Buckets larger
    than max_bucket_size are dropped — pass `metrics` to get exact dropped
    counts (see _cap_buckets / collect_cap_metrics). hash_family='md5'
    makes the whole pipeline DuckDB-replayable (driver oracle)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, shingle_w, num_perm,
                              seed, hash_family, cfg)
    band_str = F.array_join(
        F.transform(F.slice("sig", F.col("band") * rows_per_band + 1,
                            rows_per_band),
                    lambda v: v.cast("string")), ",")
    banded = (sigs.select(F.col(id_col), "sig",
                          F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))
                           .alias("band"))
              .withColumn("bucket",
                          band_str if hash_family == "md5"
                          else F.xxhash64(band_str))
              .select(id_col, "band", "bucket"))
    cand = _bucket_pair_candidates(banded, id_col, max_bucket_size,
                                   metrics, "minhash_bucket_cap")
    # signatures rejoin by id (narrow keys; AQE broadcasts at small scale)
    cand = (cand
            .join(sigs.select(F.col(id_col).alias("id_a"),
                              F.col("sig").alias("sig_a")), "id_a")
            .join(sigs.select(F.col(id_col).alias("id_b"),
                              F.col("sig").alias("sig_b")), "id_b"))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                          lambda v: v)) / F.lit(num_perm)
    return (cand.select("id_a", "id_b", est.alias("est_jaccard"))
                .where(F.col("est_jaccard") >= jaccard_threshold))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, hash_family: str = "xxhash64",
            cfg: IndexConfig | None = None) -> DataFrame:
    """SimHash over tf-weighted token hashes (vectorized kernel). The 'md5'
    family uses 60-bit md5-derived token hashes (pass bits=60) so DuckDB can
    replay the signature bit-identically."""
    cfg = cfg or IndexConfig()
    toks = tokenize_col(text_col, cfg)
    if hash_family == "md5":
        from ..functions.textops import md5_60
        tok_hashes = F.transform(toks, lambda t: md5_60(t))
    else:
        tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))

    @F.pandas_udf("long")
    def sim(hashes: pd.Series) -> pd.Series:
        # Batch-vectorized: one flattened pass per BIT with add.reduceat
        # per-doc popcounts — no per-doc python loop or (tokens × bits)
        # matrix per row.
        lens = np.fromiter((len(h) for h in hashes), np.int64, len(hashes))
        nz = np.flatnonzero(lens)
        out = np.zeros(len(hashes), dtype=np.uint64)
        if len(nz):
            flat = np.concatenate([np.asarray(hashes.iat[i], np.int64)
                                   for i in nz]).view(np.uint64)
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            nzl = lens[nz]
            sig = np.zeros(len(nz), dtype=np.uint64)
            for j in range(bits):
                cnt = np.add.reduceat((flat >> np.uint64(j)) & np.uint64(1),
                                      starts)
                sig |= (2 * cnt > nzl).astype(np.uint64) << np.uint64(j)
            out[nz] = sig
        return pd.Series(out.view(np.int64))

    return df.select(F.col(id_col), sim(tok_hashes).alias("simhash64"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3,
                       max_bucket_size: int | None = 5000,
                       hash_family: str = "xxhash64",
                       cfg: IndexConfig | None = None,
                       metrics: dict | None = None) -> DataFrame:
    """Near-dup pairs by SimHash: 4 bands of 16 bits (pigeonhole: hamming ≤ 3
    ⇒ at least one band identical), bucket join, verify exact hamming.
    The 'md5' family uses 60-bit signatures in 4 bands of 15 bits (same
    pigeonhole guarantee). Buckets larger than max_bucket_size are dropped —
    pass `metrics` for exact dropped counts (see _cap_buckets)."""
    bits = 60 if hash_family == "md5" else 64
    sh = simhash(df, text_col, id_col, bits=bits, hash_family=hash_family,
                 cfg=cfg)
    bands, width = 4, bits // 4
    mask = (1 << width) - 1
    banded = sh.select(
        F.col(id_col), "simhash64",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash64", bi * width).bitwiseAND(F.lit(mask))
            for bi in range(bands)])).alias("band", "bucket"))
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size,
                          metrics, "simhash_bucket_cap")
    left = banded.select(F.col(id_col).alias("id_a"),
                         F.col("simhash64").alias("h_a"), "band", "bucket")
    right = banded.select(F.col(id_col).alias("id_b"),
                          F.col("simhash64").alias("h_b"), "band", "bucket")
    cand = (left.join(right, ["band", "bucket"])
                .where(F.col("id_a") < F.col("id_b"))
                .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (cand.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
                .where(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = 100_000,
                        cfg: IndexConfig | None = None,
                        metrics: dict | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. Candidate generation by shared
    shingle (inverted shingle join — only pairs sharing ≥1 shingle are
    scored), then |A∩B| / (|A|+|B|-|A∩B|) computed relationally. This is the
    exact counterpart the MinHash path approximates.

    Shingles occurring in more than max_shingle_df docs are excluded from
    candidate generation AND intersection counting (boilerplate shared by m
    docs would otherwise yield m² join rows — standard near-dup practice,
    cf. suffix-array dedup df-capping). Results are exact whenever no shared
    shingle exceeds the cap; above it, jaccard is underestimated for pairs
    whose overlap includes hot shingles, so set the cap well above the
    largest legitimate near-dup clique."""
    cfg = cfg or IndexConfig()
    toks = tokenize_col(text_col, cfg)
    nn = F.size(toks)
    shingles = F.array_distinct(
        F.when(nn >= n, F.transform(
            F.sequence(F.lit(1), nn - n + 1),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " "))))
         .otherwise(F.array(F.xxhash64(F.array_join(toks, " ")))))
    sh = df.select(F.col(id_col), shingles.alias("sh"),
                   F.size(shingles).alias("card"))
    ex = sh.select(F.col(id_col), "card", F.explode("sh").alias("g"))
    if max_shingle_df is not None:
        gdf = ex.groupBy("g").agg(F.count(F.lit(1)).alias("_gdf"))
        if metrics is not None:
            # a lazy one-row metrics frame, not an Observation: this plan
            # self-joins the capped frame, and Spark's relation deduplication
            # re-ids one copy of an embedded CollectMetrics node so the
            # observation never fires (verified empirically on Spark 4.1);
            # the recompute here is one shuffle over (shingle, df) pairs and
            # runs only when the caller asks for the audit
            over = F.col("_gdf") > max_shingle_df
            metrics["shingle_df_cap"] = gdf.agg(
                F.sum(over.cast("long")).alias("dropped_shingles"),
                F.sum(F.when(over, F.col("_gdf")).otherwise(0))
                 .cast("long").alias("dropped_occurrences"),
                F.max("_gdf").alias("max_shingle_df_seen"))
        ex = ex.join(gdf.where(F.col("_gdf") <= max_shingle_df).select("g"), "g")
    a = ex.select(F.col(id_col).alias("id_a"), F.col("card").alias("card_a"), "g")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("card").alias("card_b"), "g")
    inter = (a.join(b, "g").where(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b", "card_a", "card_b")
              .agg(F.count(F.lit(1)).alias("inter")))
    jac = (F.col("inter") /
           (F.col("card_a") + F.col("card_b") - F.col("inter")))
    return (inter.select("id_a", "id_b", jac.alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


def _rh_planes(n_planes: int, dim: int, seed: int = 42,
               quantize: int | None = None) -> np.ndarray:
    """Random hyperplanes; with `quantize`, integer-rounded (×quantize) so
    the sign of every dot product is EXACT integer math — the same bits on
    any platform and replayable by the DuckDB oracle (float matmul summation
    order varies between numpy BLAS and SQL engines near zero)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    if quantize:
        return np.round(planes * quantize).astype(np.int64)
    return planes


def embedding_near_pairs(df: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id", threshold: float = 0.9,
                         n_planes: int = 32, bands: int = 8, seed: int = 42,
                         dim: int | None = None,
                         quantize: int | None = None,
                         max_bucket_size: int | None = 5000,
                         metrics: dict | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs. Scale path: banded random-hyperplane
    LSH (bands × (n_planes/bands)-bit signatures: a pair is a candidate if
    ANY band matches, the minhash-banding recall shape) → NARROW bucket join
    on (band, bucket, id) only → vectors rejoined BY ID for the exact float64
    cosine verify. The band join never carries the embedding column: a
    1k-dim float vector shuffled ×bands and duplicated into both join sides
    would be the job's entire shuffle at 100 TB, while id keys are ~16 bytes
    (same economics as minhash_lsh_pairs via _bucket_pair_candidates).
    quantize=Q buckets on integer-rounded vectors/planes so the sign of every
    dot product is exact integer math — platform-independent and
    DuckDB-oracle-replayable; buckets above max_bucket_size are dropped —
    pass `metrics` for exact dropped counts (see _cap_buckets)."""
    assert n_planes % bands == 0
    r = n_planes // bands
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _rh_planes(n_planes, dim, seed, quantize)

    @F.pandas_udf("array<int>")
    def band_sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        if quantize:
            dots = np.round(m * quantize).astype(np.int64) @ planes.T
        else:
            dots = m @ planes.T
        bits = (dots > 0).astype(np.int32)
        out = np.zeros((len(vecs), bands), dtype=np.int32)
        for i in range(n_planes):
            out[:, i // r] |= bits[:, i] << (i % r)
        return pd.Series(list(out))

    banded = df.select(F.col(id_col),
                       F.posexplode(band_sigs(F.col(vec_col)))
                        .alias("band", "bucket"))
    cand = _bucket_pair_candidates(banded, id_col, max_bucket_size,
                                   metrics, "embedding_bucket_cap")
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cand = (cand
            .join(vecs.select(F.col(id_col).alias("id_a"),
                              F.col(vec_col).alias("v_a")), "id_a")
            .join(vecs.select(F.col(id_col).alias("id_b"),
                              F.col(vec_col).alias("v_b")), "id_b"))

    @F.pandas_udf("double")
    def cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        # float64 throughout: float32 accumulation error (~1e-7) would break
        # the oracle's 6-decimal rounding; float64 differs only at ~1e-15
        ma = np.stack(va.to_numpy()).astype(np.float64)
        mb = np.stack(vb.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return (cand.select("id_a", "id_b", cosine("v_a", "v_b").alias("cosine"))
                .where(F.col("cosine") >= threshold))
