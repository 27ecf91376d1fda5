"""DuckDB oracle-SQL generators for the engine's hash kernels.

The driver's correctness gate runs each queries() entry against an ANSI-SQL
twin in DuckDB. Most operators are plain SQL, but four kernels are
hash-based; this module generates DuckDB SQL that replays them BIT-IDENTICALLY
so they get full rows+schema+hash oracle rows instead of rows-only checks:

* murmur3_x86_32 + SolrCloud hash-range routing (functions/routing.py) —
  expressed as a CTE chain over per-byte lists with list_reduce for the
  4-byte block mixing loop; all arithmetic in UBIGINT masked to 32 bits.
* md5-derived fixed-width integer hashes (functions/textops.md5_int) —
  fold the md5 hex prefix with list_reduce.
* Winnowing fingerprints (functions/textops.winnow_fingerprints).
* MinHash+LSH / SimHash near-dup pairs in their 'md5' hash family
  (operators/dedupe_ops.py): the permutation constants are embedded as SQL
  literals; 28-bit shingle hashes × 31-bit constants keep (a*h+b) % p exact
  in BIGINT on both sides.

Everything here is generation-time Python string assembly — no Spark, no
DuckDB imports (the driver owns the DuckDB session).
"""

from __future__ import annotations

M32 = "4294967295"  # 2^32 - 1


def _rotl(x: str, r: int) -> str:
    return f"(((({x}) << {r}) | (({x}) >> {32 - r})) & {M32})"


def _mix_k(k: str) -> str:
    k1 = f"((({k}) * 3432918353) & {M32})"        # * c1 (0xCC9E2D51)
    return f"((({_rotl(k1, 15)}) * 461845907) & {M32})"  # rotl15, * c2


_H_STEP = f"((({_rotl('xor(h, ' + _mix_k('kk') + ')', 13)}) * 5 + 3864292196) & {M32})"

_TAIL_K = ("(CASE WHEN n % 4 >= 3 THEN bs[4*(n//4)+3] * 65536 ELSE 0 END"
           " + CASE WHEN n % 4 >= 2 THEN bs[4*(n//4)+2] * 256 ELSE 0 END"
           " + bs[4*(n//4)+1])")


def murmur3_cte(src: str, key_expr: str) -> str:
    """CTE chain (to splice after WITH) computing murmur3_x86_32(key, seed=0)
    of `key_expr` over rows of `src`. Exposes mm_out with columns of src plus
    h32 (unsigned 32-bit) and hs (signed int32, JVM-compatible). Validated
    byte-for-byte against the scalar public-domain reference implementation
    (query/oracle.py murmur3_scalar) in tests/test_oracle_sql.py."""
    return f"""
mm_k1 AS (SELECT *, ({key_expr}) AS _mkey FROM {src}),
mm_k2 AS (SELECT *, length(_mkey)::BIGINT AS n,
            list_transform(range(1, length(_mkey) + 1),
                           i -> ord(substr(_mkey, i::INT, 1))::UBIGINT) AS bs
          FROM mm_k1),
mm_k3 AS (SELECT *,
            list_reduce(
              list_prepend(0::UBIGINT,
                list_transform(range(0, n // 4), j ->
                  bs[4*j+1] + bs[4*j+2]*256 + bs[4*j+3]*65536 + bs[4*j+4]*16777216)),
              (h, kk) -> {_H_STEP}) AS hbody
          FROM mm_k2),
mm_k4 AS (SELECT *, CASE WHEN n % 4 = 0 THEN hbody
                         ELSE xor(hbody, {_mix_k(_TAIL_K)}) END AS htail
          FROM mm_k3),
mm_k5 AS (SELECT *, xor(htail, n::UBIGINT) AS hx FROM mm_k4),
mm_k6 AS (SELECT *, ((xor(hx, hx >> 16)) * 2246822507 & {M32}) AS f2 FROM mm_k5),
mm_k7 AS (SELECT *, ((xor(f2, f2 >> 13)) * 3266489909 & {M32}) AS f4 FROM mm_k6),
mm_out AS (SELECT *, xor(f4, f4 >> 16) AS h32,
             (CASE WHEN xor(f4, f4 >> 16) >= 2147483648
                   THEN xor(f4, f4 >> 16)::BIGINT - 4294967296
                   ELSE xor(f4, f4 >> 16)::BIGINT END) AS hs
           FROM mm_k7)"""


def routing_counts_sql(transcripts_sql: str, shards: int, partitions: int) -> str:
    """Micro-shard routing histogram: murmur3 over 'conv_id#turn_idx' →
    SolrCloud hash-range root slice → micro offset (SolrCloudPartitioner
    semantics, functions/routing.py route_keys)."""
    step = (2**32 - 1) // shards
    per = partitions // shards
    return f"""
        WITH tr AS ({transcripts_sql}),
        {murmur3_cte("tr", "conv_id || '#' || CAST(turn_idx AS VARCHAR)")}
        SELECT (least(((h32 + 2147483648) % 4294967296) // {step}, {shards - 1})
                  * {per}
                + (hs & 2147483647) % {per})::INT AS shard_id,
               count(*)::BIGINT AS n_docs
        FROM mm_out GROUP BY 1 ORDER BY 1
    """


def md5_int_sql(expr: str, nchars: int) -> str:
    """DuckDB twin of functions/textops.md5_int: integer value of the first
    nchars hex chars of md5(expr)."""
    # NB: the lambda variable must not collide with variables of enclosing
    # comprehensions/lambdas the caller splices this into (DuckDB lambda
    # scoping shadows outer names) — hence the reserved-looking __hx/__ha/__hb
    return (f"list_reduce(list_transform(range(1, {nchars + 1}), "
            f"__hx -> (strpos('0123456789abcdef', substr(md5({expr}), __hx::INT, 1))"
            f" - 1)::BIGINT), (__ha, __hb) -> __ha * 16 + __hb)")


def shingle_hashes_sql(toks: str, w: int, nchars: int) -> str:
    """List of md5-derived w-token shingle hashes over a token-list expr
    (twin of operators/dedupe_ops._shingle_hash_expr, md5 family)."""
    # coalesce: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
    joined = f"coalesce(array_to_string({toks}[i:i+{w - 1}], ' '), '')"
    whole = f"coalesce(array_to_string({toks}, ' '), '')"
    return (f"CASE WHEN len({toks}) >= {w} THEN "
            f"[{md5_int_sql(joined, nchars)} "
            f"for i in range(1, len({toks}) - {w} + 2)] "
            f"ELSE [{md5_int_sql(whole, nchars)}] END")


def winnow_sql(tokenize_sql: str, k: int, w: int) -> str:
    """Twin of functions/textops.winnow_fingerprints: per-window rightmost
    minimum of md5-60 k-gram hashes → distinct (doc_id, pos, fp)."""
    sl = f"hs[j:j+{w - 1}]"
    return f"""
        WITH t AS (SELECT doc_id, {tokenize_sql} AS toks FROM documents),
        h AS (SELECT doc_id, {shingle_hashes_sql("toks", k, 15)} AS hs FROM t),
        sel AS (SELECT doc_id, [
                  {{'pos': (j + len({sl})
                            - list_position(list_reverse({sl}), list_min({sl})))::INT,
                    'fp': list_min({sl})}}
                  for j in range(1, greatest(len(hs) - {w} + 1, 1) + 1)] AS sels
                FROM h)
        SELECT DISTINCT doc_id, unnest(sels, recursive := true) FROM sel
    """


def _cap_qualify(max_bucket_size) -> str:
    """Mirror of operators/dedupe_ops._cap_buckets for the banded CTEs:
    engine and oracle must drop the SAME degenerate buckets, else a corpus
    with any bucket over the cap silently diverges."""
    if max_bucket_size is None:
        return ""
    return (f" QUALIFY count(*) OVER (PARTITION BY band, bucket)"
            f" <= {int(max_bucket_size)}")


def minhash_pairs_sql(tokenize_sql: str, shingle_w: int, num_perm: int,
                      bands: int, threshold: float,
                      a, b, max_bucket_size: int | None = 5000) -> str:
    """Twin of operators/dedupe_ops.minhash_lsh_pairs(hash_family='md5'):
    28-bit md5 shingle hashes, embedded permutation constants a/b (the same
    numpy-seeded values the Spark kernel uses), (a*h+b) % (2^31-1) mins,
    band-string buckets, bucket-size cap, estimated-Jaccard verify."""
    rpb = num_perm // bands
    a_lit = "[" + ", ".join(str(int(x)) for x in a) + "]"
    b_lit = "[" + ", ".join(str(int(x)) for x in b) + "]"
    return f"""
        WITH t AS (SELECT doc_id, {tokenize_sql} AS toks FROM documents),
        sh AS (SELECT doc_id, {shingle_hashes_sql("toks", shingle_w, 7)} AS gs
               FROM t),
        sig AS (SELECT doc_id,
                  list_transform(range(1, {num_perm + 1}), q ->
                    list_min(list_transform(gs, s ->
                      ({a_lit}[q::INT] * s + {b_lit}[q::INT]) % 2147483647)))
                  AS sig
                FROM sh),
        banded AS (SELECT doc_id, sig, band,
                     array_to_string(sig[band*{rpb}+1:band*{rpb}+{rpb}], ',') AS bucket
                   FROM sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) bx
                   {_cap_qualify(max_bucket_size)}),
        cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                        l.sig AS sig_a, r.sig AS sig_b
                 FROM banded l JOIN banded r
                   ON l.band = r.band AND l.bucket = r.bucket
                  AND l.doc_id < r.doc_id)
        SELECT id_a, id_b,
               len(list_filter(range(1, {num_perm + 1}),
                               i -> sig_a[i::INT] = sig_b[i::INT]))::DOUBLE
                 / {num_perm} AS est_jaccard
        FROM cand
        WHERE len(list_filter(range(1, {num_perm + 1}),
                              i -> sig_a[i::INT] = sig_b[i::INT]))::DOUBLE
                / {num_perm} >= {threshold}
    """


def embedding_pairs_sql(threshold: float, planes, quantize: int,
                        bands: int,
                        max_bucket_size: int | None = 5000) -> str:
    """Twin of operators/dedupe_ops.embedding_near_pairs(quantize=Q):
    banded integer-quantized random-hyperplane LSH (signs are exact integer
    dot products on both sides), any-band bucket join with bucket-size cap,
    float64 cosine verify. `planes` is the integer plane matrix the Spark
    kernel uses (embedded literally)."""
    n_planes, dim = planes.shape
    r = n_planes // bands
    plane_lits = ["[" + ", ".join(str(int(x)) for x in p) + "]" for p in planes]
    dot = ("list_sum(list_transform(range(1, {d} + 1), "
           "__di -> qv[__di::INT] * {plane}[__di::INT]))")
    band_exprs = []
    for bi in range(bands):
        terms = " + ".join(
            f"(CASE WHEN {dot.format(d=dim, plane=plane_lits[bi * r + j])} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(r))
        band_exprs.append(f"({terms})::INT")
    buckets = "[" + ", ".join(band_exprs) + "]"
    return f"""
        WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_transform(embedding::DOUBLE[],
                                    x -> round(x * {quantize})::BIGINT) AS qv
                   FROM embeddings),
        sg AS (SELECT vec_id, v, {buckets} AS bks FROM q),
        banded AS (SELECT vec_id, v, band, bks[band + 1] AS bucket
                   FROM sg CROSS JOIN
                     (SELECT unnest(range(0, {bands})) AS band) bx
                   {_cap_qualify(max_bucket_size)}),
        cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
                        l.v AS v_a, r.v AS v_b
                 FROM banded l JOIN banded r
                   ON l.band = r.band AND l.bucket = r.bucket
                  AND l.vec_id < r.vec_id),
        sc AS (SELECT id_a, id_b,
                 list_dot_product(v_a, v_b)
                   / (sqrt(list_dot_product(v_a, v_a))
                      * sqrt(list_dot_product(v_b, v_b))) AS cosine
               FROM cand)
        SELECT id_a, id_b, round(cosine, 6) AS cosine
        FROM sc WHERE cosine >= {threshold}
    """


def simhash_pairs_sql(tokenize_sql: str, max_hamming: int,
                      max_bucket_size: int | None = 5000) -> str:
    """Twin of operators/dedupe_ops.simhash_near_pairs(hash_family='md5'):
    60-bit tf-weighted SimHash from md5-60 token hashes, 4×15-bit pigeonhole
    bands with bucket-size cap, exact hamming verify."""
    bits, bands, width = 60, 4, 15
    mask = (1 << width) - 1
    return f"""
        WITH t AS (SELECT doc_id, {tokenize_sql} AS toks FROM documents),
        h AS (SELECT doc_id,
                list_transform(toks, tk -> {md5_int_sql("tk", 15)}) AS hs
              FROM t),
        sg AS (SELECT doc_id,
                 list_sum(list_transform(range(0, {bits}), j ->
                   CASE WHEN 2 * len(list_filter(hs, v -> (v >> j) & 1 = 1))
                             > len(hs)
                        THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS sig
               FROM h),
        banded AS (SELECT doc_id, sig,
                     band, (sig >> (band * {width})) & {mask} AS bucket
                   FROM sg CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) bx
                   {_cap_qualify(max_bucket_size)}),
        cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                        l.sig AS s_a, r.sig AS s_b
                 FROM banded l JOIN banded r
                   ON l.band = r.band AND l.bucket = r.bucket
                  AND l.doc_id < r.doc_id)
        SELECT id_a, id_b, bit_count(xor(s_a, s_b))::INT AS hamming
        FROM cand WHERE bit_count(xor(s_a, s_b)) <= {max_hamming}
    """
