"""Text-analysis operators for large-scale training-data pipelines.

All hot-path math is built-in Spark SQL functions (JVM, codegen) over the
token array from functions.analysis; the only Python is the rolling-hash
fingerprint variant (vectorized pandas UDF). Each operator has a DuckDB twin
in __spark_entry__.oracle_sql for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import IndexConfig
from .analysis import tokenize_col

# Small public stopword/marker sets (language-ID heuristic + quality ratio).
EN_STOP = ("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": EN_STOP,
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
}


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     cfg: IndexConfig | None = None) -> DataFrame:
    """Per-doc quality metrics: token counts, mean token length, stopword
    ratio, alpha ratio, and a composite [0,1] quality score."""
    cfg = cfg or IndexConfig()
    toks = tokenize_col(text_col, cfg)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    stop = F.array(*[F.lit(s) for s in EN_STOP])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    # Σ token lengths == length of the zero-separator join: array_join is a
    # regular codegen'd collection function, while the previous
    # F.aggregate(toks, 0, acc+length) higher-order fold ran one interpreted
    # expression eval per token (HOFs don't codegen). Integer-identical.
    tok_chars = F.length(F.array_join(toks, ""))
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.when(n_tokens > 0, (tok_chars / n_tokens)).otherwise(F.lit(0.0))
         .alias("avg_token_len"),
        F.when(n_tokens > 0, (n_stop / n_tokens)).otherwise(F.lit(0.0))
         .alias("stopword_ratio"),
        F.when(n_chars > 0, (alpha_chars / n_chars)).otherwise(F.lit(0.0))
         .alias("alpha_ratio"),
        # composite: reasonable length, alphabetic, not stopword-saturated
        (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
         + F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0)) * F.lit(0.4)
         + (F.lit(1.0) - F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)))
            * F.lit(0.2)).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            cfg: IndexConfig | None = None) -> DataFrame:
    """Marker-token language ID: argmax over languages of distinct-marker
    hits; ties broken alphabetically; no hits → 'und'. Deliberately
    SQL-expressible so DuckDB can replay it exactly."""
    cfg = cfg or IndexConfig()
    toks = F.array_distinct(tokenize_col(text_col, cfg))
    # argmax by (hits desc, lang asc): greatest() over structs compares
    # field-by-field, so each struct carries (hits, rank) where rank is the
    # language's NEGATED position in the explicitly-sorted language list —
    # the tie-break is pinned to alphabetical order by construction and
    # cannot silently flip if LANG_MARKERS gains a language or is reordered.
    langs = sorted(LANG_MARKERS)
    rank = {lang: -i for i, lang in enumerate(langs)}  # a < b ⇒ rank[a] > rank[b]
    best = F.greatest(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])))
             .alias("hits"),
            F.lit(rank[lang]).alias("ord"),
            F.lit(lang).alias("lang"))
        for lang in langs])
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("int").alias("marker_hits"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Token counting three ways: whitespace split, word-regex, and a BPE-ish
    sub-token regex (letter runs / digits / punctuation as separate tokens)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    words = F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                        F.lit("[a-z0-9]+"), 0))
    bpe = F.size(F.regexp_extract_all(F.col(text_col),
                                      F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), 0))
    return df.select(F.col(id_col),
                     ws.cast("long").alias("n_ws_tokens"),
                     words.cast("long").alias("n_word_tokens"),
                     bpe.cast("long").alias("n_bpe_tokens"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                cfg: IndexConfig | None = None) -> DataFrame:
    """Content fingerprint: md5 of the normalized token stream — the exact-dup
    key, SQL-expressible so DuckDB replays it bit-identically."""
    cfg = cfg or IndexConfig()
    norm = F.array_join(tokenize_col(text_col, cfg), " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint_md5"))


def shingle_minmax64(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", w: int = 5,
                     cfg: IndexConfig | None = None) -> DataFrame:
    """Global min/max of xxhash64 over all w-token shingles — a cheap
    edit-robust signature (NOT winnowing: no sliding-window selection; see
    winnow_fingerprints for the real algorithm). Entirely JVM-side."""
    cfg = cfg or IndexConfig()
    toks = tokenize_col(text_col, cfg)
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1))),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, w), " ")))
    return df.select(
        F.col(id_col),
        F.when(n > 0, F.array_min(shingle_hashes)).alias("winnow_min64"),
        F.when(n > 0, F.array_max(shingle_hashes)).alias("winnow_max64"),
        n.cast("long").alias("n_tokens"),
    )


# Backwards-compatible alias for the round-1 name.
winnow_fingerprint = shingle_minmax64


def md5_int(col, nchars: int):
    """Deterministic (4·nchars)-bit hash from the first nchars hex chars of
    md5 — chosen because BOTH Spark and DuckDB can compute it bit-identically
    (DuckDB twin: fold hex digits with list_reduce), unlike xxhash64.
    nchars ≤ 15 keeps it comfortably inside a signed 64-bit int."""
    return F.conv(F.substring(F.md5(col), 1, nchars), 16, 10).cast("long")


def md5_60(col):
    """60-bit md5-derived hash (see md5_int)."""
    return md5_int(col, 15)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3, w: int = 4,
                        cfg: IndexConfig | None = None) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): hash every k-token shingle, slide a window of w consecutive
    hashes, and in each window select the minimum hash (rightmost occurrence
    on ties). The distinct selected (position, hash) pairs are the
    fingerprint — guaranteed to share a selection with any other document
    containing a common run of at least w + k - 1 tokens.

    Output: (id_col, pos, fp) — pos is the 1-based shingle position of each
    selected hash. All JVM-side expressions; the hash is md5-derived so the
    DuckDB oracle replays it exactly."""
    cfg = cfg or IndexConfig()
    toks = tokenize_col(text_col, cfg)
    n = F.size(toks)
    hs = (F.when(n >= k, F.transform(
              F.sequence(F.lit(1), n - k + 1),
              lambda i: md5_60(F.array_join(F.slice(toks, i, k), " "))))
           .otherwise(F.array(md5_60(F.array_join(toks, " ")))))
    base = df.select(F.col(id_col), hs.alias("hs"))
    m = F.size("hs")

    def _sel(j):
        sl = F.slice("hs", j, w)
        # global position of the rightmost minimum within window j
        pos = (j + F.size(sl)
               - F.array_position(F.reverse(sl), F.array_min(sl))).cast("int")
        return F.struct(pos.alias("pos"), F.array_min(sl).alias("fp"))

    sels = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(m - w + 1, F.lit(1))), _sel))
    return (base.select(F.col(id_col), F.explode(sels).alias("s"))
                .select(id_col, F.col("s.pos").alias("pos"),
                        F.col("s.fp").alias("fp")))
