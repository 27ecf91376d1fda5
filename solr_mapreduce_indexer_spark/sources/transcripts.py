"""Transcripts source: the engine's primary input table.

Authoritative shape (BASELINE.json input_hint):
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Two providers:

* ``read_transcripts(spark, path)`` — production path: Iceberg table if the
  catalog is available, else plain parquet with the same schema (the sandbox
  image ships no Iceberg jars; reader is behind one function per SURVEY §7.0).
* ``synth_transcripts(spark, ...)`` — deterministic seeded generator (Zipfian
  vocabulary so hot-term skew is real, planted needle terms for golden
  queries); replaces the reference's HDFS file-list enumeration
  (MorphlineEnabledIndexerTool.java:202-258) — rows, not files, are the unit.
* ``transcripts_from_documents`` — derives a transcripts-shaped table
  deterministically from the driver-provided ``documents`` parquet with
  SQL-expressible transforms only, so DuckDB can reproduce it for oracle
  checks (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["bash", "search", "browser", "python", "editor", "sql", "fetch", "calc"]
# Needle terms planted at controlled positions for golden queries.
NEEDLES = ["zyzzyva", "quokkajoin", "xylophonic", "warpspindle"]


def zipf_vocab(size: int = 10_000) -> list[str]:
    return [f"tok{i:05d}" for i in range(size)]


def synth_transcripts_pandas(n_convs: int = 1000, turns_per_conv: int = 10,
                             vocab_size: int = 10_000, zipf_s: float = 1.1,
                             seed: int = 42,
                             conflict_frac: float = 0.0) -> pd.DataFrame:
    """Deterministic transcripts fixture (FIXTURES.md §1/§2). When
    conflict_frac > 0, ~that fraction of (conv_id, turn_idx) keys appear 2-4
    times with differing text and strictly increasing ts (dedup fixture)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(zipf_vocab(vocab_size))
    # Zipf ranks via inverse-CDF over a truncated zeta distribution.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()

    n = n_convs * turns_per_conv
    conv = np.repeat(np.arange(n_convs), turns_per_conv)
    turn = np.tile(np.arange(turns_per_conv), n_convs)
    lens = rng.integers(5, 81, size=n)
    total_toks = int(lens.sum())
    toks = rng.choice(vocab, size=total_toks, p=probs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    texts = [" ".join(toks[offsets[i]:offsets[i + 1]]) for i in range(n)]
    # plant needles deterministically: needle k appears in rows k, 3k+7, ...
    for k, needle in enumerate(NEEDLES):
        for row in range(k, n, max(97, n // 23 + 1)):
            texts[row] = texts[row] + " " + needle

    roles = np.array(_ROLES)[turn % 3]
    tools = np.where(roles == "tool",
                     np.array(_TOOLS)[conv % len(_TOOLS)], None)
    base = pd.Timestamp("2024-01-01", tz=None)
    # wrap the per-conversation day offset so ts fits timedelta64[ns] at any
    # corpus size (conv*86400s overflows past ~100k convs); identical values
    # below 40k convs, and within-conversation ordering is always preserved
    ts = base + pd.to_timedelta((conv % 40_000) * 86_400 + turn * 60, unit="s")

    pdf = pd.DataFrame({
        "conv_id": [f"conv{c:08d}" for c in conv],
        "turn_idx": turn.astype(np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    })

    if conflict_frac > 0:
        k = max(1, int(n * conflict_frac))
        dup_rows = rng.choice(n, size=k, replace=False)
        extra = []
        for i, r in enumerate(sorted(dup_rows.tolist())):
            copies = 2 + (i % 3)  # 2..4 total versions
            for c in range(1, copies):
                row = pdf.iloc[r].copy()
                row["text"] = row["text"] + f" rev{c}"
                # half get increasing ts, a controlled subset identical ts
                if i % 5 != 0:
                    row["ts"] = row["ts"] + pd.Timedelta(seconds=c)
                extra.append(row)
        pdf = pd.concat([pdf, pd.DataFrame(extra)], ignore_index=True)
        pdf = pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)

    return pdf


def synth_transcripts(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(synth_transcripts_pandas(**kw), schema=TRANSCRIPT_SCHEMA)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """One entry point per SURVEY §7.0; format by path prefix.

    The reference ingests Avro/CSV/JSON/SequenceFile/… through pluggable
    morphline decoders (MapReduceIndexerToolArgumentParser.java:74-86); here
    the analog is Spark's built-in readers, all normalized to
    TRANSCRIPT_SCHEMA:

      iceberg:<table>   Iceberg catalog table
      csv:<path>        header CSV
      json:<path>       JSON lines
      avro:<path>       Avro (needs the spark-avro package on the cluster)
      <path>            parquet (default)
    """
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:"):])
    if path.startswith("csv:"):
        return (spark.read.schema(TRANSCRIPT_SCHEMA)
                .option("header", "true").csv(path[len("csv:"):]))
    if path.startswith("json:"):
        return spark.read.schema(TRANSCRIPT_SCHEMA).json(path[len("json:"):])
    if path.startswith("avro:"):
        return (spark.read.format("avro").schema(TRANSCRIPT_SCHEMA)
                .load(path[len("avro:"):]))
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def apply_field_overrides(df: DataFrame, overrides: dict[str, str]) -> DataFrame:
    """Force literal field values onto every document before indexing — the
    reference's forced header overrides (MorphlineMapRunner.java:84-93, the
    MAPPER-generated fields each mapper stamps on every record). Values are
    cast to the column's existing type when the column already exists."""
    for field, value in overrides.items():
        if field in df.columns:
            df = df.withColumn(
                field, F.lit(value).cast(df.schema[field].dataType))
        else:
            df = df.withColumn(field, F.lit(value))
    return df


# SQL-expressible derivation of a transcripts table from the driver's
# `documents` parquet — identical in Spark and DuckDB so the driver's oracle
# can check any transcript-shaped query end to end.
TRANSCRIPTS_FROM_DOCUMENTS_SQL = """
    SELECT
      'conv' || CAST(doc_id // 8 AS VARCHAR)          AS conv_id,
      CAST(doc_id % 8 AS INTEGER)                     AS turn_idx,
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'user'
           WHEN 1 THEN 'assistant' ELSE 'tool' END    AS role,
      text                                            AS text,
      CASE WHEN doc_id % 3 = 2 THEN source ELSE NULL END AS tool,
      TIMESTAMP '2024-01-01 00:00:00'
        + to_seconds(doc_id * 60)                     AS ts
    FROM documents
"""


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("conv"), (F.col("doc_id") / 8).cast("long").cast("string")).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                     (F.col("doc_id") % 3).cast("int") + 1).alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 2, F.col("source")).alias("tool"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id") * 60)).alias("ts"),
    )
