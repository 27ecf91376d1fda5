"""Driver-contract self-check: run every queries() entry at a given sf and
compare against oracle_sql() via DuckDB exactly like the driver does
(row count + schema-insensitive sorted-value compare). Usage:

    python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str) -> int:
    import importlib.util as u
    spec = u.spec_from_file_location("entrymod", os.path.join(REPO, "__spark_entry__.py"))
    entry = u.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from solr_mapreduce_indexer_spark.session import get_spark
    spark = get_spark(app="check_entry", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            if len(got) == 0 and name != "bm25_empty":
                print(f"  WARN {name}: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)} ({dt:.1f}s)")
            failures += 1
            continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        mismatched = []
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]) and pd.api.types.is_float_dtype(w[c]):
                ok = np.allclose(g[c].fillna(0), w[c].fillna(0), atol=1e-6)
            else:
                ok = g[c].equals(w[c])
            if not ok:
                mismatched.append(c)
        if mismatched:
            print(f"FAIL  {name}: value mismatch in {mismatched} ({dt:.1f}s)")
            for c in mismatched[:2]:
                diff = g[c] != w[c]
                print(f"  sample got={g.loc[diff, c].head(3).tolist()} "
                      f"want={w.loc[diff, c].head(3).tolist()}")
            failures += 1
        else:
            print(f"OK    {name}: {len(g)} rows ({dt:.1f}s)")
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
