"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count, column names, and an order-insensitive
value hash. Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    import hashlib

    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(norm_cell(r[c]) for c in cols)
        for _, r in pdf.iterrows()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dbpedia_spotlight_db_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails, okays, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            fails.append((name, f"spark error: {e}"))
            print(f"FAIL  {name:24s} spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name:24s} rows={len(got)} (no oracle by design)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            fails.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name:24s} duckdb error: {str(e)[:200]}")
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        elif frame_hash(got) != frame_hash(exp):
            problems.append("value-hash mismatch")
        if problems:
            fails.append((name, "; ".join(problems)))
            print(f"FAIL  {name:24s} {'; '.join(problems)}")
        else:
            okays.append(name)
            print(f"ok    {name:24s} rows={len(got)}")
    print(
        f"\n{len(okays)} ok, {len(rows_only)} rows-only, {len(fails)} FAILED"
    )
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
