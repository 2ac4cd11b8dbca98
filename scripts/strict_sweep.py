"""Strict oracle sweep: pandas-`astype(str)` comparison of every
contract query against its DuckDB oracle — STRICTER than
check_contract.py's canon.

Why both exist: duckdb's fetchall() converts HUGEINT (the type SUM
returns over BIGINT) to Python int, so check_contract's str() canon
silently agrees with Spark's int64; the pandas `.df()` path converts
HUGEINT to float64 instead, and a driver that compares through pandas
sees '750.0' vs '750'.  This sweep replays that failure mode, so any
oracle whose surfaced aggregate forgets a CAST(... AS BIGINT) fails
HERE before it can fail in the round driver (found eval_auc in round
4, session 7).

Usage: python scripts/strict_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from graph_importer_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    bad = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf).toPandas()
            sql = e.oracle_sql().get(name)
            if sql is None:
                print(name, "rows-only", len(df), flush=True)
                continue
            od = con.sql(sql).df()
            cols = sorted(df.columns)
            a = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
            b = od[sorted(od.columns)]
            b.columns = cols
            b = b.astype(str).sort_values(cols).reset_index(drop=True)
            ok = len(a) == len(b) and a.equals(b)
            print(name, "MATCH" if ok else "MISMATCH", len(a), len(b), flush=True)
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001
            print(name, "ERROR", type(ex).__name__, str(ex)[:200], flush=True)
            bad.append(name)
    print("BAD:", bad, flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
