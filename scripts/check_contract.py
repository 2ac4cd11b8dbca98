"""Self-check mirroring the driver's verify: run each contract query on
Spark AND its DuckDB oracle at the same sf, compare row-count + columns +
order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from graph_importer_spark import contract as C  # noqa: E402
from graph_importer_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def rowset(cols, rows):
    return sorted("|".join(canon(v) for v in r) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in C.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sql = C.ORACLES.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(sql)
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures.append(name)
            continue
        # reorder duck columns to spark order
        idx = [dcols.index(c) for c in scols]
        drows = [tuple(r[i] for i in idx) for r in drows]
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            continue
        s, d = rowset(scols, srows), rowset(scols, drows)
        if s != d:
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
