"""Registry-wide output-shape guard: every contract query must emit
only driver-hashable scalar columns, and its DuckDB oracle must bind to
the same type KIND column-by-column.

Why this exists (CORRECTNESS_r04 post-mortem): the round driver
compares Spark and DuckDB results through pandas.  Two failure classes
slipped past the fetchall()-based local checker:

1. array/map/struct columns — pandas ``sort_values`` cannot factorize
   list cells (``TypeError: unhashable type: 'list'`` — the
   emb_whiten / text_stem driver errors);
2. type-KIND drift — DuckDB's ``SUM(integer)`` returns HUGEINT, which
   the pandas bridge renders as float64 (``'1507.0'``) while Spark's
   bigint renders ``'1507'`` (the kg_transe_rank / text_fertility hash
   mismatches), and bare decimal literals (``0.5 AS frac``) bind as
   DECIMAL against Spark's double.

Both classes are visible WITHOUT executing anything: Spark DataFrame
construction yields the schema lazily, and a DuckDB relation binds its
result types lazily, so this test sweeps all ~290 registry entries in
seconds-per-hundred rather than a full materialized run.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as ST

from graph_importer_spark import contract as C

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _spark_kind(dt) -> str:
    if isinstance(dt, (ST.ArrayType, ST.MapType, ST.StructType)):
        return "COMPLEX"
    if isinstance(dt, (ST.DoubleType, ST.FloatType)):
        return "float"
    if isinstance(dt, ST.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(
        dt, (ST.LongType, ST.IntegerType, ST.ShortType, ST.ByteType)
    ):
        return "int"
    if isinstance(dt, ST.BooleanType):
        return "bool"
    if isinstance(dt, ST.StringType):
        return "str"
    if isinstance(dt, ST.TimestampType):
        return "ts"
    if isinstance(dt, ST.DateType):
        return "date"
    if isinstance(dt, ST.BinaryType):
        return "bin"
    return str(dt)


def _duck_kind(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal" + s[7:].lower()
    if s in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"
    if s in (
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    ):
        return "int"
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "str"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "DATE":
        return "date"
    if s == "BLOB":
        return "bin"
    if (
        s.endswith("[]")
        or s.startswith("STRUCT")
        or s.startswith("MAP")
        or s.startswith("LIST")
    ):
        return "COMPLEX"
    return s


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_registry_outputs_driver_hashable(spark, sf_dir, duck):
    problems: list[str] = []
    for name, fn in C.QUERIES.items():
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — collect, don't abort
            problems.append(f"{name}: spark build error {e!r}")
            continue
        skinds = {
            f.name.lower(): _spark_kind(f.dataType)
            for f in sdf.schema.fields
        }
        for c, k in skinds.items():
            if k == "COMPLEX":
                problems.append(
                    f"{name}.{c}: array/map/struct output (driver "
                    f"comparator cannot hash list cells)"
                )
        sql = C.ORACLES.get(name)
        if sql is None:
            continue  # rows-only contract entry
        try:
            rel = duck.sql(sql)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: oracle bind error {e!r}")
            continue
        dkinds = dict(
            zip(
                [c.lower() for c in rel.columns],
                [_duck_kind(t) for t in rel.types],
            )
        )
        for c, sk in skinds.items():
            dk = dkinds.get(c)
            if dk is None:
                problems.append(f"{name}.{c}: missing from oracle output")
            elif dk == "HUGEINT":
                problems.append(
                    f"{name}.{c}: oracle HUGEINT (pandas renders float64"
                    f" vs Spark {sk}) — CAST(... AS BIGINT)"
                )
            elif sk != dk and not (sk == "COMPLEX" and dk == "COMPLEX"):
                problems.append(
                    f"{name}.{c}: type-kind drift spark={sk} duck={dk}"
                )
    assert not problems, "\n".join(problems)
