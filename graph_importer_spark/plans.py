"""Physical-plan audit helpers: make plan hygiene assertable.

The scale rules this repo builds to (SCALE.md) are properties of the
PHYSICAL plan — filters reaching the parquet scan, projections pruning
the read schema, no accidental nested-loop joins, no surprise
shuffles.  These helpers turn each property into a string/number a test
can assert, so the rules survive refactors instead of living in
docstrings (several operator tests already assert `"Exchange" not in
plan` by hand; this is that idiom, named).

All helpers are driver-side string inspection of the executed plan —
no jobs run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — scans report PushedFilters/ReadSchema
    here."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) operators.  A
    narrow operator asserts 0; a one-shuffle aggregate asserts what it
    budgets for."""
    return len(re.findall(r"\bExchange\b", physical_plan(df)))


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (hash/range partitioning), excluding
    broadcast exchanges — the ones that move the big side."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


def has_nested_loop_join(df: DataFrame) -> bool:
    """True if the plan contains BroadcastNestedLoopJoin or
    CartesianProduct — the joins that explode at scale unless the
    shape is deliberate (labeled brute-force baselines)."""
    plan = physical_plan(df)
    return "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every file scan in the plan
    (flattened).  Empty list = nothing pushed — wrong for any plan that
    filters on a scanned column."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema struct strings of every file scan — assert a
    column is ABSENT to prove pruning (a scan reading all columns for
    a 2-column projection is wrong)."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))
    ]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans.  Fewer, wider spans = more of
    the plan fused into generated JVM code.  (The plan's toString
    renders a span as a `*(n)` operator prefix; formatted explain as
    `WholeStageCodegen (n)` — count both.)  Under AQE the markers only
    appear once the plan is FINAL — trigger the query (e.g. a cheap
    collect) before counting, or the answer is 0."""
    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def python_eval_count(df: DataFrame) -> int:
    """Row-at-a-time Python operators in the plan (BatchEvalPython).
    The hot paths in this repo assert 0; Arrow-batched pandas UDFs show
    up as ArrowEvalPython / MapInPandas instead and are the sanctioned
    escape hatch."""
    return len(re.findall(r"BatchEvalPython", physical_plan(df)))
