"""Deterministic synthetic-graph generators (reference parity).

Reference surface (/root/reference/generator.py:63-79): graphtype in
{clique, cliques-graph, k-partite} (+ tournament edges,
clique_generator.py:100-136).  The reference builds these with
``random.*`` per row in forked OS processes (clique_generator.py:168-246
multiprocessing fan-out; balanced triangular split :216-229) and bulk
HTTP inserts.  Here each generator is ONE declarative DataFrame job:

* the triangular all-pairs i<j clique (J1) is id-arithmetic
  ``explode(sequence(i+1, n-1))`` — O(n^2) output rows but ZERO shuffle
  (the reference forks cpu_count() processes for exactly this; Spark
  partitions the range scan itself, so the O2 'school math' balancing
  is unnecessary);
* cliques-graph / k-partite use a members self-join co-partitioned on
  clique id;
* randomness (sizes, missing-edge Bernoulli trials, tournament coin) is
  a multiplicative-congruential hash of the row key — deterministic,
  partition-invariant, AND expressible in ANSI SQL so the DuckDB oracle
  can reproduce the generator bit-for-bit (xxhash64 would not be).
  The reference's ``yes_with_prob`` quantizes to 1/1000 and its
  ``random.*`` output is irreproducible across runs (general.py:158-159,
  SURVEY.md §7 quirk 6) — both deliberately not replicated.

Output: edges (src long, dst long [, weight]) and vertices (id long
[, part]) — feed materialize.triples_to_graph / GraphSpec for the
ArangoDB-contract form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_M = 1000003  # prime modulus for the unit-interval hash
_M2 = 999983  # second coprime prime: CRT pair (k%M, k%M2) stays injective to ~10^12
_A = 2654435761  # Knuth multiplicative constant


def _unit(key, seed: int):
    """Deterministic unit-interval value in [0,1) from an int column.

    ((key % M) * A + seed) % M / M — bounded intermediates (no int64
    overflow under ANSI mode), same formula replayable in DuckDB.
    """
    return (F.pmod(F.pmod(key, F.lit(_M)) * F.lit(_A) + F.lit(seed), F.lit(_M))) / F.lit(
        float(_M)
    )


def clique_edges(
    spark: SparkSession, n: int, prob_missing: float = 0.0, seed: int = 42
) -> DataFrame:
    """All pairs i<j over [0,n) (reference J1,
    clique_generator.py:19-57), each kept w.p. 1-prob_missing.

    Plan: range scan -> explode(sequence) — narrow, no join, no shuffle.
    """
    r = spark.range(n).withColumnRenamed("id", "src")
    e = r.filter(F.col("src") < n - 1).select(
        "src", F.explode(F.sequence(F.col("src") + 1, F.lit(n - 1))).alias("dst")
    )
    if prob_missing > 0:
        key = F.col("src") * F.lit(n) + F.col("dst")
        e = e.filter(_unit(key, seed) >= prob_missing)
    return e


def tournament_edges(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Each pair i<j oriented by a deterministic coin (reference F5,
    clique_generator.py:100-136)."""
    pairs = clique_edges(spark, n)
    coin = _unit(F.col("src") * F.lit(n) + F.col("dst"), seed)
    return pairs.select(
        F.when(coin < 0.5, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(coin < 0.5, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def _parts(
    spark: SparkSession, num_parts: int, min_size: int, max_size: int, seed: int
) -> DataFrame:
    """(part, size, offset, id) member table with contiguous global ids
    (reference CliquesHelper offset bookkeeping, helper_classes.py:92-113,
    as a prefix-sum window instead of driver state)."""
    span = max_size - min_size + 1
    parts = spark.range(num_parts).select(
        F.col("id").alias("part"),
        (F.lit(min_size) + F.pmod(F.pmod("id", F.lit(_M)) * F.lit(_A) + F.lit(seed), F.lit(span))).alias("size"),
    )
    w = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
    parts = parts.withColumn("offset", F.coalesce(F.sum("size").over(w), F.lit(0)))
    return parts.select(
        "part",
        "size",
        "offset",
        F.explode(F.sequence(F.col("offset"), F.col("offset") + F.col("size") - 1)).alias("id"),
    )


def _part_pair_edges(
    members: DataFrame,
    num_parts: int,
    prob_missing_all: float = 0.0,
    prob_missing_one: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Inter-part edges in the scalable shape shared by cliques-graph and
    k-partite (J4, edges_generator.py:99-180): the theta join (p1 < p2)
    runs on the PART-LEVEL frame (num_parts rows — a broadcast nested
    loop over a dim that fits in one packet), then members expand via two
    equi-joins on the part id.  Never a member-level BNLJ: the O(n^2)
    cost is output rows only, every join is hash/broadcast."""
    cl = members.select("part").distinct()
    cpairs = cl.select(F.col("part").alias("p1")).join(
        cl.select(F.col("part").alias("p2")), F.col("p1") < F.col("p2")
    )
    if prob_missing_all > 0:
        ckey = F.col("p1") * F.lit(num_parts) + F.col("p2")
        cpairs = cpairs.filter(_unit(ckey, seed + 1) >= prob_missing_all)
    a = members.select(F.col("part").alias("p1"), F.col("id").alias("src"))
    b = members.select(F.col("part").alias("p2"), F.col("id").alias("dst"))
    inter = cpairs.join(a, "p1").join(b, "p2").select("src", "dst")
    if prob_missing_one > 0:
        # Bernoulli trial keyed on the congruential pair_key — a pure
        # function of (src, dst), so no ``members.count()`` job is
        # needed to mint a mixing constant (one fewer Spark job per
        # generator call; a full count stalls at 10^12 members).
        inter = inter.filter(
            _unit(pair_key(F.col("src"), F.col("dst")), seed + 2) >= prob_missing_one
        )
    return inter


def cliques_graph_edges(
    spark: SparkSession,
    num_cliques: int,
    min_size: int,
    max_size: int,
    prob_missing_one: float = 0.0,
    prob_missing_all: float = 0.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Reference cliques-graph (clique_generator.py:283-340): full intra-
    clique edges; inter-clique pair (c1,c2) kept w.p. 1-prob_missing_all,
    then each cross edge kept w.p. 1-prob_missing_one (J4,
    edges_generator.py:99-180).

    Returns (vertices(id, part), edges(src, dst)).
    Joins are equi-joins on the clique/part id — co-partitioned, and tiny
    dims broadcast under AQE.
    """
    members = _parts(spark, num_cliques, min_size, max_size, seed).cache()
    m1 = members.select(F.col("part"), F.col("id").alias("src"))
    m2 = members.select(F.col("part"), F.col("id").alias("dst"))
    intra = m1.join(m2, "part").filter(F.col("src") < F.col("dst")).select("src", "dst")
    inter = _part_pair_edges(
        members, num_cliques, prob_missing_all, prob_missing_one, seed
    )
    verts = members.select("id", "part")
    return verts, intra.unionByName(inter)


def random_uniform_attr(key, a: float, b: float, seed: int = 42):
    """F2 parity (vertices_generator.py:32-33, edges_generator.py:59-60):
    uniform [a,b) property STORED AS STRING — but deterministic
    (hash-based) instead of the reference's irreproducible ``random.uniform``.
    Formatted '%.6f' (not a raw double->string cast, which goes
    scientific for small magnitudes and is engine-specific) so the value
    is SQL-replayable bit-for-bit."""
    return F.format_string("%.6f", F.round(_unit(key, seed) * F.lit(b - a) + F.lit(a), 6))


def prepare_vertices(
    spark: SparkSession,
    n: int,
    smart: bool = False,
    smart_attribute: str = "smartProp",
    num_parts: int | None = None,
    attr: tuple[str, float, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """P6 parity (prepare_vertices, vertices_generator.py:12-42): vertex
    docs from an id range, with the reference's four branches (isSmart x
    smart_attribute=='part') collapsed into declarative F.when columns:

    * ``_key`` = str(id);
    * smart => a ``smart_attribute`` column = str(id) (or the part id
      when the smart attribute IS the part attribute);
    * ``num_parts`` => a ``part`` column = str(id % num_parts);
    * ``attr=(name, a, b)`` => a uniform random property as string (F2).

    One narrow ``spark.range`` job — the reference streams these through
    per-bulk Python dict loops (vertices_generator.py:45-71).
    """
    df = spark.range(n)
    cols = [F.col("id").cast("string").alias("_key")]
    if num_parts is not None:
        part_c = F.pmod("id", F.lit(num_parts)).cast("string")
        cols.append(part_c.alias("part"))
        if smart and smart_attribute == "part":
            pass  # the part column doubles as the smart attribute
        elif smart:
            cols.append(F.col("id").cast("string").alias(smart_attribute))
    elif smart:
        cols.append(F.col("id").cast("string").alias(smart_attribute))
    if attr is not None:
        name, a, b = attr
        cols.append(random_uniform_attr(F.col("id"), a, b, seed).alias(name))
    return df.select(*cols)


# pair-key mixing constant for append_edge_attr (any constant coprime
# with _M and != _A works; intermediates stay < 2^48, no int64 overflow)
_A2 = 131071


def pair_key(src, dst):
    """Deterministic non-negative int64 key for an edge (src, dst):
    ((src % M) * A2 + dst % M) % M — SQL-replayable congruential mix
    (the same trick ORACLE_GEN_CLIQUE uses), unlike xxhash64 which
    DuckDB cannot replay."""
    return F.pmod(
        F.pmod(src, F.lit(_M)) * F.lit(_A2) + F.pmod(dst, F.lit(_M)), F.lit(_M)
    )


def append_edge_attr(
    edges: DataFrame, name: str, a: float, b: float, seed: int = 42
) -> DataFrame:
    """P7/F2 parity (append_edges + random edge property,
    edges_generator.py:32-47,59-60): attach a deterministic uniform
    random property (string) keyed on the (src, dst) pair via the
    congruential pair_key so the DuckDB oracle replays it bit-for-bit."""
    key = pair_key(F.col("src"), F.col("dst"))
    return edges.withColumn(name, random_uniform_attr(key, a, b, seed))


def k_partite_edges(
    spark: SparkSession, k: int, min_size: int, max_size: int, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Complete k-partite graph (k_partite_generator.py:10-40: parts are
    'cliques' with prob_missing=0 INTER-part edges and NO intra-part
    edges). Returns (vertices(id, part), edges(src, dst)).

    Uses the same part-pair-then-expand shape as cliques_graph_edges —
    the theta join touches only the k-row part frame, never a
    member-level BroadcastNestedLoopJoin."""
    members = _parts(spark, k, min_size, max_size, seed).cache()
    edges = _part_pair_edges(members, k, seed=seed)
    return members.select("id", "part"), edges
