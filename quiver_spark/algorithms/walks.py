"""Deterministic seeded random-walk corpus generation.

Beyond the SURVEY §2 inventory; random-walk corpora are the standard
bridge from a link graph to a TRAINING-DATA pipeline — DeepWalk
(Perozzi et al., KDD 2014) and node2vec (Grover & Leskovec, KDD 2016)
both start from exactly this artifact: W walks of length L from every
vertex, fed to a sequence model. At 10^12 files the walk table is the
largest derived dataset the engine emits, so the generator must be a
pure DataFrame pipeline — and for the oracle discipline it must be
DETERMINISTIC: the "random" choice at step t is an M31 affine hash of
(start, walk-index, step, current vertex) over literals from the
shared ``anf.fm_params`` walk, so the DuckDB twin (queries.py
``walks_parts``, a recursive CTE over the same arithmetic) reproduces
every step bit-for-bit. Seeded determinism is also what production
wants: walks are reproducible across retries and resumable without
re-rolling the corpus.

Step rule at step t from vertex v (out-neighbors ranked 1..deg(v) by
ascending neighbor id):

    mix  = ((start mod M31)·31 + widx·1009 + t·9176) mod M31
    H    = (a·((mix + (v mod M31)) mod M31) + b) mod M31
    pick = ((H mod deg(v)) + deg(v)) mod deg(v)      # C-% safe
    next = the (pick+1)-th ranked neighbor

Walks stop early at dead ends (no out-neighbors in ``direction``).
Parallel edges collapse (the pair set ranks uniquely); a
multiplicity-weighted walk would rank the multiset instead — not
built, documented.

Plan shape & 100 TB notes:

- The ranked adjacency (u, v, rnk) and the degree table are built
  once (one dedup + one window + one aggregate) and persisted; every
  step is TWO equi-joins — positions ⋈ degree on the current vertex
  (computes pick, no fan-out), then positions ⋈ adjacency on
  (vertex, rank) — never a join that explodes by degree, so hub skew
  costs one shuffled row per walk per step regardless of degree.
- Positions are (#vertices × walks_per_vertex) rows — independent of
  edge count; the corpus is emitted incrementally (step column), so
  a sink can partition by step or by start-block.
- L steps = L joins; at 100 TB you'd run walks in start-id blocks
  (embarrassingly parallel across blocks) — the determinism makes the
  blocking invisible in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quiver_spark.algorithms.anf import M31, fm_params
from quiver_spark.graph import Graph
from quiver_spark.superstep import truncated_checkpoint
from quiver_spark.traverse import _edges_for

WALK_SEED = 20260821  # default hash-walk seed (shared with the SQL twin)


def walk_params(seed: int = WALK_SEED) -> tuple[int, int]:
    """The (a, b) literals both engines embed."""
    return fm_params(1, seed)[0]


def pick_expr(a: int, b: int, start: str, widx: str, step: str, v: str) -> str:
    """Shared ANSI-SQL text for the step hash H (pick = pmod(H, deg)).
    Every operand is forced to BIGINT so the arithmetic is 64-bit in
    both engines even when callers substitute INT literals (Spark ANSI
    mode raises on INT32 overflow; products here stay < 2^62)."""
    mix = (
        f"((CAST({start} AS BIGINT) % {M31}) * 31 "
        f"+ CAST({widx} AS BIGINT) * 1009 + CAST({step} AS BIGINT) * 9176) % {M31}"
    )
    return (
        f"((CAST({a} AS BIGINT) * ((({mix}) + (CAST({v} AS BIGINT) % {M31})) % {M31})"
        f" + {b}) % {M31})"
    )


def random_walks(
    graph: Graph,
    walks_per_vertex: int = 1,
    length: int = 10,
    direction: str = "out",
    seed: int = WALK_SEED,
) -> DataFrame:
    """Deterministic walk corpus: ``(start, widx, step, id)`` — walk
    ``(start, widx)`` visits ``id`` at ``step`` (step 0 = the start
    vertex itself); rows stop early at dead ends. Exact integers end
    to end."""
    if walks_per_vertex < 1 or length < 0:
        raise ValueError("walks_per_vertex >= 1 and length >= 0 required")
    a, b = walk_params(seed)
    adj = _edges_for(graph, direction)  # deduped (u, v) pair set
    w = Window.partitionBy("u").orderBy("v")
    adj = adj.withColumn("rnk", F.row_number().over(w)).persist()
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg")).persist()
    adj.count(), deg.count()
    try:
        cur = graph.vertices.select(
            F.col("id").alias("start"),
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("widx"),
            F.col("id").alias("v"),
        )
        cur = truncated_checkpoint(cur)
        out = cur.select(
            "start", "widx", F.lit(0).cast("long").alias("step"), F.col("v").alias("id")
        )
        for t in range(length):
            h = F.expr(pick_expr(a, b, "start", "widx", str(t), "v"))
            stepped = (
                cur.join(deg, cur["v"] == deg["u"])
                .withColumn(
                    "rnk",
                    (((h % F.col("deg")) + F.col("deg")) % F.col("deg") + F.lit(1)).cast("int"),
                )
                .select("start", "widx", "v", "rnk")
            )
            nxt = stepped.join(
                adj.select(F.col("u").alias("v"), F.col("v").alias("nv"), "rnk"),
                ["v", "rnk"],
            ).select("start", "widx", F.col("nv").alias("v"))
            cur = truncated_checkpoint(nxt)
            if cur.isEmpty():
                break
            out = out.unionByName(
                cur.select(
                    "start",
                    "widx",
                    F.lit(t + 1).cast("long").alias("step"),
                    F.col("v").alias("id"),
                )
            )
        return out
    finally:
        adj.unpersist()
        deg.unpersist()
