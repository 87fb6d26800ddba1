"""Maximal independent set (Luby) and greedy graph coloring via
deterministic per-round hash priorities.

Beyond the SURVEY §2 inventory; MIS is the classic symmetry-breaking
primitive of distributed graph processing (Luby, "A simple parallel
algorithm for the maximal independent set problem", SIAM J. Comput.
1986) and iterated MIS is the standard distributed greedy coloring —
the two operators a link-graph user reaches for to schedule
conflict-free updates (crawl politeness, parallel mutation batches)
over the engine's adjacency surface [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#neighbors].

Determinism: round t draws a priority ``p_t(v) = (a_t·(v mod M31) +
b_t) mod M31`` from the shared splitmix parameter walk
(``anf.fm_params`` — pure python ints, so the unrolled DuckDB twins
embed the identical literals), and every comparison is on the PAIR
``(p_t(v), v)`` — lexicographic, so hash collisions cannot make the
result run-order dependent. Spark compares via ``struct(p, id)``,
DuckDB via row values ``(p, id)``; both orders are lexicographic.

Round t on the remaining (undecided) simple undirected graph:

    selected(v)  ⟺  (p_t(v), v) < min over undecided neighbors
    mis mode:    remove selected ∪ N(selected); selected join the MIS
    color mode:  remove selected only; color(v) = t

Both modes: selected sets are independent (strict lexicographic local
minima — two adjacent vertices cannot both win), every round selects
at least the global minimum (≥ 1 vertex → guaranteed termination),
and fresh per-round priorities give Luby's O(log n) expected rounds
for MIS. Coloring uses exactly as many rounds as colors; adjacent
vertices are colored in different rounds, so the coloring is proper
(law-tested); the color count is greedy, not minimal (graph coloring
is NP-hard — this is the standard distributed trade).

Plan shape & 100 TB notes: per round = one edges ⋈ undecided-state
semi-join pair (the remaining-edge filter), one edges ⋈ priority join
+ min-aggregate (algebraic — map-side combine bounds hub skew at one
row per upstream task), and one anti-join removal. State shrinks
every round (MIS: by selected + neighborhood — geometrically in
expectation; coloring: by the selected set). All joins key on vertex
id like every iterative flagship; nothing is all-pairs. Fixed-round
mode (``num_iters``) is bit-comparable against the unrolled DuckDB
twins (queries.py ``mis_parts`` / ``coloring_parts``) — integer
state, no fp anywhere; fixpoint mode RAISES at ``max_iters`` (no
silent partial answer, same contract as kcore/scc/cheapestPath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.algorithms.anf import M31, fm_params
from quiver_spark.superstep import truncated_checkpoint

MIS_SEED = 20260820  # default priority-walk seed (shared with the SQL twins)


def priority_expr(a: int, b: int, col: str) -> str:
    """Shared ANSI-SQL text for round priorities — same M31 affine
    form as anf.fm_hash_expr (non-negative for non-negative ids; for
    negative ids both engines agree on C-style % semantics)."""
    return f"(({a} * ({col} % {M31}) + {b}) % {M31})"


def _luby(
    graph: Graph,
    mode: str,
    num_iters: int | None,
    max_iters: int,
    seed: int,
) -> DataFrame:
    spark = graph.spark
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    eb = (
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(canon.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    eb.count()
    try:
        und = truncated_checkpoint(graph.vertices.select("id"))
        done = spark.createDataFrame([], "id long, round long, selected boolean")
        fixed = num_iters is not None
        total = num_iters if fixed else max_iters
        n_und = und.count()
        t = 0
        while n_und > 0 and t < total:
            a, b = fm_params(t + 1, seed)[t]
            pr = und.select("id", F.expr(priority_expr(a, b, "id")).alias("p"))
            # remaining edges: both endpoints still undecided
            e_t = eb.join(und.withColumnRenamed("id", "src"), "src").join(
                und.withColumnRenamed("id", "dst"), "dst"
            )
            nbmin = (
                e_t.join(pr.select(F.col("id").alias("dst"), "p", F.col("id").alias("nid")), "dst")
                .groupBy("src")
                .agg(F.min(F.struct("p", "nid")).alias("m"))
                .withColumnRenamed("src", "id")
            )
            sel = (
                pr.join(nbmin, "id", "left")
                .where(
                    F.col("m").isNull()
                    | (F.struct(F.col("p"), F.col("id").alias("nid")) < F.col("m"))
                )
                .select("id")
            )
            sel = truncated_checkpoint(sel)
            if mode == "mis":
                nbrs = (
                    eb.join(sel.withColumnRenamed("id", "src"), "src")
                    .select(F.col("dst").alias("id"))
                    .dropDuplicates()
                    .join(und, "id")  # only still-undecided neighbors flip
                    .join(sel, "id", "left_anti")
                )
                decided = sel.select(
                    "id", F.lit(t).cast("long").alias("round"), F.lit(True).alias("selected")
                ).unionByName(
                    nbrs.select(
                        "id", F.lit(t).cast("long").alias("round"), F.lit(False).alias("selected")
                    )
                )
            else:
                decided = sel.select(
                    "id", F.lit(t).cast("long").alias("round"), F.lit(True).alias("selected")
                )
            decided = truncated_checkpoint(decided)
            done = done.unionByName(decided)
            und = truncated_checkpoint(und.join(decided.select("id"), "id", "left_anti"))
            if t % 8 == 7:
                done = truncated_checkpoint(done)
            n_und = und.count()
            t += 1
        if n_und > 0 and not fixed:
            raise RuntimeError(
                f"{mode} did not decide every vertex in max_iters={max_iters} "
                f"rounds ({n_und} undecided) — raise max_iters"
            )
        return done
    finally:
        eb.unpersist()


def maximal_independent_set(
    graph: Graph,
    num_iters: int | None = None,
    max_iters: int = 60,
    seed: int = MIS_SEED,
) -> DataFrame:
    """Luby MIS over the simple undirected view: ``(id, in_mis,
    round)`` for EVERY vertex — ``round`` is the round that decided it
    (selected or knocked out by a selected neighbor; isolated vertices
    are selected in round 0). ``num_iters`` pins the round count for
    the bit-exact oracle — undecided vertices are then reported with
    ``round = -1`` and ``in_mis = false``; default fixpoint mode
    raises at ``max_iters`` instead of returning a partial answer."""
    done = _luby(graph, "mis", num_iters, max_iters, seed)
    return (
        graph.vertices.select("id")
        .join(done, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("selected"), F.lit(False)).alias("in_mis"),
            F.coalesce(F.col("round"), F.lit(-1)).cast("long").alias("round"),
        )
    )


def greedy_coloring(
    graph: Graph,
    num_iters: int | None = None,
    max_iters: int = 200,
    seed: int = MIS_SEED,
) -> DataFrame:
    """Iterated-MIS proper coloring over the simple undirected view:
    ``(id, color)`` — color = the round whose independent set the
    vertex joined; rounds used = colors used (greedy, not minimal).
    ``num_iters`` pins rounds for the oracle (undecided → color = -1);
    default fixpoint mode raises at ``max_iters``."""
    done = _luby(graph, "color", num_iters, max_iters, seed)
    return (
        graph.vertices.select("id")
        .join(done, "id", "left")
        .select("id", F.coalesce(F.col("round"), F.lit(-1)).cast("long").alias("color"))
    )
