"""Minimum spanning forest via distributed Borůvka.

Beyond the SURVEY §2 inventory; the MSF is the classic "what is the
cheapest backbone of this link graph" operator (single-linkage
clustering, network design, graph sparsification before expensive
downstream analytics), and Borůvka is THE distributed formulation —
every round each component selects its minimum outgoing edge and the
components contract, so the component count at least halves per round
and O(log n) rounds suffice regardless of weight distribution
(Borůvka 1926; the MapReduce/Spark formulation in Lattanzi et al.,
"Filtering: a method for solving graph problems in MapReduce", SPAA
2011). quiver exposes the adjacency/fold surface this composes over
[pub: Verizon/quiver core/src/main/scala/quiver/Graph.scala#fold].

Determinism / uniqueness: all comparisons use the TOTAL order
``(w, a, b)`` on canonical edges (a < b), so the selected forest is
the unique minimum forest w.r.t. that order even under duplicate
weights (the standard matroid tie-break). That exact order is what
the DuckDB twin (queries.py ``msf_parts``) checks through an
INDEPENDENT characterization — the cycle property: an edge belongs to
the MSF iff its endpoints are NOT connected using only strictly
smaller edges. Agreement of the contraction algorithm with the
cut/cycle characterization is evidence, not tautology (pytest adds a
third family: driver-side Kruskal with union-find).

Round t on the remaining multi-component graph:

    sel(c)   = min_(w,a,b) { edges with exactly one endpoint in c }
    forest  += distinct selected edges (both endpoints may pick one)
    contract: selected edges form pseudo-trees over components (each
              component points at one neighbor; every piece has
              exactly one mutual 2-cycle, the globally minimal edge of
              the piece) — break the 2-cycle toward the smaller id,
              then pointer-jump to the root in O(log n) inner hops.

Plan shape & 100 TB notes:

- Per round: one edges ⋈ comp join per endpoint (vertex-keyed, the
  same shuffle shape as every iterative flagship), then TWO algebraic
  min-aggregates with map-side combine — first the Borůvka STEP's
  pair contraction (one row per unordered component pair: between two
  current components only the (w, a, b)-minimal edge can ever join
  the MSF, so the non-minimal parallels are removed permanently), then
  the per-component minimum over those pair rows. A hub component's
  millions of boundary edges reduce to one row per upstream task
  before either shuffle.
- The carried edge table is the surviving pair-minimal candidates —
  it shrinks geometrically with the component count (measured on a
  20M-edge power-law graph: 20M → 1.9M → 162k → … within three
  rounds), so total work is Σ E_t ≈ O(E), not rounds × E. The round-1
  implementation re-joined all E edges every round; the 2→8 scaling
  row exposed the difference (0.754 → re-measured after contraction,
  see BENCH/BASELINE.md).
- Pointer jumping runs on the component-sized ptr table (self-joins
  on component ids, not vertex ids), idempotent at its fixpoint.
- Emptiness of the contracted pair table is the loop condition — a
  driver scalar, like every runner convergence check.
- Parallel input edges collapse to their minimum-(w,a,b)
  representative once, up front; self-loops drop (never in a forest).
- The forest accumulator and carried tables are checkpoint-truncated
  every round so plan statistics cannot compound (superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import truncated_checkpoint

# pointer-jumping is idempotent at its fixpoint, so a generous cap is
# safe; 2^40 components is beyond any input
_MAX_JUMPS = 40


def _canonical_weighted(graph: Graph, weight_col: str) -> DataFrame:
    """(a, b, w): canonical simple weighted edges — a < b, self-loops
    dropped, parallel edges collapsed to the (w, a, b)-minimal one."""
    e = graph.edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("a") != F.col("b"))
    return e.groupBy("a", "b").agg(F.min("w").alias("w"))


def minimum_spanning_forest(
    graph: Graph,
    weight_col: str = "weight",
    max_iters: int = 30,
) -> DataFrame:
    """Edges ``(a, b, w)`` of the unique minimum spanning forest of
    the undirected view of ``graph`` under the total order
    ``(w, a, b)``. ``weight_col`` must be an integral edge column
    (exact arithmetic keeps the oracle fp-free; scale fixed-point
    weights to integers at the caller). Raises on non-convergence at
    ``max_iters`` (cannot happen below 2^30 vertices — components at
    least halve per round — so a hit means a logic error, and the
    contract matches kcore/scc/cheapestPath: no silent partial
    forest)."""
    spark = graph.spark
    # integral-weight contract, validated: a silent cast("long") on a
    # fractional column would return a forest that is NOT minimal for
    # the given weights with no error — fail loudly instead (one
    # aggregate over the edge scan, once)
    frac = graph.edges.agg(
        F.max(
            F.when(
                F.col(weight_col).cast("double")
                != F.col(weight_col).cast("long").cast("double"),
                1,
            ).otherwise(0)
        )
    ).first()[0]
    if frac:
        raise ValueError(
            f"weight_col={weight_col!r} must be integral — fractional weights "
            "would be silently truncated; scale fixed-point weights to "
            "integers at the caller (e.g. floor(w * 1e9))"
        )
    edges = truncated_checkpoint(_canonical_weighted(graph, weight_col))
    comp = truncated_checkpoint(graph.vertices.select("id", F.col("id").alias("comp")))
    forest = spark.createDataFrame([], "a long, b long, w long")
    try:
        for _round in range(max_iters):
            # cross-component candidates, CONTRACTED to one row per
            # unordered component pair — the standard Borůvka step on
            # the contracted multigraph: between two current components
            # only the (w, a, b)-minimal edge can ever join the MSF
            # (any other closes a cycle with it in the contracted
            # graph), so the non-minimal parallels are removed
            # PERMANENTLY and the carried edge table shrinks
            # geometrically with the component count instead of
            # re-scanning all input edges every round.
            #
            # Round 1 is the identity contraction: comp is the identity
            # map, so (least(ca,cb), greatest(ca,cb)) == (a, b) — the
            # exact key _canonical_weighted already collapsed — and
            # every canonical edge is cross-component. Running the
            # generic step there costs two vertex-keyed joins, a full
            # E-row shuffle and an E-row checkpoint to rebuild the
            # input verbatim (measured: +50% whole-job wall on a
            # 20M-edge graph, bench/msf_scaling_28_r5{,b}.log), so
            # round 1 takes the canonical table as its pair-minimal
            # candidates by construction.
            if _round == 0:
                pairs = edges.select(
                    "w", "a", "b", F.col("a").alias("ca"), F.col("b").alias("cb")
                )
            else:
                pairs = (
                    edges.join(comp.select(F.col("id").alias("a"), F.col("comp").alias("ca")), "a")
                    .join(comp.select(F.col("id").alias("b"), F.col("comp").alias("cb")), "b")
                    .where(F.col("ca") != F.col("cb"))
                    .groupBy(
                        F.least("ca", "cb").alias("_cx"), F.greatest("ca", "cb").alias("_cy")
                    )
                    .agg(F.min(F.struct("w", "a", "b", "ca", "cb")).alias("m"))
                    .select("m.w", "m.a", "m.b", "m.ca", "m.cb")
                )
                pairs = truncated_checkpoint(pairs)
            if pairs.isEmpty():
                return forest.orderBy("w", "a", "b")
            m = F.struct("w", "a", "b", F.col("oc")).alias("m")
            sel = (
                pairs.select(F.col("ca").alias("c"), "w", "a", "b", F.col("cb").alias("oc"))
                .unionByName(
                    pairs.select(F.col("cb").alias("c"), "w", "a", "b", F.col("ca").alias("oc"))
                )
                .groupBy("c")
                .agg(F.min(m).alias("m"))
                .persist()
            )
            # a selected edge merges its endpoints, so it can never be
            # cross-component again — rounds are disjoint and the only
            # dedup needed is within the round (both endpoints of the
            # globally-minimal pair edge select it)
            forest = truncated_checkpoint(
                forest.unionByName(
                    sel.select(
                        F.col("m.a").alias("a"), F.col("m.b").alias("b"), F.col("m.w").alias("w")
                    ).dropDuplicates()
                )
            )
            # contraction pointers: each selected component points at
            # its partner; break each pseudo-tree's unique mutual
            # 2-cycle toward the smaller id, then jump to the root
            ptr = sel.select("c", F.col("m.oc").alias("p"))
            pp = ptr.select(F.col("c").alias("p"), F.col("p").alias("gp"))
            ptr = (
                ptr.join(pp, "p", "left")
                .select(
                    "c",
                    F.when((F.col("gp") == F.col("c")) & (F.col("c") < F.col("p")), F.col("c"))
                    .otherwise(F.col("p"))
                    .alias("p"),
                )
            )
            ptr = truncated_checkpoint(ptr)
            for _j in range(_MAX_JUMPS):
                hop = ptr.select(F.col("c").alias("p"), F.col("p").alias("gp"))
                nxt = ptr.join(hop, "p", "left").select(
                    "c", F.coalesce("gp", "p").alias("p")
                )
                nxt = truncated_checkpoint(nxt)
                changed = nxt.join(
                    ptr.withColumnRenamed("p", "p0"), "c"
                ).where(F.col("p") != F.col("p0")).isEmpty()
                ptr = nxt
                if changed:
                    break
            else:  # pragma: no cover - 2^40 components is unreachable
                raise RuntimeError("pointer jumping did not converge")
            comp = truncated_checkpoint(
                comp.join(ptr.withColumnRenamed("c", "comp"), "comp", "left")
                .select("id", F.coalesce("p", "comp").alias("comp"))
            )
            # carry only the surviving pair-minimal candidates forward:
            # every removed edge was non-minimal between its current
            # component pair, hence non-minimal between any future
            # merged pair (the pair minimum is preserved under merges)
            edges = pairs.select("a", "b", "w")
            sel.unpersist()
        raise RuntimeError(
            f"minimum_spanning_forest did not converge within max_iters={max_iters} "
            "rounds; components halve per round, so this indicates a logic error "
            "(or >2^30 components — raise max_iters)"
        )
    finally:
        edges.unpersist()


def msf_components(graph: Graph, weight_col: str = "weight", max_iters: int = 30) -> DataFrame:
    """Convenience: the (id, comp) assignment implied by the forest —
    Borůvka's contraction IS a connected-components computation, so
    the final comp table doubles as a CC witness (law-tested against
    algorithms.components in pytest)."""
    forest = minimum_spanning_forest(graph, weight_col, max_iters)
    from quiver_spark.algorithms.components import connected_components

    und = Graph.from_edges(
        forest.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # vertices absent from the forest (isolated) keep their own id
    res = connected_components(und).state.select("id", F.col("component").alias("comp"))
    all_ids = graph.vertices.select("id")
    return all_ids.join(res, "id", "left").select(
        "id", F.coalesce("comp", "id").alias("comp")
    )
