"""Traversals: quiver's DFS/BFS family as iterative DataFrame programs.

Reference semantics [pub: Verizon/quiver core/src/main/scala/quiver/
Graph.scala#dfs/#xdfsWith/#bfs/#bft/#esp/#reachable/#dff]: quiver
traverses by repeatedly *decomposing* the graph — the shrinking graph
is the visited set. A distributed engine must not rewrite the big
edge table every step (SURVEY.md §4.1), so the engine inverts the
trick: the edge table is immutable and a small **frontier** DataFrame
walks it, with an accumulated **visited** set applied as an anti-join.

Every traversal below is the same loop:

    frontier_{k+1} = E ⋈ frontier_k on the direction column,
                     minus visited, deduped (min-parent tie-break)

The frontier is ``broadcast()``-hinted only while its (already
materialized) row count is under ``BROADCAST_FRONTIER_MAX`` —
broadcasting turns the per-step join into a map-side hash join with
**zero shuffle of the edge table** (E is read with src/dst pruned).
A frontier CAN be huge (``dff`` seeds every vertex; BFS on a
small-diameter power-law graph reaches half the graph in one hop), and
an unconditional broadcast of a 10^9-row frontier is a driver OOM at
scale — past the threshold the join falls back to shuffle and AQE
picks the strategy. ``localCheckpoint`` every ``checkpoint_every``
steps truncates the exponentially-growing lineage (SURVEY.md §4.3).

DFS *visit order* is inherently sequential; the engine reproduces
sets / levels / parent trees at scale, and offers an exact-order
``dfs_oracle`` that runs the whole (small) graph through one
vectorized kernel partition for parity testing (SURVEY.md §7 hard
part (b)).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph, _ids_df
from quiver_spark.superstep import truncated_checkpoint

# direction → which edge column the frontier matches / expands to
_DIRS = {"out": ("src", "dst"), "in": ("dst", "src")}

# frontier rows above this skip the broadcast hint (~24 B/row → ≈120 MB;
# beyond that the exchange-based join is the safe plan)
BROADCAST_FRONTIER_MAX = 5_000_000


def _edges_for(graph: Graph, direction: str) -> DataFrame:
    """Projected (from_col, to_col) pairs for a traversal direction.

    'both' unions the two orientations — the traversal equivalent of
    quiver's ``udfs`` over ``undir`` [pub: Graph.scala#udfs].
    Parallel edges collapse: traversal only needs the pair set.
    """
    if direction == "both":
        return (
            graph.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .unionByName(graph.edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
            .dropDuplicates()
        )
    match_col, expand_col = _DIRS[direction]
    return graph.edges.select(F.col(match_col).alias("u"), F.col(expand_col).alias("v")).dropDuplicates()


def bfs(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    direction: str = "out",
    max_depth: int | None = None,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Breadth-first levels + spanning-forest parents from seeds.

    Returns ``(id, level, parent, root)`` — one row per reachable
    vertex; seeds have level 0, parent = NULL, root = themselves.
    Subsumes quiver ``bfs``/``bfsn``/``bft``/``lbft``/``dff``-shape
    output [pub: Graph.scala#bfs/#bft/#dff]: breadth-first *order* is
    (level, id); the parent pointers form a valid rooted spanning
    forest with deterministic min-(parent) tie-breaks so results are
    reproducible run-to-run (oracle-matchable).
    """
    spark = graph.spark
    edges = _edges_for(graph, direction)
    edges.persist()
    try:
        seed_df = _ids_df(spark, seeds)
        frontier = seed_df.select(
            "id",
            F.lit(0).alias("level"),
            F.lit(None).cast("long").alias("parent"),
            F.col("id").alias("root"),
        )
        visited = frontier
        level = 0
        frontier = truncated_checkpoint(frontier)
        visited = truncated_checkpoint(visited)
        frontier_n = frontier.count()
        while True:
            if max_depth is not None and level >= max_depth:
                break
            level += 1
            f_hint = F.broadcast(frontier) if frontier_n <= BROADCAST_FRONTIER_MAX else frontier
            nxt = (
                edges.join(f_hint, edges["u"] == frontier["id"])
                .select(
                    F.col("v").alias("id"),
                    F.lit(level).alias("level"),
                    F.col("u").alias("parent"),
                    F.col("root"),
                )
                .join(visited.select("id"), "id", "left_anti")
                # deterministic tie-break: min (parent, root) per vertex
                .groupBy("id", "level")
                .agg(F.min(F.struct("parent", "root")).alias("pr"))
                .select("id", "level", F.col("pr.parent").alias("parent"), F.col("pr.root").alias("root"))
            )
            nxt = truncated_checkpoint(nxt)  # also materializes for the count
            frontier_n = nxt.count()  # cached scan; also the next hint decision
            if frontier_n == 0:
                break
            visited = visited.unionByName(nxt)
            if level % checkpoint_every == 0:
                visited = truncated_checkpoint(visited)
            frontier = nxt
        return visited
    finally:
        edges.unpersist()


def reachable(graph: Graph, v: int | Iterable[int] | DataFrame, direction: str = "out") -> DataFrame:
    """All vertices reachable from v (including v) —
    [pub: Graph.scala#reachable]. Returns (id)."""
    seeds = [v] if isinstance(v, int) else v
    return bfs(graph, seeds, direction=direction).select("id")


def rdfs_set(graph: Graph, seeds: Iterable[int] | DataFrame) -> DataFrame:
    """Reverse-reachable set — quiver ``rdfs`` as a set
    [pub: Graph.scala#rdfs]."""
    return bfs(graph, seeds, direction="in").select("id")


def dff(graph: Graph, seeds: Iterable[int] | DataFrame | None = None, direction: str = "out") -> DataFrame:
    """Spanning forest ``(id, parent, root, level)`` — quiver ``dff``
    [pub: Graph.scala#dff]. With no seeds, all vertices seed (every
    vertex lands in exactly one tree; min-root tie-break makes the
    forest deterministic, though tree *shape* differs from Erwig's
    sequential DFS forest — documented scale semantics)."""
    if seeds is None:
        seeds = graph.vertices.select("id")
    out = bfs(graph, seeds, direction=direction)
    # a vertex reached from several seeds keeps its first (min-level,
    # then min root) discovery — bfs already guarantees single row per id
    return out.select("id", "parent", "root", "level")


def esp(graph: Graph, s: int, t: int, direction: str = "out", max_depth: int | None = None) -> list[int]:
    """Hop-count shortest path s→t as a vertex list (inclusive), or []
    — quiver ``esp`` [pub: Graph.scala#esp].

    BFS with parent pointers, then a *distributed* backtrack: the
    visited table (which at scale is the whole reachable set —
    millions of rows for a 4-hop answer) is never collected. Each of
    the ≤ level(t) backtrack steps is a single-row lookup pushed into
    the cached visited frame as a (level, id) filter, so only the
    path's own rows ever reach the driver.
    """
    visited = bfs(graph, [s], direction=direction, max_depth=max_depth).persist()
    try:
        t_row = visited.filter(F.col("id") == t).select("level", "parent").collect()
        if not t_row:
            return []
        level, parent = t_row[0]["level"], t_row[0]["parent"]
        path = [t]
        for k in range(level - 1, -1, -1):
            path.append(parent)
            if k == 0:
                break
            parent = (
                visited.filter((F.col("level") == k) & (F.col("id") == path[-1]))
                .select("parent")
                .collect()[0]["parent"]
            )
        return list(reversed(path))
    finally:
        visited.unpersist()


def lesp(graph: Graph, s: int, t: int) -> list[tuple[int, dict]]:
    """Labeled shortest path [pub: Graph.scala#lesp]: (vertex, edge
    labels taken to reach it); first vertex carries {}.

    One join: the (tiny, driver-built) consecutive-pairs frame joins
    ``graph.edges`` once; a min-struct per hop picks a deterministic
    label among parallel edges — not one Spark job per path edge.
    """
    path = esp(graph, s, t)
    if not path:
        return []
    spark = graph.spark
    pairs = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(zip(path, path[1:]))], "pos long, src long, dst long"
    )
    label_cols = [c for c in graph.edges.columns if c not in ("src", "dst")]
    hops = (
        graph.edges.join(F.broadcast(pairs), ["src", "dst"])
        .groupBy("pos")
        .agg(F.min(F.struct(*label_cols)).alias("_lbl"))
        .collect()
    )
    labels = {r["pos"]: r["_lbl"].asDict() for r in hops}
    out: list[tuple[int, dict]] = [(path[0], {})]
    for i, b in enumerate(path[1:]):
        out.append((b, labels.get(i, {})))
    return out


def cheapest_path_costs(
    graph: Graph,
    seeds: Iterable[int] | DataFrame,
    cost_col: str = "weight",
    direction: str = "out",
    max_iters: int = 100,
    checkpoint_every: int = 8,
    rows_per_salt: int = 100_000,
) -> DataFrame:
    """Min-cost distances from seeds — distributed Bellman-Ford
    (quiver ``cheapestPath`` generalized to all targets
    [pub: Graph.scala#cheapestPath]). Edge cost is an edge column;
    returns ``(id, cost, parent)``. Iterates relaxation
    ``dist' = min(dist, min over in-edges (dist[u] + w))`` to fixpoint.

    The relax ``groupBy(id)`` min is salted degree-proportionally on
    power-law graphs (round-3 verdict item 5 — the same
    ``skew.degree_sketch`` two-phase aggregate the auto-smj pagerank
    tier uses): keys whose in-degree exceeds ``rows_per_salt`` fan
    their rows across ``ceil(freq/rows_per_salt)`` reducer cells with
    a partial min per cell, so a 10M-in-degree super-node stops owning
    one reducer. The sketch is one map-side-combined pass over the
    static edge frame; when no key crosses the floor the salted plan
    is skipped entirely (uniform graphs pay nothing). min is
    associative/commutative, so the two-phase result is exact.
    """
    from quiver_spark.skew import degree_sketch, salted_agg

    match_col, expand_col = _DIRS[direction]
    edges = graph.edges.select(
        F.col(match_col).alias("u"), F.col(expand_col).alias("v"), F.col(cost_col).cast("double").alias("w")
    )
    edges.persist()
    hot = degree_sketch(edges, "v", min_freq=rows_per_salt).select(
        F.col("v").alias("id"), "freq"
    )
    # persisted: the sketch plan (a full-edge aggregate) would otherwise
    # re-execute inside EVERY iteration's salted-relax plan
    hot.persist()
    try:
        salt = hot.count() > 0
        dist = _ids_df(graph.spark, seeds).select(
            "id", F.lit(0.0).alias("cost"), F.lit(None).cast("long").alias("parent")
        )
        dist = truncated_checkpoint(dist)
        changed = 0
        for it in range(1, max_iters + 1):
            relaxed = edges.join(dist, edges["u"] == dist["id"]).select(
                F.col("v").alias("id"),
                (F.col("cost") + F.col("w")).alias("cost"),
                F.col("u").alias("parent"),
                F.lit(False).alias("_isprev"),
            )
            # change detection folded INTO the relax aggregate (the
            # pagerank delta-column pattern): prev rows are tagged and
            # the min-struct and prev-cost come out of ONE aggregate,
            # so the fixpoint check is a cheap scan of the checkpointed
            # result instead of a second join job per iteration
            unioned = dist.select(
                "id", "cost", "parent", F.lit(True).alias("_isprev")
            ).unionByName(relaxed)
            aggs = [
                F.min(F.struct("cost", "parent")).alias("cp"),
                F.min(F.when(F.col("_isprev"), F.col("cost"))).alias("_prev"),
            ]
            if salt:
                # two-phase: partial min per (id, salt) cell, final min
                # per id over ≤ ceil(freq/rows_per_salt) rows per hot key
                # (min is algebraic, so salted_agg is exact)
                grouped = salted_agg(
                    unioned,
                    "id",
                    aggs,
                    [F.min("cp").alias("cp"), F.min("_prev").alias("_prev")],
                    hot=hot,
                    rows_per_salt=rows_per_salt,
                    salt_entropy=F.xxhash64(F.coalesce(F.col("parent"), F.col("id"))),
                )
            else:
                grouped = unioned.groupBy("id").agg(*aggs)
            new_dist = grouped.select(
                "id",
                F.col("cp.cost").alias("cost"),
                F.col("cp.parent").alias("parent"),
                (F.col("_prev").isNull() | (F.col("cp.cost") < F.col("_prev"))).alias("_changed"),
            )
            # materialize each round: the fixpoint scan reads the cache,
            # and checkpointing truncates the k-deep join lineage
            new_dist = truncated_checkpoint(new_dist)
            changed = new_dist.agg(F.sum(F.col("_changed").cast("int"))).collect()[0][0] or 0
            dist = new_dist.drop("_changed")
            if changed == 0:
                break
        if changed:
            # exhausting max_iters with relaxations still firing means the
            # result is NOT the Bellman-Ford fixpoint (hop-diameter beyond
            # max_iters, or a negative-cost cycle that has no fixpoint) —
            # returning partial distances silently would hand callers
            # non-converged costs labeled as exact
            raise RuntimeError(
                f"cheapest_path_costs did not converge within max_iters={max_iters} "
                f"({changed} vertices still relaxing): raise max_iters, or check for "
                f"negative-cost cycles reachable from the seeds"
            )
        return dist
    finally:
        hot.unpersist()
        edges.unpersist()


def dfs_oracle(graph: Graph, seeds: list[int], direction: str = "out") -> list[int]:
    """Exact Erwig DFS visit order [pub: Graph.scala#dfs → #xdfsWith]:
    pop work-stack head, visit, *prepend* successors (in adjacency
    order = sorted neighbor id for determinism), recurse.

    Runs the whole graph through ONE vectorized kernel partition —
    this is the small-scale parity oracle, not the scale path
    (SURVEY.md §2.7); at scale expose ``reachable``/``dff``.
    """
    import pandas as pd  # noqa: F401 (kernel runs on executors)

    # the kernel frame carries BOTH the edge list and the vertex set
    # (vertex rows have v = NULL): Erwig DFS visits a seed with no
    # successors and SKIPS a seed that is not in the graph — neither
    # is decidable from edge endpoints alone, and a graph whose
    # direction-projected edge set is empty would otherwise never
    # invoke the kernel at all (groupBy.applyInPandas on zero rows),
    # wrongly returning [] instead of the seed visit order.
    verts = graph.vertices.select(
        F.col("id").alias("u"), F.lit(None).cast("long").alias("v")
    )
    edges = (
        _edges_for(graph, direction)
        .select("u", "v")
        .unionByName(verts)
        .withColumn("_g", F.lit(0))
    )
    seeds_b = list(seeds)

    def kernel(pdf):
        import pandas as _p

        vset: set[int] = set()
        adj: dict[int, list[int]] = {}
        for u, v in zip(pdf["u"], pdf["v"]):
            if _p.isna(v):
                vset.add(int(u))
            else:
                adj.setdefault(int(u), []).append(int(v))
        for u in adj:
            adj[u].sort()
        seen: set[int] = set()
        order: list[int] = []
        stack = list(reversed(seeds_b))
        while stack:
            x = stack.pop()
            if x in seen or x not in vset:
                continue
            seen.add(x)
            order.append(x)
            # prepend successors: push in reverse so smallest pops first
            for nbr in reversed(adj.get(x, [])):
                if nbr not in seen:
                    stack.append(nbr)
        import pandas as _pd

        return _pd.DataFrame({"pos": range(len(order)), "id": order})

    out = edges.groupBy("_g").applyInPandas(lambda pdf: kernel(pdf), "pos long, id long")
    return [r["id"] for r in out.orderBy("pos").collect()]
