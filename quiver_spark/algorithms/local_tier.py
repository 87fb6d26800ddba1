"""Driver-local numpy tier for the iterative flagships — the tiny-tier
analog of a broadcast join.

Below ``spark.quiver.auto.localMaxEdges`` (default 2,000,000 — ≈32 MB
as two int64 arrays) the whole edge list provably fits on the driver,
so one Arrow collect replaces per-superstep distributed scheduling.
At this size the distributed fixed cost dominates kernel work by
orders of magnitude: the round-5 lp bisect measured ~1.0–1.2 s per
superstep on the 196k-edge sf0.1 repo graph (3 stages × 64 tasks ×
per-step materialization) where the numpy kernel below is <1 ms. The
same measured fact motivated the smj tiny tier over the mirror
strategies (tiering.py); this tier removes the per-superstep floor
entirely.

Scale safety: this is a *guarded* driver path, exactly like the knn
dispatcher's broadcast tier (simsearch.py) and the mirror strategies'
state round-trip (pagerank.py csr_bcast) — the guard raises above the
conf threshold instead of silently OOMing the driver, and ``auto``
only routes here when the runner keeps state in memory anyway
(``run_dir=None``): durable checkpoint/resume lineage is a
distributed-runner contract, so resumable runs always take a
distributed tier.

Semantics are the distributed tiers' exactly, equality-tested in
tests/test_local_tier.py (pagerank allclose, cc/lp bit-exact):

- pagerank: ``new = (1-d)/n + d·(Σ_in rank_src/outdeg_src +
  dang_mass/n)``, parallel edges vote with multiplicity, fixed
  (``num_iters``) and tolerance modes.
- connected components: HashMin ``new = min(self, min incoming)`` per
  round; fixed mode is exactly k HashMin rounds (bit-comparable with
  the distributed oracle mode); fixpoint mode adds pointer-jumping
  after each round (monotone, same fixpoint — the local analog of the
  star escalation) so a deep chain converges in O(log n) rounds.
- label propagation: deduped neighbor votes, argmax with (count desc,
  label lex-asc) tie-break via lex-ordered int codes (min(code) ==
  min(label), the csr tier's trick), null labels never vote,
  message-less vertices keep their old label, synchronous rounds.
- triangle count: the same compact-forward / (degree, id) orientation
  as triangles.py over the simple undirected graph, wedges enumerated
  in wedge-budgeted chunks (each chunk fully vectorized) so peak
  memory is bounded even when a chunk of hub edges fans wide.

Everything is vectorized numpy (no per-row Python, per the §2.10
policy); results return as regular DataFrames via Arrow.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepResult


def _guard(spark: SparkSession, n_edges: int) -> None:
    from quiver_spark import tiering

    cap = tiering.local_max_edges(spark)
    if n_edges > cap:
        raise ValueError(
            f"local tier requested for {n_edges} edges, over the "
            f"{tiering.LOCAL_MAX_EDGES_KEY}={cap} driver-collect guard; "
            f"use a distributed strategy or raise the conf deliberately"
        )


def _collect_graph(graph: Graph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted unique vertex ids, src index array, dst index array).

    Edge endpoints are validated against the vertex set — a raw
    ``Graph`` constructed without ``mk_graph`` could dangle, and
    ``searchsorted`` would silently mis-index."""
    ids = graph.vertices.select("id").toPandas()["id"].to_numpy(np.int64)
    ids = np.unique(ids)
    e = graph.edges.select("src", "dst").toPandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    if len(src) and not (
        (si < len(ids)).all()
        and (di < len(ids)).all()
        and (ids[np.minimum(si, len(ids) - 1)] == src).all()
        and (ids[np.minimum(di, len(ids) - 1)] == dst).all()
    ):
        raise ValueError("edges reference vertices absent from the vertex table")
    return ids, si, di


def _metric(k: int, delta: float | None, t0: float, converged: bool) -> dict:
    return {
        "run_id": "local",
        "superstep": k,
        "delta": delta,
        "wall_ms": round((time.monotonic() - t0) * 1000, 3),
        "converged": converged,
    }


# ----------------------------------------------------------------------
# PageRank
# ----------------------------------------------------------------------
def pagerank_local(
    graph: Graph,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    num_iters: int | None = None,
    max_iters: int = 100,
    init_ranks: DataFrame | None = None,
    reset: DataFrame | None = None,
) -> SuperstepResult:
    spark = graph.spark
    if reset is not None and init_ranks is not None:
        raise NotImplementedError(
            "reset (personalized PageRank) cannot be combined with init_ranks"
        )
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, rank double"), supersteps=0)

    outdeg = np.bincount(si, minlength=n)  # multiplicity counts, as distributed
    dang = outdeg == 0
    w = np.zeros(len(si))
    np.divide(1.0, outdeg[si], out=w, where=outdeg[si] > 0)

    rst = None
    if reset is not None:
        # personalized teleport distribution (mirrors pagerank.py:
        # dedup by id, absent-vertex rows ignored, normalized, total
        # must be > 0, weights nonnegative); init = rst
        wcol = [c for c in reset.columns if c != "id"][0]
        rdf = reset.select("id", wcol).toPandas().drop_duplicates("id")
        rst = np.zeros(n)
        ii = np.searchsorted(ids, rdf["id"].to_numpy(np.int64))
        ok = (ii < n) & (ids[np.minimum(ii, n - 1)] == rdf["id"].to_numpy(np.int64))
        rst[ii[ok]] = rdf[wcol].to_numpy(float)[ok]
        if (rst < 0).any():
            raise ValueError("reset weights must be nonnegative")
        tot = rst.sum()
        if tot <= 0:
            raise ValueError(
                "reset weights must sum > 0 over the graph's vertex set "
                "(rows for absent vertices are ignored)"
            )
        rst = rst / tot

    if init_ranks is not None:
        # mirror the distributed warm start: dedup by id, uncovered
        # vertices at 1/n, renormalize to total mass 1 (uniform
        # fallback on a degenerate ≤0 total)
        init = init_ranks.select("id", "rank").toPandas().drop_duplicates("id")
        rank = np.full(n, 1.0 / n)
        ii = np.searchsorted(ids, init["id"].to_numpy(np.int64))
        ok = (ii < n) & (ids[np.minimum(ii, n - 1)] == init["id"].to_numpy(np.int64))
        rank[ii[ok]] = init["rank"].to_numpy(float)[ok]
        tot = rank.sum()
        rank = rank / tot if tot > 0 else np.full(n, 1.0 / n)
    elif rst is not None:
        rank = rst.copy()  # personalized init = rst (oracle-mode pin)
    else:
        rank = np.full(n, 1.0 / n)

    base = (1.0 - damping) / n
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    metrics: list[dict] = []
    k = -1
    for k in range(total):
        t0 = time.monotonic()
        msum = np.bincount(di, weights=rank[si] * w, minlength=n) if len(si) else np.zeros(n)
        dsum = float(rank[dang].sum())
        if rst is not None:
            new = (1.0 - damping) * rst + damping * (msum + dsum * rst)
        else:
            new = base + damping * (msum + dsum / n)
        delta = None if fixed else float(np.abs(new - rank).max())
        rank = new
        converged = (not fixed) and tol is not None and delta <= tol
        metrics.append(_metric(k, delta, t0, converged))
        if converged:
            break

    pdf = pd.DataFrame({"id": ids, "rank": rank})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, rank double"),
        supersteps=k + 1,
        metrics=metrics,
    )


# ----------------------------------------------------------------------
# Connected components
# ----------------------------------------------------------------------
def cc_local(
    graph: Graph,
    max_iters: int = 50,
    num_iters: int | None = None,
) -> SuperstepResult:
    spark = graph.spark
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, component long"), supersteps=0)

    # undirected voting: both orientations (dedup is irrelevant to min)
    u = np.concatenate([si, di])
    v = np.concatenate([di, si])
    comp = ids.copy()
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    metrics: list[dict] = []
    k = -1
    for k in range(total):
        t0 = time.monotonic()
        new = comp.copy()
        if len(u):
            np.minimum.at(new, v, comp[u])  # HashMin: min(self, incoming)
        changed = None if fixed else float((new != comp).sum())
        comp = new
        if not fixed and changed:
            # pointer-jump to the current root (monotone — components
            # only ever shrink toward the min id, same fixpoint as the
            # distributed star escalation) so depth converges in
            # O(log n) rounds instead of diameter rounds
            while True:
                jumped = comp[np.searchsorted(ids, comp)]
                if (jumped == comp).all():
                    break
                comp = jumped
        converged = (not fixed) and changed == 0.0
        metrics.append(_metric(k, changed, t0, converged))
        if converged:
            break

    pdf = pd.DataFrame({"id": ids, "component": comp})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, component long"),
        supersteps=k + 1,
        metrics=metrics,
    )


# ----------------------------------------------------------------------
# Label propagation
# ----------------------------------------------------------------------
def lp_local(
    graph: Graph,
    label_col: str = "lang",
    num_iters: int | None = None,
    max_iters: int = 20,
    direction: str = "both",
) -> SuperstepResult:
    from pyspark.sql import functions as F

    spark = graph.spark
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, label string"), supersteps=0)

    # seed labels, cast to string by Spark exactly as the distributed
    # tiers do (so e.g. integer labels stringify identically)
    seed = (
        graph.vertices.select("id", F.col(label_col).cast("string").alias("label"))
        .toPandas()
        .set_index("id")["label"]
        .reindex(ids)
    )
    # lex-ordered dictionary: min(code) == min(label); null → -1 (never votes)
    labels = np.asarray(sorted(x for x in seed.unique() if isinstance(x, str)), dtype=object)
    code = np.full(n, -1, dtype=np.int64)
    present = seed.notna().to_numpy()
    if labels.size:
        code[present] = np.searchsorted(labels, seed.to_numpy(object)[present])

    # deduped message pairs (u votes at v), per direction — mirrors
    # the distributed msgs_edges construction including dropDuplicates
    if direction == "both":
        u = np.concatenate([si, di])
        v = np.concatenate([di, si])
    elif direction == "out":
        u, v = si, di
    elif direction == "in":
        u, v = di, si
    else:
        raise ValueError(f"unknown direction: {direction!r}")
    if len(u):
        # dedup via packed int64 keys — np.unique(axis=1)'s void-view
        # sort measured ~3x slower on the sf0.1 bench graph
        uk = np.unique(u.astype(np.int64) * np.int64(n) + v)
        u, v = uk // n, uk % n

    m = np.int64(labels.size) + 1
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    metrics: list[dict] = []
    k = -1
    for k in range(total):
        t0 = time.monotonic()
        new = code.copy()
        voting = code[u] >= 0 if len(u) else np.zeros(0, bool)
        if voting.any():
            keys, cnt = np.unique(v[voting] * m + code[u][voting], return_counts=True)
            vi, ci = keys // m, keys % m
            # argmax with (count desc, code asc) tie-break: lexsort is
            # stable last-key-primary, so order by vi, then -cnt, then ci
            order = np.lexsort((ci, -cnt, vi))
            first = np.ones(len(order), bool)
            first[1:] = vi[order][1:] != vi[order][:-1]
            new[vi[order][first]] = ci[order][first]
        changed = None if fixed else float((new != code).sum())
        code = new
        converged = (not fixed) and changed == 0.0
        metrics.append(_metric(k, changed, t0, converged))
        if converged:
            break

    out = np.full(n, None, dtype=object)
    has = code >= 0
    if labels.size:
        out[has] = labels[code[has]]
    pdf = pd.DataFrame({"id": ids, "label": out})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, label string"),
        supersteps=k + 1,
        metrics=metrics,
    )


# ----------------------------------------------------------------------
# Triangle count
# ----------------------------------------------------------------------
def triangle_count_local(graph: Graph, wedge_budget: int = 8_000_000) -> int:
    """Exact global triangle count — compact-forward with (degree, id)
    orientation, identical semantics to triangles.py (simple
    undirected graph: direction, parallel edges and self-loops
    collapse first).

    Wedge enumeration runs in chunks bounded by ``wedge_budget``
    expanded wedges (each chunk fully vectorized), so peak memory is
    O(budget) regardless of how hub-heavy a stretch of edges is —
    the orientation already bounds any single vertex's oriented
    out-degree at O(√m), the budget bounds the sum.
    """
    spark = graph.spark
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0 or len(si) == 0:
        return 0

    # simple undirected edges: drop self-loops, canonicalize, dedup
    a, b = np.minimum(si, di), np.maximum(si, di)
    keep = a != b
    if not keep.any():
        return 0
    ck = np.unique(a[keep].astype(np.int64) * np.int64(n) + b[keep])
    a, b = ck // n, ck % n
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    okey = deg.astype(np.int64) * n + np.arange(n)  # (deg, id) lex key
    fwd = okey[a] < okey[b]
    u = np.where(fwd, a, b)
    v = np.where(fwd, b, a)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]

    # CSR over the oriented DAG + sorted closing-edge key set
    outdeg = np.bincount(u, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(outdeg)])
    ekey = np.sort(u.astype(np.int64) * n + v)

    k_per_edge = outdeg[v]  # wedges each edge (u,v) contributes
    bounds = np.searchsorted(np.cumsum(k_per_edge), np.arange(0, k_per_edge.sum() + wedge_budget, wedge_budget), side="left")
    total = 0
    for s, e in zip(bounds, np.append(bounds[1:], len(u))):
        if s >= e:
            continue
        ev, k = v[s:e], k_per_edge[s:e]
        wu = np.repeat(u[s:e], k)  # wedge first endpoint x
        # gather each v's oriented out-neighbors w: index ranges
        # [indptr[v], indptr[v]+k) concatenated, fully vectorized
        csum = np.cumsum(k)
        offs = np.arange(csum[-1]) - np.repeat(csum - k, k) + np.repeat(indptr[ev], k)
        ww = v[offs]
        wk = wu.astype(np.int64) * n + ww
        pos = np.searchsorted(ekey, wk)
        pos_c = np.minimum(pos, len(ekey) - 1)
        total += int(((pos < len(ekey)) & (ekey[pos_c] == wk)).sum())
    return total


# ----------------------------------------------------------------------
# Strongly connected components
# ----------------------------------------------------------------------
def scc_local(graph: Graph, max_iters: int = 30) -> SuperstepResult:
    """Driver-numpy twin of algorithms/scc.py — the same trimmed
    FW-BW coloring, vectorized: trim via ``bincount`` peeling, forward
    coloring via ``np.maximum.at`` rounds (the third operand is
    gathered eagerly, so each call is one synchronous superstep),
    backward reach via a boolean edge scan. Same canonical output
    (``scc`` = min member id) and the same raise-on-``max_iters``
    contract as the distributed tier (equality-tested against an
    independent iterative Tarjan in tests/test_scc.py)."""
    spark = graph.spark
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, scc long"), supersteps=0)

    # strong connectivity ignores self-loops and edge multiplicity
    m = si != di
    si, di = si[m].astype(np.int64), di[m].astype(np.int64)
    if len(si):
        key = np.unique(si * np.int64(n) + di)
        si, di = key // n, key % n

    scc = np.full(n, -1, np.int64)
    alive = np.ones(n, bool)
    metrics: list[dict] = []
    k = -1
    for k in range(max_iters):
        t0 = time.monotonic()
        # trim to fixpoint (cheap locally — unlike the distributed
        # tier's bounded trim_rounds, full peeling costs ~nothing here)
        while True:
            em = alive[si] & alive[di]
            outd = np.bincount(si[em], minlength=n)
            ind = np.bincount(di[em], minlength=n)
            dead = alive & ((outd == 0) | (ind == 0))
            if not dead.any():
                break
            scc[dead] = ids[dead]
            alive[dead] = False
        if not alive.any():
            metrics.append(_metric(k, 0.0, t0, True))
            break
        em = alive[si] & alive[di]
        es, ed = si[em], di[em]

        # forward HashMax coloring over vertex positions
        color = np.arange(n, dtype=np.int64)
        while True:
            prev = color.copy()
            np.maximum.at(color, ed, color[es])
            if (color == prev).all():
                break

        # backward reach from color roots, within color
        reached = alive & (color == np.arange(n))
        while True:
            cand = reached[ed] & (color[es] == color[ed]) & ~reached[es]
            if not cand.any():
                break
            reached[es[cand]] = True

        sel = alive & reached
        mins = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, color[sel], ids[sel])
        scc[sel] = mins[color[sel]]
        alive[sel] = False
        done = not alive.any()
        metrics.append(_metric(k, float(alive.sum()), t0, done))
        if done:
            break
    if alive.any():
        raise RuntimeError(
            f"scc did not assign every vertex in max_iters={max_iters} outer "
            f"rounds ({int(alive.sum())} unassigned) — raise max_iters"
        )
    pdf = pd.DataFrame({"id": ids, "scc": scc})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, scc long"),
        supersteps=k + 1,
        metrics=metrics,
    )


# ----------------------------------------------------------------------
# k-core decomposition
# ----------------------------------------------------------------------
def kcore_local(
    graph: Graph, num_iters: int | None = None, max_iters: int = 100
) -> SuperstepResult:
    """Driver-numpy twin of algorithms/kcore.py: same h-index
    propagation on the simple undirected graph, each round one
    lexsort (dst asc, value desc) + per-group rank + ``maximum.at``
    fold — the vectorized spelling of the window+aggregate round.
    Same fixed/fixpoint modes and the same raise-on-``max_iters``
    contract (integer state, bit-comparable)."""
    spark = graph.spark
    ids, si, di = _collect_graph(graph)
    _guard(spark, len(si))
    n = len(ids)
    if n == 0:
        return SuperstepResult(state=spark.createDataFrame([], "id long, core long"), supersteps=0)

    # simple undirected: drop self-loops, canonicalize, dedup, both ways
    a, b = np.minimum(si, di), np.maximum(si, di)
    keep = a != b
    key = np.unique(a[keep].astype(np.int64) * np.int64(n) + b[keep])
    a, b = key // n, key % n
    es = np.concatenate([a, b])
    ed = np.concatenate([b, a])

    core = np.bincount(es, minlength=n).astype(np.int64)
    fixed = num_iters is not None
    total = num_iters if fixed else max_iters
    metrics: list[dict] = []
    k = -1
    for k in range(total):
        t0 = time.monotonic()
        if len(es):
            order = np.lexsort((-core[es], ed))
            gd, gv = ed[order], core[es][order]
            starts = np.flatnonzero(np.r_[True, gd[1:] != gd[:-1]])
            counts = np.diff(np.r_[starts, len(gd)])
            rn = np.arange(len(gd)) - np.repeat(starts, counts) + 1
            h = np.zeros(n, np.int64)
            np.maximum.at(h, gd, np.minimum(rn, gv))
        else:
            h = np.zeros(n, np.int64)
        changed = None if fixed else float((h != core).sum())
        core = h
        converged = (not fixed) and changed == 0.0
        metrics.append(_metric(k, changed, t0, converged))
        if converged:
            break
    if not fixed and not (metrics and metrics[-1]["converged"]):
        raise RuntimeError(
            f"kcore did not reach its fixpoint in max_iters={max_iters} rounds — "
            f"raise max_iters (no silent partial coreness)"
        )
    pdf = pd.DataFrame({"id": ids, "core": core})
    return SuperstepResult(
        state=spark.createDataFrame(pdf, "id long, core long"),
        supersteps=k + 1,
        metrics=metrics,
    )
