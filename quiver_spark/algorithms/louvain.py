"""Louvain community detection via conflict-free parallel moves +
Borůvka-style level contraction.

Beyond the SURVEY §2 inventory; Louvain (Blondel, Guillaume, Lambiotte
& Lefebvre, "Fast unfolding of communities in large networks", J.
Stat. Mech. 2008) is THE standard modularity-maximizing community
operator a link-graph user runs after the cheap partitioners the
engine already ships (connected components, label propagation, SCC) —
it optimizes the same Newman–Girvan Q that ``community.modularity``
scores, over the same simple undirected view [pub: Verizon/quiver
core/src/main/scala/quiver/Graph.scala#neighbors]. The parallel
formulation is in the spirit of the parallel-Louvain literature (Lu,
Halappanavar & Kalyanaraman, "Parallel heuristics for scalable
community detection", Parallel Computing 2015), but replaces their
heuristic anti-swap rules with a selection whose per-round gain is
EXACT (below).

Objective: for partition C over the level graph with integer edge
weights, self-loop convention ``ki = Σ_{b≠a} w + 2·w_self`` and
``S = Σ ki = 2W``,

    Q = Σ_c ( W_in_c / W − (dtot_c / S)² )

which at level 0 (unweighted canonical edges, no self-loops) is
EXACTLY ``community.modularity``'s Q — law-tested. All comparisons
run on integer-scaled forms: move gains on ``2·(s − ss)`` with
``s = S·k_i→C − ki·Σtot_C`` and ``ss = S·k_i→A∖i − ki·(Σtot_A − ki)``
(the ΔQ numerator scaled by 4W²), and the per-round invariant on
``Qnum = 2S·W_in − Σ_c dtot_c²`` (Q scaled by 4W²) — no fp anywhere,
so the pure-pandas twin and the DuckDB twin are bit-comparable and
ties cannot depend on summation order.

Round structure (the classic parallel-Louvain failure modes — swap
livelock A⇄B, chain moves A→B while B→C, Σtot races when two movers
share a target — are all closed STRUCTURALLY, not heuristically):

1. **Global candidate set.** Every vertex's best external community
   by exact integer gain against the current synchronous state
   (argmax tie-break: smallest community id), kept only when it
   strictly beats staying. An empty set is the level's convergence
   test. No execution-order dependence anywhere.
2. **Full-set fast path, gated on the exact Qnum.** The round first
   applies ALL candidates (classic synchronous Louvain) and accepts
   iff the recomputed integer ``Qnum`` strictly increased — in the
   bulk phase aggregate gains dwarf the interaction terms and this
   almost always passes, so most of the work happens at full
   parallelism.
3. **Role-partitioned budgeted fallback — guaranteed positive
   progress.** When the full set is rejected (interactions won), the
   round applies a provably-improving subset instead:

   a. Every touched community gets ONE role — its
      ``(gain, −p, −id)``-max toucher decides (``p`` = fresh
      per-round M31 hash priority from the shared ``anf.fm_params``
      walk; the double-mod normalizes Spark C-``%`` and numpy
      floor-``%``): **loser** if that candidate leaves it,
      **receiver** if it joins it. A candidate survives only if its
      source is a loser AND its target a receiver — so no community
      both gains and loses members in one round (the chain-move
      A→B‖B→C hazard, structurally excluded).
   b. Within the surviving set, admission walks the deterministic
      total order (gain desc, p asc, id asc) with per-community
      prefix budgets: admit i iff
      ``gain_i > ki·(cum_out(A_i) + cum_in(C_i))`` where the cums are
      the ki-sums of EARLIER candidates on the same source/target
      (two window functions). Interaction accounting (the proof,
      term by term): same-receiver and same-loser pairs cost
      ``−2·ki·kj`` in the dtot² sum and can only ADD unpredicted
      internal weight (``+2S·w_ij`` when adjacent); mixed
      join+leave on one community — the only pair shape with an
      unpredicted LOSS — is excluded by the roles; cross-community
      pairs are exact. Hence realized ΔQnum ≥
      Σ 2·(gain_i − ki·cum_i) > 0: every fallback round strictly
      advances Qnum, and the global-max candidate always survives
      with zero cums, so ≥ 1 move applies. The engine still
      recomputes Qnum and RAISES if this invariant is ever violated
      (a bug tripwire, not a control path). Qnum is bounded by S²
      and strictly increases every round (either path), so
      termination is structural and oscillation (the A⇄B swap
      livelock) is impossible.

   Design history (in git): a Qnum-gated adaptive class ladder
   drained ~1000 residual candidates one hash class at a time (140+
   rounds at 20k vertices); strict one-move-per-community disjoint
   selection fixed that tail but admitted only ONE joiner per hub
   per round — on a real power-law graph 6200 hub-bound candidates
   drained at one per round. The budgeted rule admits a hub's
   joiners while the marginal ``ki·K`` interaction stays below the
   candidate's gain — thousands per round at link-graph skew
   (measured on the 20k-vertex zipf graph: [14, 10, 4, 1] rounds,
   and the stalled power-law probe converges in seconds).

Level loop: when no vertex has a strict-gain move, communities
contract to supervertices (community-pair weight aggregate,
intra-community weight becomes the supervertex self-loop, ``ki``
member-aggregated; Q of the contracted graph equals Q of the composed
partition on the original graph — the Louvain invariant; S is
level-constant). The algorithm stops at the first level with no
applied move. Final labels canonicalize to the min original member
id, like components/scc.

Plan shape & 100 TB notes (smj tier):

- Per round: one both-orientation edges ⋈ state join (vertex-keyed,
  the labelprop message shape) → one (vertex, neighbor-community)
  algebraic sum with map-side combine (hub fan-in bounded at one row
  per upstream task) → argmax → the community-claim argmax (an
  algebraic max over ≤ 2·|candidates| rows) → one state join-back;
  the invariant check adds one edges ⋈ state ⋈ state internal-weight
  scalar. No all-pairs term anywhere.
- The carried level graph SHRINKS geometrically across levels (like
  msf's contraction), so total work is dominated by level 0 — the
  deepest levels run on community-count-sized tables.
- Convergence scalars (candidate counts, W_in, Σ dtot²) are driver
  one-row reads, like every runner convergence check; state is
  checkpoint-truncated per round so plan statistics cannot compound
  (superstep.py).
- Skew: every aggregate (k_i→C, Σtot, community claims) is algebraic
  — a hub community's rows combine map-side. The edges ⋈ state join
  shuffles on vertex id like every flagship round.
- Exactness bound: int64 scores need ``S < ~3.03e9`` (S·k and Σ dtot²
  both bounded by S²); the operator RAISES past it rather than
  silently overflowing — the documented recipe beyond is
  double-precision scores (±1-ulp tie risk) or 128-bit decimal
  scores, not built until a workload needs one.

Tiers: ``local`` (pure-pandas twin below, shared verbatim with the
Spark-free oracle materializer — queries.py ``louvain_parts``) under
the conf-guarded ``localMaxEdges`` threshold, else ``smj``. No mirror
tier yet: the per-round state is (comm, ki, Σtot) — the bhj recipe
(broadcast state over pre-partitioned edges, like kcore's) applies
unchanged when a mirror-sized workload shows up.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.algorithms.anf import M31, fm_params
from quiver_spark.superstep import truncated_checkpoint

LOUVAIN_SEED = 20260821
# int64 exactness: every score/acceptance term is bounded by S², so
# S = 2W must stay under sqrt(2^63) ≈ 3.04e9 summed edge weight
MAX_EXACT_S = 3_000_000_000


def _trace(msg: str) -> None:
    """Bench/debug visibility (env QUIVER_LOUVAIN_PROGRESS=1): per-round
    counts/Qnum/wall on stderr. Off by default — the operator's public
    signal is the LouvainResult history, like every flagship's
    metrics."""
    if os.environ.get("QUIVER_LOUVAIN_PROGRESS"):
        print(f"louvain: {msg}", file=sys.stderr, flush=True)


def _round_params(r: int, seed: int) -> tuple[int, int]:
    """Per-round Luby-style priority parameters from the shared
    fm_params walk (fresh every applied round, like mis.py's rounds;
    indexed by the global accepted-round counter so no two rounds of a
    run share a priority draw)."""
    return fm_params(r + 1, seed)[r]


@dataclass
class LouvainResult:
    """``assignment``: (id, comm) with comm = min original member id;
    ``qnum_history``: the exact integer 4W²-scaled Q after each
    applied round (strictly increasing — the termination witness);
    ``s_total``: S = 2W (level-constant)."""

    assignment: DataFrame | pd.DataFrame
    n_levels: int
    rounds_per_level: list[int] = field(default_factory=list)
    qnum_history: list[int] = field(default_factory=list)
    s_total: int = 0

    @property
    def q(self) -> float:
        """Final modularity — the only fp in the operator."""
        if not self.qnum_history:
            return 0.0
        return float(self.qnum_history[-1]) / float(self.s_total) ** 2


def louvain(
    graph: Graph,
    weight_col: str | None = None,
    max_rounds: int = 256,
    max_levels: int = 20,
    seed: int = LOUVAIN_SEED,
    strategy: str = "auto",
    tail_tol: float = 0.0,
) -> LouvainResult:
    """Louvain over ``graph``'s simple undirected view. Unweighted by
    default (parallel edges collapse, matching ``community
    .modularity``); ``weight_col`` sums parallel-edge weights instead
    (cast to long — integer weights are the exactness contract).
    Self-loops drop at level 0 (contraction introduces the internal
    ones). ``max_rounds`` bounds rounds per level and RAISES on hit
    (no silent partial optimum, the kcore/scc contract); termination
    is otherwise structural (Qnum strictly increases every round).

    ``tail_tol`` is the standard Louvain gain-threshold knob (Blondel
    et al. stop a pass when the sweep gain falls under a small ε): a
    level ends once a round's realized ΔQ ≤ tail_tol (the round
    itself is kept — it improved). 0.0 (default) = run every level to
    its exact local-moving fixpoint — the oracle/test semantics. The
    measured motivation: on a 1M-edge power-law graph the exact tail
    spends ~250 rounds on ΔQ ≈ 2.5e-6 crumbs worth ~1.5e-3 total Q;
    tail_tol=1e-5 trades that tail for ~3× fewer rounds. The fp
    product ``tail_tol·S²`` is computed ONCE into an integer gate, so
    the comparison stays engine-exact and deterministic."""
    spark = graph.spark
    if weight_col is None:
        canon = (
            graph.edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .dropDuplicates()
            .select("a", "b", F.lit(1).cast("long").alias("w"))
        )
    else:
        canon = (
            graph.edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
                F.col(weight_col).cast("long").alias("w"),
            )
            .where(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
    if strategy == "auto":
        from quiver_spark import tiering

        n_edges = canon.count()
        strategy = "local" if n_edges <= tiering.local_max_edges(spark) else "smj"
    if strategy == "local":
        return _louvain_local(
            graph, canon, max_rounds=max_rounds, max_levels=max_levels, seed=seed,
            tail_tol=tail_tol,
        )
    if strategy != "smj":
        raise ValueError(f"unknown louvain strategy {strategy!r} (local/smj/auto)")
    return _louvain_smj(
        graph, canon, max_rounds=max_rounds, max_levels=max_levels, seed=seed,
        tail_tol=tail_tol,
    )


# ---------------------------------------------------------------- smj tier
def _qnum_spark(canon: DataFrame, state: DataFrame, ctot: DataFrame, S: int) -> int:
    """Exact integer Qnum = 2S·W_in − Σ_c dtot_c² of the CURRENT level
    partition (equals the composed original-graph Q by the Louvain
    invariant). Self-loop rows (a == b) are always internal."""
    asg_a = state.select(F.col("id").alias("a"), F.col("comm").alias("pa"))
    asg_b = state.select(F.col("id").alias("b"), F.col("comm").alias("pb"))
    w_in = (
        canon.join(asg_a, "a")
        .join(asg_b, "b")
        .where(F.col("pa") == F.col("pb"))
        .agg(F.coalesce(F.sum("w"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )
    sq = ctot.agg(
        F.coalesce(F.sum(F.col("ct") * F.col("ct")), F.lit(0)).alias("s")
    ).collect()[0]["s"]
    return 2 * S * int(w_in) - int(sq)


def _candidates_smj(
    eb: DataFrame, state: DataFrame, ctot: DataFrame, S: int
) -> DataFrame:
    """The GLOBAL candidate-move set: every vertex whose best external
    community strictly beats staying, scored with the exact ΔQ
    numerators against the current synchronous state. Returns
    (id, ca, newc, gain) with gain = s − ss ≥ 1 — emptiness is the
    level's convergence test."""
    kic = (
        eb.join(
            state.select(F.col("id").alias("dst"), F.col("comm").alias("cn")), "dst"
        )
        .groupBy("src", "cn")
        .agg(F.sum("w").alias("k"))
    )
    info = state.select(F.col("id").alias("src"), F.col("comm").alias("ca"), "ki").join(
        ctot.select(F.col("comm").alias("ca"), F.col("ct").alias("cta")), "ca"
    )
    scored = kic.join(info, "src").join(
        ctot.select(F.col("comm").alias("cn"), F.col("ct").alias("ctn")), "cn"
    )
    best = (
        scored.where(F.col("cn") != F.col("ca"))
        .select(
            "src",
            F.struct(
                (F.lit(S) * F.col("k") - F.col("ki") * F.col("ctn")).alias("s"),
                (-F.col("cn")).alias("nc"),
            ).alias("sc"),
        )
        .groupBy("src")
        .agg(F.max("sc").alias("m"))
    )
    stay_k = scored.where(F.col("cn") == F.col("ca")).select("src", "k")
    return (
        info.join(best, "src")
        .join(stay_k, "src", "left")
        .withColumn(
            "ss",
            F.lit(S) * F.coalesce(F.col("k"), F.lit(0))
            - F.col("ki") * (F.col("cta") - F.col("ki")),
        )
        .where(F.col("m.s") > F.col("ss"))
        .select(
            F.col("src").alias("id"),
            "ca",
            (-F.col("m.nc")).alias("newc"),
            (F.col("m.s") - F.col("ss")).alias("gain"),
            "ki",
        )
    )


def _select_budgeted_smj(cand: DataFrame, a_h: int, b_h: int) -> DataFrame:
    """Role-partitioned budgeted admission (docstring §3): communities
    get one role each (loser/receiver, decided by their
    (gain, −p, −id)-max toucher), then per-community prefix budgets
    ``gain > ki·(cum_out + cum_in)`` admit movers in deterministic
    order. Realized ΔQnum ≥ Σ 2·(gain − ki·cum) > 0 — proof in the
    module docstring."""
    from pyspark.sql import Window

    pr = cand.withColumn(
        "p",
        (
            (F.lit(a_h) * (F.col("id") % F.lit(M31)) + F.lit(b_h)) % F.lit(M31)
            + F.lit(M31)
        )
        % F.lit(M31),
    )
    touch = pr.select(
        F.col("ca").alias("comm"), "gain", "p", "id", F.lit(True).alias("is_out")
    ).unionByName(
        pr.select(
            F.col("newc").alias("comm"), "gain", "p", "id", F.lit(False).alias("is_out")
        )
    )
    # each candidate touches a community at most once (ca != newc), so
    # (gain, −p, −id) is unique per comm group and is_out rides along
    win = touch.groupBy("comm").agg(
        F.max(
            F.struct(
                "gain", (-F.col("p")).alias("np"), (-F.col("id")).alias("ni"), "is_out"
            )
        ).alias("w")
    )
    roles = win.select("comm", F.col("w.is_out").alias("out_role"))
    surv = pr.join(
        roles.where(F.col("out_role")).select(F.col("comm").alias("ca")), "ca"
    ).join(
        roles.where(~F.col("out_role")).select(F.col("comm").alias("newc")), "newc"
    )
    order = [F.desc("gain"), F.asc("p"), F.asc("id")]
    w_out = (
        Window.partitionBy("ca")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_in = (
        Window.partitionBy("newc")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        surv.withColumn(
            "cum",
            F.coalesce(F.sum("ki").over(w_out), F.lit(0))
            + F.coalesce(F.sum("ki").over(w_in), F.lit(0)),
        )
        .where(F.col("gain") > F.col("ki") * F.col("cum"))
        .select("id", "newc")
    )


def _louvain_smj(
    graph: Graph, canon0: DataFrame, max_rounds: int, max_levels: int, seed: int,
    tail_tol: float = 0.0,
) -> LouvainResult:
    spark = graph.spark
    canon = canon0.persist()
    canon.count()
    # level-0 ki (no self-loops yet) + isolated vertices at ki = 0
    ends = canon.select(F.col("a").alias("id"), "w").unionByName(
        canon.select(F.col("b").alias("id"), "w")
    )
    ki0 = ends.groupBy("id").agg(F.sum("w").alias("ki"))
    verts = graph.vertices.select("id").join(ki0, "id", "left").select(
        "id", F.coalesce(F.col("ki"), F.lit(0)).cast("long").alias("ki")
    )
    srow = verts.agg(F.coalesce(F.sum("ki"), F.lit(0)).alias("s")).collect()[0]
    S = int(srow["s"])
    if S >= MAX_EXACT_S:
        raise ValueError(
            f"louvain int64 exact-score bound exceeded: S=2W={S} ≥ {MAX_EXACT_S} "
            "(scores are bounded by S²) — shard the graph or build the "
            "double-score variant"
        )
    # the one fp product, computed once — both engines share the gate
    gate = int(tail_tol * float(S) * float(S))
    # asg_total: original id → current supervertex (composed across levels)
    asg_total = truncated_checkpoint(verts.select("id", F.col("id").alias("cur")))
    rounds_per_level: list[int] = []
    qnum_hist: list[int] = []
    n_levels = 0
    level_cached: list[DataFrame] = []

    def _release() -> None:
        for df in level_cached:
            df.unpersist()
        level_cached.clear()

    try:
        for level in range(max_levels):
            state = truncated_checkpoint(
                verts.select("id", F.col("id").alias("comm"), "ki")
            )
            eb = (
                canon.where(F.col("a") != F.col("b"))
                .select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
                .unionByName(
                    canon.where(F.col("a") != F.col("b")).select(
                        F.col("b").alias("src"), F.col("a").alias("dst"), "w"
                    )
                )
                .persist()
            )
            eb.count()
            level_cached.append(eb)
            ctot = state.groupBy("comm").agg(F.sum("ki").alias("ct"))
            q_prev = _qnum_spark(canon, state, ctot, S)
            if not qnum_hist:
                qnum_hist.append(q_prev)
            moved_any = False
            r = 0
            while True:
                if r >= max_rounds:
                    raise RuntimeError(
                        f"louvain level {level} did not converge in "
                        f"max_rounds={max_rounds} — raise max_rounds "
                        "(no silent partial optimum)"
                    )
                t_r = time.monotonic()
                cand = truncated_checkpoint(_candidates_smj(eb, state, ctot, S))
                n_cand = cand.count()
                r += 1
                if n_cand == 0:
                    _trace(
                        f"level={level} r={r-1} converged "
                        f"wall={time.monotonic()-t_r:.2f}s"
                    )
                    break  # no strict-gain move anywhere: level done

                def _apply(movers: DataFrame) -> tuple[DataFrame, DataFrame, int]:
                    ns = truncated_checkpoint(
                        state.join(movers, "id", "left").select(
                            "id",
                            F.coalesce(F.col("newc"), F.col("comm")).alias("comm"),
                            "ki",
                        )
                    )
                    nc = ns.groupBy("comm").agg(F.sum("ki").alias("ct"))
                    return ns, nc, _qnum_spark(canon, ns, nc, S)

                # fast path: the full candidate set (classic synchronous
                # Louvain), accepted iff exact Qnum strictly increased
                new_state, new_ctot, q_new = _apply(cand.select("id", "newc"))
                path = "full"
                if q_new <= q_prev:
                    # interactions won: role-partitioned budgeted
                    # fallback, realized gain provably > 0
                    a_h, b_h = _round_params(len(qnum_hist) - 1, seed)
                    new_state, new_ctot, q_new = _apply(
                        _select_budgeted_smj(cand, a_h, b_h)
                    )
                    path = "budgeted"
                    if q_new <= q_prev:
                        raise RuntimeError(
                            "louvain invariant violated: a budgeted "
                            f"round did not increase Qnum ({q_prev} → {q_new})"
                            " — this is a bug, please report"
                        )
                _trace(
                    f"level={level} r={r-1} cand={n_cand} path={path} "
                    f"dq={q_new-q_prev} wall={time.monotonic()-t_r:.2f}s"
                )
                dq = q_new - q_prev
                state, ctot, q_prev = new_state, new_ctot, q_new
                qnum_hist.append(q_new)
                moved_any = True
                if dq <= gate:
                    break  # tail_tol: crumbs — keep the round, end the level
            rounds_per_level.append(r)
            n_levels = level + 1
            if not moved_any:
                break
            # contract: communities become supervertices
            lvl_map = state.select("id", "comm")
            asg_total = truncated_checkpoint(
                asg_total.join(
                    lvl_map.withColumnRenamed("id", "cur"), "cur"
                ).select("id", F.col("comm").alias("cur"))
            )
            new_canon = truncated_checkpoint(
                canon.join(
                    lvl_map.select(F.col("id").alias("a"), F.col("comm").alias("ca")),
                    "a",
                )
                .join(
                    lvl_map.select(F.col("id").alias("b"), F.col("comm").alias("cb")),
                    "b",
                )
                .groupBy(
                    F.least("ca", "cb").alias("a"), F.greatest("ca", "cb").alias("b")
                )
                .agg(F.sum("w").alias("w"))
            )
            new_verts = truncated_checkpoint(
                state.groupBy(F.col("comm").alias("id")).agg(F.sum("ki").alias("ki"))
            )
            n_old = verts.count()
            n_new = new_verts.count()
            _release()
            canon.unpersist()
            canon = new_canon.persist()
            canon.count()
            verts = new_verts
            if n_new >= n_old:
                break  # pure label swaps, contraction is the identity
        else:
            raise RuntimeError(
                f"louvain did not stabilize in max_levels={max_levels} levels"
            )
    finally:
        _release()
        canon.unpersist()
    canon_map = asg_total.groupBy("cur").agg(F.min("id").alias("comm"))
    assignment = asg_total.join(canon_map, "cur").select("id", "comm")
    return LouvainResult(
        assignment=assignment,
        n_levels=n_levels,
        rounds_per_level=rounds_per_level,
        qnum_history=qnum_hist,
        s_total=S,
    )


# ------------------------------------------------------------- local twin
def louvain_local_arrays(
    ids: np.ndarray,
    ea: np.ndarray,
    eb: np.ndarray,
    ew: np.ndarray,
    max_rounds: int = 256,
    max_levels: int = 20,
    seed: int = LOUVAIN_SEED,
    tail_tol: float = 0.0,
) -> tuple[pd.DataFrame, LouvainResult]:
    """Pure-pandas/numpy twin of the smj tier — SAME candidate scores,
    community-disjoint selection, priorities and contraction, bit-equal
    assignment (equality-tested through the algorithm in
    tests/test_louvain.py). Spark-free on purpose: queries.py's oracle
    materializer runs it without a session, the same trick as
    ingest.synthesize_repo_pandas.

    Inputs: vertex ids and canonical simple edges (a < b, no
    self-loops, integer weights). Returns (assignment DataFrame
    (id, comm), LouvainResult with the pandas frame attached)."""
    ids = np.asarray(ids, dtype=np.int64)
    a = np.asarray(ea, dtype=np.int64)
    b = np.asarray(eb, dtype=np.int64)
    w = np.asarray(ew, dtype=np.int64)
    verts = pd.DataFrame({"id": ids})
    kis = (
        pd.concat([pd.DataFrame({"id": a, "w": w}), pd.DataFrame({"id": b, "w": w})])
        .groupby("id")["w"]
        .sum()
    )
    verts["ki"] = verts["id"].map(kis).fillna(0).astype(np.int64)
    S = int(verts["ki"].sum())
    if S >= MAX_EXACT_S:
        raise ValueError(f"louvain int64 exact-score bound exceeded: S={S}")
    gate = int(tail_tol * float(S) * float(S))
    canon = pd.DataFrame({"a": a, "b": b, "w": w})
    asg_total = pd.DataFrame({"id": ids, "cur": ids})
    rounds_per_level: list[int] = []
    qnum_hist: list[int] = []
    n_levels = 0

    def _qnum(canon_df: pd.DataFrame, comm: pd.Series, ctot: pd.Series) -> int:
        pa = canon_df["a"].map(comm).to_numpy()
        pb = canon_df["b"].map(comm).to_numpy()
        w_in = int(canon_df["w"].to_numpy()[pa == pb].sum())
        sq = int((ctot.to_numpy().astype(object) ** 2).sum())
        return 2 * S * w_in - sq

    for level in range(max_levels):
        vid = verts["id"].to_numpy()
        comm = pd.Series(vid.copy(), index=vid)  # id → comm
        ki = pd.Series(verts["ki"].to_numpy(), index=vid)
        nz = canon[canon["a"] != canon["b"]]
        ebt = pd.DataFrame(
            {
                "src": np.concatenate([nz["a"].to_numpy(), nz["b"].to_numpy()]),
                "dst": np.concatenate([nz["b"].to_numpy(), nz["a"].to_numpy()]),
                "w": np.concatenate([nz["w"].to_numpy(), nz["w"].to_numpy()]),
            }
        )
        ctot = ki.groupby(comm.reindex(ki.index).to_numpy()).sum()
        q_prev = _qnum(canon, comm, ctot)
        if not qnum_hist:
            qnum_hist.append(q_prev)
        moved_any = False
        r = 0
        while True:
            if r >= max_rounds:
                raise RuntimeError(
                    f"louvain level {level} did not converge in max_rounds={max_rounds}"
                )
            r += 1
            # global candidate set — mirrors _candidates_smj exactly
            kic = (
                ebt.assign(cn=ebt["dst"].map(comm).to_numpy())
                .groupby(["src", "cn"], as_index=False)["w"]
                .sum()
                .rename(columns={"w": "k"})
            )
            kic["ca"] = kic["src"].map(comm).to_numpy()
            kic["ki"] = kic["src"].map(ki).to_numpy()
            kic["ctn"] = kic["cn"].map(ctot).to_numpy()
            kic["cta"] = kic["ca"].map(ctot).to_numpy()
            ext = kic[kic["cn"] != kic["ca"]].copy()
            if len(ext):
                ext["s"] = S * ext["k"] - ext["ki"] * ext["ctn"]
                ext = ext.sort_values(
                    ["src", "s", "cn"], ascending=[True, False, True], kind="mergesort"
                ).drop_duplicates("src")
                stay = kic[kic["cn"] == kic["ca"]][["src", "k"]].rename(
                    columns={"k": "k_stay"}
                )
                ext = ext.merge(stay, on="src", how="left")
                ext["k_stay"] = ext["k_stay"].fillna(0).astype(np.int64)
                ext["ss"] = S * ext["k_stay"] - ext["ki"] * (ext["cta"] - ext["ki"])
                cand = ext[ext["s"] > ext["ss"]].copy()
            else:
                cand = ext
            if len(cand) == 0:
                break  # no strict-gain move anywhere: level done

            def _apply(mv: pd.DataFrame):
                nc = comm.copy()
                nc.loc[mv["src"].to_numpy()] = mv["cn"].to_numpy()
                nct = ki.groupby(nc.reindex(ki.index).to_numpy()).sum()
                return nc, nct, _qnum(canon, nc, nct)

            # fast path: apply ALL candidates — mirrors the smj tier
            new_comm, new_ctot, q_new = _apply(cand)
            _path = "full"
            if q_new <= q_prev:
                # role-partitioned budgeted fallback — mirrors
                # _select_budgeted_smj exactly
                a_h, b_h = _round_params(len(qnum_hist) - 1, seed)
                cand["gain"] = cand["s"] - cand["ss"]
                cand["p"] = (a_h * (cand["src"].to_numpy() % M31) + b_h) % M31
                touch = pd.concat(
                    [
                        cand[["ca", "gain", "p", "src"]]
                        .rename(columns={"ca": "comm"})
                        .assign(is_out=True),
                        cand[["cn", "gain", "p", "src"]]
                        .rename(columns={"cn": "comm"})
                        .assign(is_out=False),
                    ]
                )
                touch = touch.sort_values(
                    ["comm", "gain", "p", "src"],
                    ascending=[True, False, True, True],
                    kind="mergesort",
                ).drop_duplicates("comm")
                out_role = pd.Series(
                    touch["is_out"].to_numpy(), index=touch["comm"].to_numpy()
                )
                surv = cand[
                    cand["ca"].map(out_role).to_numpy()
                    & ~cand["cn"].map(out_role).to_numpy()
                ].copy()
                surv = surv.sort_values(
                    ["gain", "p", "src"],
                    ascending=[False, True, True],
                    kind="mergesort",
                )
                cum_out = surv.groupby("ca")["ki"].cumsum() - surv["ki"]
                cum_in = surv.groupby("cn")["ki"].cumsum() - surv["ki"]
                mv = surv[surv["gain"] > surv["ki"] * (cum_out + cum_in)]
                new_comm, new_ctot, q_new = _apply(mv)
                _path = f"budgeted({len(mv)})"
                if q_new <= q_prev:
                    raise RuntimeError(
                        "louvain invariant violated: a budgeted round "
                        f"did not increase Qnum ({q_prev} → {q_new}) — this is "
                        "a bug, please report"
                    )
            _trace(
                f"local level={level} r={r-1} cand={len(cand)} path={_path} "
                f"dq={q_new-q_prev}"
            )
            dq = q_new - q_prev
            comm, ctot, q_prev = new_comm, new_ctot, q_new
            qnum_hist.append(q_new)
            moved_any = True
            if dq <= gate:
                break  # tail_tol: crumbs — keep the round, end the level
        rounds_per_level.append(r)
        n_levels = level + 1
        if not moved_any:
            break
        # contract
        asg_total["cur"] = asg_total["cur"].map(comm).to_numpy()
        ca = canon["a"].map(comm).to_numpy()
        cb = canon["b"].map(comm).to_numpy()
        new_canon = (
            pd.DataFrame(
                {
                    "a": np.minimum(ca, cb),
                    "b": np.maximum(ca, cb),
                    "w": canon["w"].to_numpy(),
                }
            )
            .groupby(["a", "b"], as_index=False)["w"]
            .sum()
        )
        new_verts = (
            pd.DataFrame({"id": comm.reindex(ki.index).to_numpy(), "ki": ki.to_numpy()})
            .groupby("id", as_index=False)["ki"]
            .sum()
        )
        n_old, n_new = len(verts), len(new_verts)
        canon, verts = new_canon, new_verts
        if n_new >= n_old:
            break
    else:
        raise RuntimeError(f"louvain did not stabilize in max_levels={max_levels}")
    canon_min = asg_total.groupby("cur")["id"].min()
    out = pd.DataFrame(
        {
            "id": asg_total["id"].to_numpy(),
            "comm": asg_total["cur"].map(canon_min).to_numpy(),
        }
    ).sort_values("id", kind="mergesort", ignore_index=True)
    res = LouvainResult(
        assignment=out,
        n_levels=n_levels,
        rounds_per_level=rounds_per_level,
        qnum_history=qnum_hist,
        s_total=S,
    )
    return out, res


def _louvain_local(
    graph: Graph, canon: DataFrame, max_rounds: int, max_levels: int, seed: int,
    tail_tol: float = 0.0,
) -> LouvainResult:
    """Driver-local tier: one Arrow collect of the canonical edge list
    + vertex ids (guarded upstream by ``auto``'s localMaxEdges route;
    explicit strategy='local' on a bigger graph is the caller's
    measured choice, like local_tier's other kernels)."""
    pe = canon.toPandas()
    pv = graph.vertices.select("id").toPandas()
    out, res = louvain_local_arrays(
        pv["id"].to_numpy(),
        pe["a"].to_numpy(),
        pe["b"].to_numpy(),
        pe["w"].to_numpy(),
        max_rounds=max_rounds,
        max_levels=max_levels,
        seed=seed,
        tail_tol=tail_tol,
    )
    sdf = graph.spark.createDataFrame(out, "id long, comm long")
    return LouvainResult(
        assignment=sdf,
        n_levels=res.n_levels,
        rounds_per_level=res.rounds_per_level,
        qnum_history=res.qnum_history,
        s_total=res.s_total,
    )
