"""ANF — the approximate neighborhood function N(v, h) = |{w :
dist(v, w) ≤ h}| per vertex, via Flajolet-Martin bitmask propagation
(Palmer, Gibbons & Faloutsos, "ANF: a fast and scalable tool for data
mining in massive graphs", KDD 2002; the modern register-compressed
descendant is Boldi-Vigna HyperANF, WWW 2011).

Beyond the SURVEY §2 inventory; the neighborhood function is the
classic whole-graph link-analysis sweep — effective diameter, vertex
"ball growth", spid — that quiver users compute after PageRank, and
the exact answer is an all-pairs BFS nobody runs at 10^12 files.

Algorithm: each vertex carries k fixed-width FM bitmasks. Mask j of
vertex v starts with exactly one bit set, drawn geometrically from a
seeded per-mask hash of v (bit b with probability 2^-(b+1)). One
round of

    M_h(v) = M_{h-1}(v) | OR_{v → u} M_{h-1}(u)

makes mask j of v the OR of init masks over every vertex within h
hops, because OR is idempotent/associative — duplicates on multiple
paths cost nothing. |N(v, h)| is then estimated from the average
least-significant-zero position over the k masks (2^(r/k) / 0.77351).

Everything is int64 bit arithmetic — NO floats in the state — so a
fixed-round run is bit-comparable against the unrolled DuckDB twin
(queries.py ``anf_parts``), the strongest oracle class in this repo.
The hash and both CASE ladders (geometric init bit,
least-significant-zero) are generated ONCE as plain ANSI-SQL text by
the ``fm_*_expr`` builders below and consumed by BOTH engines —
Spark via ``F.expr``, DuckDB verbatim — so engine parity is by
construction, not by parallel reimplementation. The arithmetic stays
under 2^62 (Mersenne-31 modulus, same trick as dedup.py's MinHash),
so no overflow wrap divergence between the engines is possible.

Superstep plan (one shuffle per round): messages = edges ⋈ state on
the expand side UNION the state rows themselves (tagged), then ONE
groupBy with k ``bit_or`` aggregates — map-side partial combine
applies, and the self-tagged copy lets change detection ride inside
the same aggregate (``bit_or(CASE WHEN self ...)`` recovers the old
mask) with zero extra joins. State is (k+1) longs per vertex.

100 TB notes: per-round shuffle volume is (E + V)·(k+1) longs with
map-side combine; k trades accuracy for bandwidth (k=8 here for the
oracle fixture; production accuracy wants k=64, still 520 B/vertex).
The compression path beyond that is HyperANF's HLL registers packed
into binary columns — same plan shape, smaller rows. Rounds to
saturation = graph diameter; link graphs are shallow. Runs on the
shared SuperstepRunner, so durable checkpoint/resume per round comes
from the same lineage machinery as the flagships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quiver_spark.graph import Graph
from quiver_spark.superstep import SuperstepResult, SuperstepRunner, truncated_checkpoint
from quiver_spark.traverse import _edges_for

M31 = (1 << 31) - 1
FM_MAGIC = 0.77351  # Flajolet-Martin bias correction constant


def fm_params(k: int, seed: int = 20260819) -> list[tuple[int, int]]:
    """k deterministic (a, b) hash-parameter pairs mod M31, a ≠ 0 —
    a splitmix-style integer walk, pure python ints so the SQL twins
    embed the identical literals."""
    out = []
    x = seed & 0x7FFFFFFF
    for _ in range(k):
        x = (x * 1103515245 + 12345) % M31
        a = x or 1
        x = (x * 1103515245 + 12345) % M31
        out.append((a, x))
    return out


def fm_hash_expr(a: int, b: int, col: str) -> str:
    """Shared ANSI-SQL text: h = (a·(col mod M31) + b) mod M31 ∈ [0, M31)."""
    return f"(({a} * ({col} % {M31}) + {b}) % {M31})"


def fm_init_expr(a: int, b: int, bits: int, col: str) -> str:
    """Shared ANSI-SQL text for the geometric init mask: the single
    bit 2^t where t = trailing zeros of the hash (P[t=b] = 2^-(b+1)),
    capped at bits-1. h % 2^(t+1) = 2^t picks out trailing-zeros = t
    with pure modulo arithmetic — no shift builtins (DuckDB spells
    shifts differently from Spark; modulo is identical)."""
    h = fm_hash_expr(a, b, col)
    whens = " ".join(
        f"WHEN {h} % {1 << (t + 1)} = {1 << t} THEN {1 << t}" for t in range(bits - 1)
    )
    return f"CAST(CASE {whens} ELSE {1 << (bits - 1)} END AS BIGINT)"


def fm_lsz_expr(bits: int, col: str) -> str:
    """Shared ANSI-SQL text for the least-significant ZERO bit
    position of a mask (the FM 'R' statistic): lowest zero at b ⟺
    m mod 2^(b+1) = 2^b − 1."""
    whens = " ".join(
        f"WHEN {col} % {1 << (b + 1)} = {(1 << b) - 1} THEN {b}" for b in range(bits)
    )
    return f"CAST(CASE {whens} ELSE {bits} END AS BIGINT)"


def _mask_cols(k: int) -> list[str]:
    return [f"m{j}" for j in range(k)]


def fm_init_state(ids: DataFrame, k: int, bits: int, seed: int) -> DataFrame:
    """(id, m0..m{k-1}) — each vertex's k one-bit geometric init masks."""
    exprs = [
        F.expr(fm_init_expr(a, b, bits, "id")).alias(m)
        for (a, b), m in zip(fm_params(k, seed), _mask_cols(k))
    ]
    return ids.select("id", *exprs)


def with_r_sum(state: DataFrame, k: int, bits: int) -> DataFrame:
    """Append the exact integer ``r_sum`` = Σ_j lsz(m_j). The float
    estimate |N(v,h)| ≈ 2^(r_sum/k) / 0.77351 is the caller's one
    ``pow``; keeping the oracle artifact integral is the point."""
    terms = [F.expr(fm_lsz_expr(bits, m)) for m in _mask_cols(k)]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return state.withColumn("r_sum", total.cast("long"))


def anf(
    graph: Graph,
    radius: int | None = None,
    k: int = 8,
    bits: int = 24,
    seed: int = 20260819,
    direction: str = "out",
    max_radius: int = 64,
    runner: SuperstepRunner | None = None,
) -> SuperstepResult:
    """Propagate FM masks ``radius`` rounds (fixed, oracle-grade
    bit-exact) or to saturation (``radius=None`` — masks stop
    changing, i.e. every mask equals the OR over the vertex's full
    reachable set; RAISES past ``max_radius``, no silent partial
    balls). Returns SuperstepResult with state (id, m0..m{k-1})."""
    spark = graph.spark
    runner = runner or SuperstepRunner(spark)
    edges = _edges_for(graph, direction).persist()
    edges.count()
    mcols = _mask_cols(k)
    state0 = fm_init_state(graph.vertices.select("id"), k, bits, seed)
    fixed = radius is not None
    total = radius if fixed else max_radius

    def step(state: DataFrame, h: int) -> tuple[DataFrame, float | None]:
        # messages: neighbor masks inbound to u for every edge u→v,
        # plus a self-tagged copy of the state so (a) OR-monotonicity
        # keeps previous-round bits and (b) the old mask rides the
        # same aggregate for in-frame change detection — one shuffle.
        nbr = edges.join(
            state.withColumnRenamed("id", "v"), "v"
        ).select(F.col("u").alias("id"), F.lit(False).alias("self"), *mcols)
        own = state.select("id", F.lit(True).alias("self"), *mcols)
        aggs = [F.bit_or(m).alias(m) for m in mcols]
        if not fixed:
            aggs += [
                F.bit_or(F.when(F.col("self"), F.col(m))).alias(f"_old_{m}") for m in mcols
            ]
        new_state = nbr.unionByName(own).groupBy("id").agg(*aggs)
        if fixed:
            return new_state, None
        changed_pred = None
        for m in mcols:
            p = F.col(m) != F.col(f"_old_{m}")
            changed_pred = p if changed_pred is None else (changed_pred | p)
        new_state = truncated_checkpoint(new_state.withColumn("_changed", changed_pred))
        changed = new_state.where("_changed").count()
        out = new_state.select("id", *mcols)
        out._qs_checkpointed = True  # noqa: SLF001 — runner contract
        return out, float(changed)

    try:
        res = runner.run(
            state0,
            step,
            tol=None if fixed else 0.0,
            max_iters=total,
            job_key=f"anf:k={k}:bits={bits}:seed={seed}:dir={direction}",
        )
    finally:
        edges.unpersist()
    if not fixed and not res.converged:
        raise RuntimeError(
            f"anf masks still growing after max_radius={max_radius} rounds — "
            f"raise max_radius (no silent partial neighborhood balls)"
        )
    return res


def neighborhood_function(
    graph: Graph,
    h_max: int,
    k: int = 8,
    bits: int = 24,
    seed: int = 20260819,
    direction: str = "out",
) -> list[tuple[int, int, int]]:
    """The whole-graph sweep: exact-integer rows (h, r_sum_total,
    n_vertices) for h = 0..h_max. r_sum_total = Σ_v r_sum(v); the
    float N(h) estimate and the effective diameter are one-liner
    post-processing (``effective_diameter``). Driver-side output is
    h_max+1 tuples — a sweep summary, not data."""
    edges = _edges_for(graph, direction).persist()
    mcols = _mask_cols(k)
    try:
        state = truncated_checkpoint(
            fm_init_state(graph.vertices.select("id"), k, bits, seed)
        )
        out = []
        for h in range(h_max + 1):
            if h > 0:
                nbr = edges.join(
                    state.withColumnRenamed("id", "v"), "v"
                ).select(F.col("u").alias("id"), *mcols)
                state = truncated_checkpoint(
                    nbr.unionByName(state.select("id", *mcols))
                    .groupBy("id")
                    .agg(*[F.bit_or(m).alias(m) for m in mcols])
                )
            row = (
                with_r_sum(state, k, bits)
                .agg(
                    F.sum("r_sum").cast("long").alias("rs"),
                    F.count(F.lit(1)).cast("long").alias("n"),
                )
                .first()
            )
            out.append((h, int(row.rs), int(row.n)))
        return out
    finally:
        edges.unpersist()


def nf_estimate(r_sum_total: int, n_vertices: int, k: int) -> float:
    """Mean-ball-size estimate from one sweep row: the per-vertex FM
    estimate 2^(r_sum/k)/0.77351 evaluated at the mean R (the ANF
    paper's 'individual estimates averaged in log space')."""
    return (2.0 ** (r_sum_total / (k * n_vertices))) / FM_MAGIC


def effective_diameter(nf: list[tuple[int, int, int]], k: int, q: float = 0.9) -> float:
    """Smallest h (linearly interpolated) where the mean ball reaches
    q× its value at the sweep's last radius — the standard
    'effective diameter' readout of the neighborhood function."""
    est = [nf_estimate(rs, n, k) for _, rs, n in nf]
    target = q * est[-1]
    for i, e in enumerate(est):
        if e >= target:
            if i == 0 or est[i] == est[i - 1]:
                return float(i)
            return (i - 1) + (target - est[i - 1]) / (est[i] - est[i - 1])
    return float(len(est) - 1)
