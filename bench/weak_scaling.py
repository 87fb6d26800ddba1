"""Data-scaling (weak-scaling) evidence: fixed core count, the graph
grows KxK (vertices and edges together, constant average degree), and
the question is whether per-edge superstep cost stays flat — i.e.
whether superstep work is linear in the data. The core-scaling rows
(bench/scaling.py) answer "more executors, same data"; this answers
"same executors, more data" — together they are the two axes of the
100 TB extrapolation.

    python bench/weak_scaling.py [--algo pagerank] [--strategy csr_packed]
        [--cores 8] [--vertices 500000] [--edges 40000000] [--factor 4]
        [--iters 8] [--pin]

Reuses bench/scaling.py's run_level child (fresh JVM per size, fixed
SCALING_BLOCKS layout, warmup supersteps discarded) and its per-level
box controls. Appends a row + raw log like the core-scaling harness.

Reading: per_edge_cost_ratio = (steady ns/edge at KxK) / (steady
ns/edge at 1x). 1.0 is perfectly linear; > 1 means superlinear cost
growth (a scale red flag); slightly < 1 is normal (fixed per-superstep
overheads amortize over more edges).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import run_level  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="pagerank")
    ap.add_argument("--strategy", default="csr_packed")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--vertices", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=40_000_000)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pin", action="store_true")
    args = ap.parse_args()

    from quiver_spark.boxprobe import box_control

    rows = []
    for k in (1, args.factor):
        ctl = box_control()
        t0 = time.monotonic()
        r = run_level(
            args.cores,
            args.vertices * k,
            args.edges * k,
            args.iters,
            strategy=args.strategy,
            algo=args.algo,
            pin=args.pin,
        )
        r["size_factor"] = k
        r["n_vertices"] = args.vertices * k
        r["n_edges"] = args.edges * k
        r["level_wall_sec"] = round(time.monotonic() - t0, 1)
        r["pre_box_control"] = ctl
        r["ns_per_edge_steady"] = round(1e9 / r["edges_per_sec"], 3)
        # min-of-post-warmup-steps estimator (same rationale as
        # SCALING_ONESHOT_RUNS): algorithms whose per-round work is
        # data-dependent (lp's vote width shrinks as labels settle)
        # never plateau inside a fixed window — the cheapest observed
        # step is the least-transient, least-contended sample of the
        # true per-round cost at that size
        steps = r.get("wall_per_superstep_ms", [])[r.get("warmup_supersteps", 0):]
        # one-shot algos (triangles/ingest/neardup) report no per-step
        # walls; fall back to the windowed mean so the row still lands
        r["min_step_ns_per_edge"] = (
            round(min(steps) * 1e6 / r["n_edges"], 3) if steps else r["ns_per_edge_steady"]
        )
        rows.append(r)
        print(json.dumps(r))

    ratio = rows[1]["ns_per_edge_steady"] / rows[0]["ns_per_edge_steady"]
    min_ratio = rows[1]["min_step_ns_per_edge"] / rows[0]["min_step_ns_per_edge"]
    summary = {
        "metric": "weak_scaling_per_edge_cost_ratio",
        "algo": args.algo,
        "strategy": args.strategy,
        "cores": args.cores,
        "sizes": [f"{r['n_edges']:,} e / {r['n_vertices']:,} v" for r in rows],
        "ns_per_edge": [r["ns_per_edge_steady"] for r in rows],
        "per_edge_cost_ratio": round(ratio, 3),
        "min_step_ns_per_edge": [r["min_step_ns_per_edge"] for r in rows],
        "min_step_cost_ratio": round(min_ratio, 3),
        # per-estimator verdicts: the two disagree exactly when per-round
        # work is data-dependent (lp's settling phase — see BENCH/BASELINE.md
        # weak-scaling analysis), so a single flag would hide which
        # estimator carried the PASS. linear_best_estimator keeps the old
        # "either estimator within 1.15" reading under an honest name.
        "linear_windowed": ratio <= 1.15,
        "linear_min_step": min_ratio <= 1.15,
        "linear_best_estimator": min(ratio, min_ratio) <= 1.15,
    }
    print(json.dumps(summary))

    log = os.path.join(ROOT, "bench", f"weak_{args.algo}_{args.strategy}_{args.cores}c.log")
    with open(log, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")

    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## weak-scaling row ({args.algo} {args.strategy}, local[{args.cores}]"
            f"{', pinned' if args.pin else ''}): {args.edges:,}→{args.edges * args.factor:,} edges\n\n"
            "| size | steady e/s | ns/edge (window mean) | ns/edge (min step) |"
            " pre-level box control |\n|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['n_edges']:,} e / {r['n_vertices']:,} v | {r['edges_per_sec']:,} |"
                f" {r['ns_per_edge_steady']} | {r['min_step_ns_per_edge']} |"
                f" {r['pre_box_control']['box_control_ratio']} |\n"
            )
        f.write(
            f"\nper-edge steady cost ratio at {args.factor}x data = **{ratio:.3f}**"
            f" windowed-mean / **{min_ratio:.3f}** min-step"
            " (1.0 = perfectly linear; ≤ 1.15 read as linear-in-edges)\n"
        )


if __name__ == "__main__":
    main()
