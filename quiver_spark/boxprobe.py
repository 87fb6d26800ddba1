"""Pinned box-control probe for bench records (round-3 verdict item 2).

Round-3 lesson: the driver-recorded suite wall (194 s) read as a ~1.9×
regression that did not exist — the judge's quiet-box re-run measured
119 s, and byte-identical round-2 code measured 20-25% slower the same
day. Absolute walls on a shared box are meaningless without a
same-moment yardstick. This probe is that yardstick: a fixed-size
single-threaded numpy gather + ``minimum.reduceat`` kernel — the exact
inner loop the packed-CSR superstep tier spends its time in
(:mod:`quiver_spark.csr_blocks`) — whose work never changes across
rounds. Read every suite wall RELATIVE to ``box_control_sec``; a run
where both the suite and the control are ~1.5× slower is a busy box,
not a regression.

``min``-of-repeats is the estimator: for a fixed workload the minimum
is the least-contended observation (mean/median absorb scheduler noise
the probe exists to expose).
"""

from __future__ import annotations

import time

import numpy as np

# reference quiet-box value, recorded when the probe was introduced
# (round 4); NOTES/BENCH analysis divides by this to normalize walls
REFERENCE_SEC = 0.8

_N_E, _N_V = 20_000_000, 2_000_000


def box_control(repeats: int = 5) -> dict:
    """Time the pinned kernel; returns the JSON-able record bench.py
    embeds in its output line."""
    rng = np.random.default_rng(42)
    src_pos = rng.integers(0, _N_V, _N_E).astype(np.int32)
    starts = np.unique(rng.integers(0, _N_E, _N_V // 2).astype(np.int32))
    comp = rng.integers(0, 2**62, _N_V)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _r in range(4):
            gathered = comp[src_pos]
            np.minimum.reduceat(gathered, starts)
        best = min(best, time.perf_counter() - t0)
    return {
        "box_control_sec": round(best, 3),
        "box_control_ref_sec": REFERENCE_SEC,
        "box_control_ratio": round(best / REFERENCE_SEC, 3),
        "box_control_def": (
            "min-of-%d of 4x(int64 gather[20M] + minimum.reduceat[1M runs]), "
            "single-threaded numpy, seed 42" % repeats
        ),
    }


if __name__ == "__main__":
    import json

    print(json.dumps(box_control()))
