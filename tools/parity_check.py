"""Driver-style DuckDB parity check (developer tool, mirrors the
driver's CORRECTNESS gate): run every ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB at sf0.01, compare row count,
sorted-column schema, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as mod
    from quiver_spark.session import get_spark

    spark = get_spark("parity", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries, oracles = mod.queries(), mod.oracle_sql()
    only = sys.argv[1:]
    below_fold_only = "--ci" in only
    if below_fold_only:
        # --ci: verify exactly the entries the driver's 50-slot gate
        # does NOT record (below-fold registry rot protection, round-5
        # verdict item 8). tests/test_oracle_parity.py runs ALL oracled
        # entries per pytest run; this mode is the cheap standalone
        # check when a full suite run is too slow.
        from quiver_spark.queries import GATED

        only = [n for n in queries if n not in GATED]
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"{name:30s} rows-only: {len(srows)} rows  {'OK' if len(srows) >= 0 else '??'}")
            continue
        try:
            res = con.execute(oracles[name])
            orows = [tuple(r) for r in res.fetchall()]
            ocols = [d[0] for d in res.description]
        except Exception as exc:  # noqa: BLE001
            print(f"{name:30s} ORACLE SQL ERROR: {exc}")
            failures += 1
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK" if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:30s} {status}  rows {len(srows)}/{len(orows)}"
            f"  cols={'=' if ok_c else f'{sorted(scols)} vs {sorted(ocols)}'}  hash={'=' if ok_h else '!='}"
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
