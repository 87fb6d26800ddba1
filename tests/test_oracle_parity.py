"""DuckDB oracle parity at sf0.01 — mirrors the driver's correctness
gate (row count + schema + order-insensitive values) so breakage
surfaces in pytest before the driver sees it."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]

_ORACLED = sorted(set(entry_mod.oracle_sql()))
_ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        vals = []
        for c in sorted(d):
            v = d[c]
            if isinstance(v, float):
                v = round(v, 9)
            # repr keeps mixed None/str rows sortable (NULL edge labels
            # on path starts) — both sides normalize identically, and
            # it matches the driver's repr-based value hash
            vals.append((c, repr(v)))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = _norm(sdf.collect(), scols)

    cur = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = _norm(cur.fetchall(), dcols)

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    if srows != drows:
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert {"id", "repo", "path", "lang", "rank"} <= set(df.columns)
    # ranks are a valid probability fragment, sorted desc
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(0 < r < 1 for r in ranks)
    assert math.isfinite(sum(ranks))


def test_doc_token_counts_parity_on_empty_and_whitespace_text(spark, tmp_path):
    """The gate fixtures contain no empty/whitespace-only docs, but the
    library and the twin must agree on them: textops.tokens maps '' to
    [] (0 tokens) while DuckDB's regexp_split_to_array('') yields ['']
    (len 1) — the twin carries an explicit CASE for it. NULL stays NULL
    on both sides."""
    import pandas as pd

    rows = [(1, ""), (2, "   "), (3, None), (4, "two tokens")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sdf = entry_mod.queries()["doc_token_counts"](spark, str(tmp_path))
    srows = _norm(sdf.collect(), sdf.columns)

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    cur = con.execute(entry_mod.oracle_sql()["doc_token_counts"])
    drows = _norm(cur.fetchall(), [d[0] for d in cur.description])
    con.close()
    assert srows == drows
    n_by_id = {dict(t)["doc_id"]: dict(t)["n_tokens"] for t in srows}
    assert n_by_id == {"1": "0", "2": "0", "3": "None", "4": "2"}
