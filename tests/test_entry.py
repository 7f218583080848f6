"""Driver-contract harness: run every queries() entry and its DuckDB
oracle side-by-side, compare row count, column names, and values
(order-insensitive, NaN-tolerant, float-rounded) — a local replica of
the CORRECTNESS_r{N} gate."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# override to replicate the driver gate at its own scale:
#   SPARK_GRAFT_GATE_SF=/root/testdata/sf0.01 pytest tests/test_entry.py
SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", round(v, 6)))
            elif v is None:
                vals.append(("n",))
            else:
                vals.append(("v", str(v)))
        out.append(tuple(vals))
    out.sort()
    return out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("mode", ["stock", "tuned"])
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(request, ddb, name, mode):
    # "stock" replicates the driver's vanilla session (TIMESTAMP_NTZ
    # parquet reads); "tuned" is the engine's own build_session.
    spark = request.getfixturevalue("spark" if mode == "tuned" else "stock_spark")
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return

    res = ddb.execute(oracles[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (spark_cols, ddb_cols)
    assert len(spark_rows) == len(ddb_rows), (len(spark_rows), len(ddb_rows))
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_every_query_has_oracle_or_is_flagged():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("mode", ["stock", "tuned"])
def test_entry_smoke(request, mode):
    spark = request.getfixturevalue("spark" if mode == "tuned" else "stock_spark")
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"conv_id", "turn_idx", "ts", "text_reshaped", "session_id", "attr_value"} <= set(
        df.columns
    )
