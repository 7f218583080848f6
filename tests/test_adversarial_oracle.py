"""Adversarial differential gate: window/temporal queries vs their
DuckDB oracles on generated events tables with NULL timestamps, heavy
timestamp ties, and null values — the inputs where engine default
orderings diverge (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST). The
oracle SQL pins NULLS FIRST explicitly; this gate proves the pins hold
on data the driver's generator never produces.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry_mod

# Frame-sensitive queries whose results shift under any ordering
# divergence. As-of queries are excluded: DuckDB's ASOF JOIN and the
# engine define their own (tested) semantics for NULL event times, and
# the comparison would measure DuckDB, not us.
QUERIES = [
    "lag_latency",
    "sessionize",
    "session_agg",
    "rolling_counts",
    "backfill_last_value",
    "backfill_backward",
    "lead_features",
    "median_by_type",
    "pivot_event_counts",
    "distinct_union",
]

BASE_US = 1_700_000_000_000_000


def _events_strategy():
    # timestamps from a tiny set of micros (forcing cross-row ties),
    # plus None; values double-or-null; types from the real domain
    ts_choices = st.one_of(
        st.none(),
        st.integers(min_value=0, max_value=5).map(lambda k: BASE_US + k * 60_000_000),
    )
    row = st.tuples(
        ts_choices,
        st.integers(min_value=1, max_value=3),  # user_id
        st.sampled_from(["click", "view", "purchase", "signup", "error"]),
        st.one_of(st.none(), st.floats(min_value=-10, max_value=10, allow_nan=False)),
    )
    return st.lists(row, min_size=1, max_size=40)


def _materialize(rows, tmpdir: str) -> str:
    ts, uid, etype, val = zip(*rows)
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [None if t is None else t for t in ts], pa.timestamp("us")
            ),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(['{"k":1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


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
                vals.append(("f", "nan" if math.isnan(v) else round(v, 6)))
            elif v is None:
                vals.append(("n",))
            else:
                vals.append(("v", str(v)))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", QUERIES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events_strategy())
def test_adversarial_events_match_oracle(spark, tmp_path_factory, name, rows):
    tmpdir = str(tmp_path_factory.mktemp("adv"))
    _materialize(rows, tmpdir)

    df = entry_mod.queries()[name](spark, tmpdir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmpdir}/events.parquet'")
    res = con.execute(entry_mod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(ddb_cols)
    assert len(spark_rows) == len(ddb_rows), (len(spark_rows), len(ddb_rows))
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {mismatches[:5]}\nrows={rows}"


# ---- adversarial documents: unicode, empties, repeats, single words ----

DOC_QUERIES = [
    "token_stats",
    "quality_score",
    "lang_id",
    "exact_dedup_docs",
    "simhash_docs",
    "simhash_near_dup",
    "minhash_lsh_docs",
    "lsh_jaccard_near_dup",
]

_WORD = st.one_of(
    st.sampled_from(["the", "a", "fox", "héllo", "Ω", "naïve", "x"]),
    st.text(
        alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs", "Cc")),
        min_size=1,
        max_size=6,
    ),
)

_DOC = st.one_of(
    st.lists(_WORD, min_size=1, max_size=12).map(" ".join),
    st.just("solo"),             # single word → the len<n shingle branch
    st.just("a a a a a"),        # heavy repeats → distinct-shingle dedup
)


def _materialize_docs(texts, tmpdir: str) -> None:
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(list(texts), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/documents.parquet")


@pytest.mark.parametrize("name", DOC_QUERIES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_DOC, min_size=2, max_size=15))
def test_adversarial_docs_match_oracle(spark, tmp_path_factory, name, texts):
    # duplicate one doc so dedup/near-dup paths always have a hit
    texts = list(texts) + [texts[0]]
    tmpdir = str(tmp_path_factory.mktemp("advdoc"))
    _materialize_docs(texts, tmpdir)

    df = entry_mod.queries()[name](spark, tmpdir)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmpdir}/documents.parquet'")
    res = con.execute(entry_mod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(ddb_cols)
    assert len(spark_rows) == len(ddb_rows), (len(spark_rows), len(ddb_rows))
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(ddb_rows, ddb_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {mismatches[:5]}\ntexts={texts}"
