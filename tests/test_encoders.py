"""Leakage-safe feature encoders: hand-computed golden cases, tie/NULL
edges, and exact-vs-approx binning agreement."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from fluvio_jolt_spark.operators.encoders import (
    distinct_seen_count,
    feature_cross_hash,
    quantile_bin,
    target_encode_expanding,
)


def _events(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "a", "b"],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:01:00",
                        "2024-01-01 00:01:00",  # tie with previous row
                        "2024-01-01 00:02:00",
                        "2024-01-01 00:00:30",
                    ]
                ),
                "y": [10.0, 20.0, 30.0, 40.0, 5.0],
                "i": [0, 1, 2, 3, 4],
            }
        )
    )


def test_target_encode_expanding_strict_past(spark):
    """Each row's encoding uses strictly-earlier rows only: ties at the
    same timestamp see each other NOT; first row of a key gets the pure
    prior."""
    out = (
        target_encode_expanding(
            _events(spark), "k", "y", ts_col="ts", m=2.0, prior=100.0
        )
        .toPandas()
        .set_index("i")["target_enc"]
    )
    # row 0: no history -> (0 + 2*100) / (0 + 2) = 100
    assert out[0] == pytest.approx(100.0)
    # rows 1,2 (tied ts): only row 0 is strictly earlier for BOTH
    assert out[1] == pytest.approx((10.0 + 200.0) / 3.0)
    assert out[2] == pytest.approx((10.0 + 200.0) / 3.0)
    # row 3: rows 0,1,2 -> (60 + 200) / 5
    assert out[3] == pytest.approx(52.0)
    # key b: independent
    assert out[4] == pytest.approx(100.0)


def test_target_encode_default_prior_is_corpus_mean(spark):
    df = _events(spark)
    out = target_encode_expanding(df, "k", "y", ts_col="ts", m=1000.0)
    first = (
        out.filter(F.col("i") == 0).select("target_enc").first()["target_enc"]
    )
    # huge m -> encoding collapses to the prior = mean(y) = 21.0
    assert first == pytest.approx(21.0, rel=1e-6)


def test_feature_cross_hash_md5_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y", None], "b": ["1", None, "2"]})
    )
    got = (
        feature_cross_hash(df, ["a", "b"], n_buckets=64, hash_family="md5")
        .select("a", "b", "cross_bucket")
        .toPandas()
        .fillna("∅")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            """
        SELECT a, b,
          ('0x' || substr(md5(concat_ws('|',
             coalesce(a, chr(0)), coalesce(b, chr(0)))), 1, 15))::BIGINT
          % 64 AS cross_bucket
        FROM (VALUES ('x','1'), ('y',NULL), (NULL,'2')) t(a, b)
        """
        )
        .df()
        .fillna("∅")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert list(got["cross_bucket"]) == list(want["cross_bucket"])


def test_feature_cross_hash_null_folding_distinct(spark):
    """(NULL,'a') and ('a',NULL) must not collide by construction of the
    NULL sentinel; xxhash lane stays in [0, n)."""
    df = spark.createDataFrame(
        pd.DataFrame({"a": [None, "a"], "b": ["a", None], "i": [0, 1]})
    )
    got = (
        feature_cross_hash(df, ["a", "b"], n_buckets=1 << 30)
        .toPandas()
        .set_index("i")["cross_bucket"]
    )
    assert got[0] != got[1]
    small = feature_cross_hash(df, ["a", "b"], n_buckets=8).toPandas()
    assert small["cross_bucket"].between(0, 7).all()


def test_quantile_bin_exact_ntile_sizes(spark):
    """5 rows / 4 bins -> ANSI ntile sizes 2,1,1,1 in value order."""
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 5, "v": [5.0, 1.0, 3.0, 2.0, 4.0],
                      "id": [0, 1, 2, 3, 4]})
    )
    out = (
        quantile_bin(df, "v", ["g"], n_bins=4, tie_cols=["id"])
        .toPandas()
        .sort_values("v")
    )
    assert list(out["bin"]) == [1, 1, 2, 3, 4]


def test_quantile_bin_approx_agrees_off_boundary(spark):
    """Uniform 1..400: approx mode with tight rel_err matches exact
    everywhere except possibly rows within rel_err of a cut."""
    pdf = pd.DataFrame(
        {"g": ["x"] * 400, "v": [float(i) for i in range(1, 401)],
         "id": list(range(400))}
    )
    df = spark.createDataFrame(pdf)
    exact = (
        quantile_bin(df, "v", ["g"], n_bins=4, tie_cols=["id"])
        .toPandas().set_index("id")["bin"]
    )
    approx = (
        quantile_bin(df, "v", ["g"], n_bins=4, mode="approx", rel_err=0.001)
        .toPandas().set_index("id")["bin"]
    )
    disagree = (exact != approx).sum()
    assert disagree <= 4  # at most one row per cut boundary
    assert set(approx.unique()) == {1, 2, 3, 4}


def test_distinct_seen_count_strict_past(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "u": [1, 1, 1, 1, 1, 2],
                "t": ["a", "b", "b", "c", "a", "a"],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:01:00",
                        "2024-01-01 00:01:00",  # tie: b twice at same ts
                        "2024-01-01 00:02:00",
                        "2024-01-01 00:03:00",
                        "2024-01-01 00:00:10",
                    ]
                ),
                "i": [0, 1, 2, 3, 4, 5],
            }
        )
    )
    out = (
        distinct_seen_count(df, "u", "t", ts_col="ts", tie_cols=["i"])
        .toPandas()
        .set_index("i")["distinct_seen"]
    )
    assert out[0] == 0          # nothing before
    assert out[1] == 1          # saw {a}
    assert out[2] == 1          # tie row: same strict-past view
    assert out[3] == 2          # saw {a, b}
    assert out[4] == 3          # saw {a, b, c}; own repeat of a not counted
    assert out[5] == 0          # other user
