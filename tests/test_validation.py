"""Temporal CV folds (purged) and PSI drift — hand-computed goldens,
boundary exactness, and drift direction."""

from __future__ import annotations

import pandas as pd
import pytest

from fluvio_jolt_spark.operators.validation import psi_drift, time_series_folds


def test_time_series_folds_boundaries_and_purge(spark):
    """10-second range, 5 folds of exactly 2s: fold boundaries land on
    even seconds; a row within the 1s embargo of the next boundary is
    purged; the corpus tail (last fold) never purges."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    secs = [0.0, 1.5, 2.0, 3.9, 4.0, 9.99]
    df = spark.createDataFrame(
        pd.DataFrame({
            "ts": [base + pd.Timedelta(seconds=s) for s in secs],
            "i": list(range(len(secs))),
        })
    )
    mn = int(base.timestamp() * 1_000_000)
    out = (
        time_series_folds(
            df, n_folds=5, embargo_s=1.0,
            ts_min_us=mn, ts_max_us=mn + 10_000_000 - 1,
        )
        .toPandas().set_index("i")
    )
    assert list(out["fold_id"]) == [0, 0, 1, 1, 2, 4]
    # 1.5s: embargo reaches 2.5s -> next fold; 3.9 reaches 4.9 -> next;
    # 0.0 reaches 1.0 (same fold); 2.0 reaches 3.0 (same); 4.0 -> 5.0
    # is EXACTLY the boundary of fold 2 (5.0*5//10 = 2): not purged;
    # 9.99 is in the last fold: clamp keeps it unpurged.
    assert list(out["purged"]) == [False, True, False, True, False, False]


def test_time_series_folds_default_bounds(spark):
    """Bounds default to the frame's own min/max: first row fold 0,
    last row fold n-1."""
    df = spark.createDataFrame(
        pd.DataFrame({
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-03-01", "2024-06-01"]
            ),
            "i": [0, 1, 2],
        })
    )
    out = time_series_folds(df, n_folds=3).toPandas().set_index("i")
    assert out.loc[0, "fold_id"] == 0
    assert out.loc[2, "fold_id"] == 2


def _psi_frame(spark, cur_shift: float):
    base = pd.Timestamp("2024-01-01")
    rows = []
    # reference half: values 1.00..50.00; current half: shifted
    for i in range(50):
        rows.append(("a", base + pd.Timedelta(minutes=i), 1.0 + i))
    for i in range(50):
        rows.append(
            ("a", base + pd.Timedelta(days=1, minutes=i), 1.0 + i + cur_shift)
        )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    )


def test_psi_drift_zero_when_identical(spark):
    out = psi_drift(
        _psi_frame(spark, 0.0), "value", "ts", ["event_type"], n_bins=10
    ).collect()
    assert len(out) == 1
    assert abs(out[0]["psi"]) < 1e-3
    assert out[0]["n_ref"] == out[0]["n_cur"] == 50


def test_psi_drift_flags_shift(spark):
    """Current half shifted by half the range: PSI far above the 0.25
    re-fit threshold, and bigger shift -> bigger PSI."""
    small = psi_drift(
        _psi_frame(spark, 10.0), "value", "ts", ["event_type"], n_bins=10
    ).collect()[0]["psi"]
    big = psi_drift(
        _psi_frame(spark, 25.0), "value", "ts", ["event_type"], n_bins=10
    ).collect()[0]["psi"]
    assert small > 0.25
    assert big > small


def test_psi_drift_empty_bin_finite(spark):
    """A bin populated on one side only stays finite via eps smoothing."""
    base = pd.Timestamp("2024-01-01")
    rows = [("a", base, 1.0), ("a", base + pd.Timedelta(minutes=1), 1.0),
            ("a", base + pd.Timedelta(days=1), 100.0),
            ("a", base + pd.Timedelta(days=1, minutes=1), 100.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    )
    out = psi_drift(df, "value", "ts", ["event_type"], n_bins=4).collect()[0]
    assert out["psi"] == pytest.approx(out["psi"])  # not NaN
    assert out["psi"] > 1.0  # complete separation = extreme drift


def _vals_df(spark, vals, types=None):
    n = len(vals)
    pdf = pd.DataFrame({
        "event_id": list(range(n)),
        "event_type": types or ["t"] * n,
        "value": pd.Series(vals, dtype=object),
    })
    return spark.createDataFrame(pdf)


def test_winsorize_clips_to_exact_percentiles(spark):
    from fluvio_jolt_spark.operators.validation import winsorize

    # 0..100: p05 = 5.0, p95 = 95.0 exactly (101 points, integer ranks)
    df = _vals_df(spark, [float(i) for i in range(101)])
    out = winsorize(df, "value", ["event_type"], 0.05, 0.95).toPandas()
    out = out.set_index("event_id").sort_index()
    assert out["value_w"].min() == 5.0 and out["value_w"].max() == 95.0
    assert out["clipped_low"].sum() == 5 and out["clipped_high"].sum() == 5
    # interior values untouched
    assert out.loc[50, "value_w"] == 50.0


def test_winsorize_null_values_stay_null(spark):
    from fluvio_jolt_spark.operators.validation import winsorize

    df = _vals_df(spark, [1.0, None, 3.0, 100.0])
    out = winsorize(df, "value", ["event_type"], 0.25, 0.75).toPandas()
    row = out.set_index("event_id").loc[1]
    assert pd.isna(row["value_w"]) and pd.isna(row["clipped_low"])


def test_winsorize_null_group_key_kept(spark):
    from fluvio_jolt_spark.operators.validation import winsorize

    df = _vals_df(spark, [1.0, 2.0, 3.0, 9.0], types=[None, None, None, "t"])
    out = winsorize(df, "value", ["event_type"], 0.0, 1.0).toPandas()
    # null-safe join: NULL-type rows keep their own group's bounds
    assert len(out) == 4
    assert out.set_index("event_id").loc[0, "value_w"] == 1.0


def test_mad_zscore_golden_and_robustness(spark):
    from fluvio_jolt_spark.operators.validation import mad_zscore

    # 1..9 plus one wild outlier: med = 5.5, MAD unaffected by the spike
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    df = _vals_df(spark, vals)
    out = mad_zscore(df, "value", ["event_type"]).toPandas()
    out = out.set_index("event_id")
    assert out["_med"].iloc[0] == 5.5  # median of sorted 1..9,1000 = (5+6)/2
    assert out.loc[9, "is_outlier"] == 1
    assert out.loc[4, "is_outlier"] == 0


def test_mad_zscore_zero_mad_yields_null(spark):
    from fluvio_jolt_spark.operators.validation import mad_zscore

    df = _vals_df(spark, [2.0, 2.0, 2.0, 2.0, 7.0])
    out = mad_zscore(df, "value", ["event_type"]).toPandas()
    assert pd.isna(out["robust_z"]).all()


def test_referential_audit_planted_pathologies(spark):
    from fluvio_jolt_spark.operators.validation import referential_audit

    child = spark.createDataFrame(
        pd.DataFrame({"fk": pd.Series([1, 1, 2, 99, None], dtype=object)})
    )
    # parent key 1 duplicated: must NOT fan n_child out
    parent = spark.createDataFrame(
        pd.DataFrame({"pk": [1, 1, 2, 3]})
    )
    out = referential_audit(child, parent, "fk", "pk").toPandas().iloc[0]
    assert out["relation"] == "fk->pk"
    assert out["n_child"] == 5
    assert out["n_fk_null"] == 1
    assert out["n_orphans"] == 1       # fk=99
    assert out["n_parent"] == 4
    assert out["n_pk_dup_rows"] == 1   # one extra row for pk=1


def test_referential_audit_clean_relation(spark):
    from fluvio_jolt_spark.operators.validation import referential_audit

    child = spark.createDataFrame(pd.DataFrame({"fk": [1, 2, 3]}))
    parent = spark.createDataFrame(pd.DataFrame({"pk": [1, 2, 3, 4]}))
    out = referential_audit(child, parent, "fk", "pk").toPandas().iloc[0]
    assert out["n_orphans"] == 0 and out["n_fk_null"] == 0
    assert out["n_pk_dup_rows"] == 0


def test_ts_disorder_counts_backsteps(spark):
    from fluvio_jolt_spark.operators.validation import ts_disorder

    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: arrival order 0,1,2,3 with ts 0s, 10s, 4s (6s backstep),
    # 20s -> one backward step; user 2: monotone
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "event_id": [0, 1, 2, 3, 10, 11],
        "ts": [base + pd.Timedelta(seconds=s) for s in [0, 10, 4, 20, 0, 5]],
    })
    out = (
        ts_disorder(spark.createDataFrame(pdf), "user_id", "ts", "event_id")
        .toPandas().set_index("user_id")
    )
    assert out.loc[1, "n_backward"] == 1
    assert out.loc[1, "max_backstep_s"] == 6.0
    assert out.loc[1, "disorder_ratio"] == 0.25
    assert out.loc[2, "n_backward"] == 0
    assert pd.isna(out.loc[2, "max_backstep_s"])


def test_split_leakage_planted_and_clean(spark):
    """Identical content under different ids draws different splits and
    is flagged; unique content and same-split duplicate groups are not."""
    from fluvio_jolt_spark.operators.validation import split_leakage

    rows = [
        (1, "shared content alpha", "train"),
        (2, "shared content alpha", "val"),      # leaks train->val
        (3, "shared content beta", "train"),
        (4, "shared content beta", "train"),     # dup but same split: clean
        (5, "unique content gamma", "test"),
        (6, "shared content alpha", "test"),     # third split, same group
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "split"])
    out = split_leakage(df).toPandas()
    assert len(out) == 1
    g = out.iloc[0]
    assert g["n_copies"] == 3 and g["n_splits"] == 3
    assert list(g["splits"]) == ["test", "train", "val"]


def test_corpus_diff_all_statuses(spark):
    """Added/removed/changed/unchanged all classified; hashes NULL on
    the absent side only."""
    from fluvio_jolt_spark.operators.validation import corpus_diff

    v1 = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        ["doc_id", "text"],
    )
    v2 = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["doc_id", "text"],
    )
    out = corpus_diff(v1, v2).orderBy("doc_id").toPandas()
    assert dict(zip(out["doc_id"], out["status"])) == {
        1: "unchanged", 2: "changed", 3: "removed", 4: "added"
    }
    assert out[out["doc_id"] == 3]["new_hash"].isna().all()
    assert out[out["doc_id"] == 4]["old_hash"].isna().all()
    both = out[out["doc_id"].isin([1, 2])]
    assert both["old_hash"].notna().all() and both["new_hash"].notna().all()
