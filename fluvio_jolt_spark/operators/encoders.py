"""Leakage-safe feature encoders — pure Catalyst expressions.

The classic ML feature-engineering encoders, each in its point-in-time
form so a feature row computed at time *t* uses only events strictly
before *t* (same zero-temporal-leakage rule as ``window_features.py``;
the reference's transform stage is stateless per record —
`fluvio-jolt/src/lib.rs:78-88` — so these extend the engine beyond the
reference into what a training pipeline needs on top of it):

- ``target_encode_expanding``: smoothed expanding-mean target encoding.
- ``feature_cross_hash``: the hashing trick over categorical crosses.
- ``quantile_bin``: per-group quantile binning (exact + approx modes).
- ``distinct_seen_count``: cumulative distinct-items-seen-so-far.

100-TB shapes are documented per function; none uses a global window,
a cartesian join, or per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.epoch import ensure_ltz


def target_encode_expanding(
    df: DataFrame,
    key_col: str,
    target_col: str,
    ts_col: str = "ts",
    m: float = 20.0,
    prior: float | None = None,
    out_col: str = "target_enc",
) -> DataFrame:
    """Smoothed expanding-mean target encoding of ``key_col``:

        te(row) = (sum_past + m * prior) / (cnt_past + m)

    where sum/cnt aggregate ``target_col`` over rows of the same key
    with timestamp STRICTLY before the row's own — a RANGE frame ending
    1 microsecond back, so same-timestamp rows never see each other and
    the encoding is leakage-free by construction (the standard failure
    mode of naive target encoding is exactly this: encoding a row with
    statistics that include its own or same-instant labels).

    ``prior`` is the corpus-level target mean used for smoothing; when
    None it is computed here with one bounded driver-side aggregate (a
    catalog statistic, the same pattern as TF-IDF's N — never a
    lit-keyed join, which would constant-fold into a nested-loop join).
    In a train/serve split the caller passes the training prior.

    100-TB shape: one shuffle on ``key_col``, then a single sort+window
    stage computing both running aggregates; only (key, ts, target)
    ride the shuffle if the caller pre-projects. Heavily skewed keys
    (one category = half the corpus) bound per-task size the same way
    ``skew.py`` salts conversation windows: cumulative sums compose
    across salt chunks by adding the previous chunks' totals.
    """
    df = ensure_ltz(df, ts_col)
    if prior is None:
        row = df.select(F.avg(target_col).alias("p")).first()
        prior = float(row["p"]) if row["p"] is not None else 0.0
    e = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(e)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sum_past = F.coalesce(F.sum(target_col).over(w), F.lit(0.0))
    cnt_past = F.count(target_col).over(w)
    return df.withColumn(
        out_col,
        (sum_past + F.lit(float(m)) * F.lit(prior))
        / (cnt_past + F.lit(float(m))),
    )


def feature_cross_hash(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 64,
    out_col: str = "cross_bucket",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The hashing trick over a categorical cross: bucket =
    hash(col1 | col2 | ...) % n_buckets, collisions accepted by design
    (vocabulary-free, so no dictionary to build, broadcast, or go stale
    — the property that matters at 100 TB where the cross vocabulary is
    unbounded).

    ``hash_family='xxhash64'`` is the production lane (JVM xxhash64,
    no digest string materialized). ``'md5'`` derives the bucket from
    the top 60 bits of md5 so a SQL oracle can reproduce it exactly
    (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT) — same plan shape,
    one portable digest per row.

    NULL cross components fold to the literal '\\x00' so (NULL, 'a')
    and ('a', NULL) land in distinct, stable buckets.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    joined = F.concat_ws("|", *parts)
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")
    elif hash_family == "xxhash64":
        h = F.xxhash64(joined)
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    return df.withColumn(out_col, F.pmod(h, F.lit(int(n_buckets))))


def quantile_bin(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str] | None = None,
    n_bins: int = 4,
    tie_cols: list[str] | None = None,
    mode: str = "exact",
    out_col: str = "bin",
    rel_err: float = 0.001,
) -> DataFrame:
    """Assign each row a quantile bin of ``value_col`` within its
    ``partition_cols`` group (1..n_bins).

    mode='exact': ntile over (value, *tie_cols) — a full sort per group,
    engine-reproducible (ANSI ntile: ceil-sized buckets first), the
    oracle-checkable path. Requires ``tie_cols`` to make the total
    order deterministic when values repeat.

    mode='approx': two-pass scale path for 100 TB, where one group may
    hold 10^10 rows and a per-group total sort is the wrong plan:
    pass 1 computes per-group approx_percentile cut points (rel_err
    error, one partial-aggregate shuffle of (group, value) only);
    pass 2 broadcast-joins the tiny cut-point table back and bins each
    row with a constant-time array scan — no sort of the data at all.
    Bins differ from exact only for rows within rel_err of a cut.
    """
    pk = list(partition_cols or [])
    if mode == "exact":
        order = [F.asc_nulls_first(value_col)] + [
            F.asc_nulls_first(c) for c in (tie_cols or [])
        ]
        w = Window.partitionBy(*pk).orderBy(*order)
        return df.withColumn(out_col, F.ntile(int(n_bins)).over(w))
    if mode != "approx":
        raise ValueError(f"unknown mode: {mode}")
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.groupBy(*pk).agg(
        F.percentile_approx(
            value_col, F.lit(probs), F.lit(int(1.0 / rel_err))
        ).alias("_cuts")
    )
    joined = (
        df.join(F.broadcast(cuts), on=pk, how="left")
        if pk
        else df.crossJoin(F.broadcast(cuts))
    )
    # bin = 1 + number of cut points strictly below value
    return joined.withColumn(
        out_col,
        F.lit(1) + F.size(F.filter("_cuts", lambda c: c < F.col(value_col))),
    ).drop("_cuts")


def distinct_seen_count(
    df: DataFrame,
    partition_col: str,
    item_col: str,
    ts_col: str = "ts",
    tie_cols: list[str] | None = None,
    out_col: str = "distinct_seen",
) -> DataFrame:
    """Per partition (e.g. user), how many DISTINCT ``item_col`` values
    appeared strictly before this row's timestamp — e.g. "how many
    different event types has this user produced so far", a standard
    breadth-of-activity feature.

    Exact and O(n): a row is flagged 1 iff it is the first occurrence
    of its (partition, item) pair (row_number over a deterministic
    (ts, *tie_cols) order), then the flags are summed over a RANGE
    frame ending 1 microsecond back — so same-timestamp rows never
    count each other and the feature is leakage-free. Never a
    collect_set-over-window (which materializes O(n) state per row).

    100-TB shape: two narrow shuffles — (partition, item) for the
    first-occurrence flag, then (partition) for the running sum; only
    (partition, item, ts, flag) ride them. The second reuses the sort
    within each partition.
    """
    df = ensure_ltz(df, ts_col)
    e = F.unix_micros(F.col(ts_col))
    order = [e] + [F.col(c) for c in (tie_cols or [])]
    w_first = Window.partitionBy(partition_col, item_col).orderBy(*order)
    w_cum = (
        Window.partitionBy(partition_col)
        .orderBy(e)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flag = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return df.withColumn("_first_seen", flag).withColumn(
        out_col, F.coalesce(F.sum("_first_seen").over(w_cum), F.lit(0))
    ).drop("_first_seen")
