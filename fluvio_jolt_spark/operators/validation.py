"""Dataset-validation operators for feature pipelines — temporal CV
fold assignment and distribution-drift monitoring, both in exact
integer arithmetic so results are bit-reproducible across engines.

These extend the engine past the reference's per-record transforms
(`fluvio-jolt/src/lib.rs:78-88`) into what a training pipeline wraps
around them: leakage-safe evaluation splits and the drift checks that
decide when features need re-fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.epoch import ensure_ltz


def _floordiv(a, b):
    """Exact integer floor-division for non-negative long columns.

    ``a / b`` on longs is double division in both Spark and ANSI SQL,
    and a true quotient sitting 1/b below an integer can round UP and
    flip a boundary row between engines. ``(a - a % b) / b`` divides
    exactly (the numerator is an exact multiple of b), so the double
    result is the true floor — valid while the numerator stays under
    2^53 (epoch-µs spans × small fold/bin counts: decades of
    microseconds × 1000 still fit)."""
    return ((a - a % b) / b).cast("long")


def time_series_folds(
    df: DataFrame,
    ts_col: str = "ts",
    n_folds: int = 5,
    embargo_s: float = 0.0,
    ts_min_us: int | None = None,
    ts_max_us: int | None = None,
) -> DataFrame:
    """Temporal K-fold assignment with a purge embargo (the de Prado
    purged-CV scheme): the time range splits into ``n_folds`` equal
    slices, and a row is flagged ``purged`` when its embargo window
    crosses the next fold boundary — training on fold k+1 must drop
    the tail of fold k whose look-ahead features could straddle the
    split, or the evaluation leaks.

    All arithmetic is int64 on epoch microseconds —
    ``fold = (ep - mn) * n // (mx - mn + 1)`` — so fold boundaries are
    exact and engine-reproducible (a float ``floor((ep-mn)/width)``
    flips rows at boundaries on 1-ulp division differences). The purge
    test is the same function shifted: ``purged = fold(ep + embargo)
    > fold(ep)`` (clamped to the last fold, so the corpus tail is
    never purged).

    Range bounds default to one bounded driver-side min/max aggregate
    (parquet footer statistics at scan level — catalog stats, the same
    pattern as TF-IDF's N); callers with a fixed study window pass
    them explicitly. Map-only: zero shuffle, composes with any
    downstream filter.
    """
    df = ensure_ltz(df, ts_col)
    ep = F.unix_micros(F.col(ts_col))
    if ts_min_us is None or ts_max_us is None:
        row = df.select(
            F.min(ep).alias("mn"), F.max(ep).alias("mx")
        ).first()
        ts_min_us = int(row["mn"]) if ts_min_us is None else ts_min_us
        ts_max_us = int(row["mx"]) if ts_max_us is None else ts_max_us
    mn = F.lit(int(ts_min_us))
    span = F.lit(int(ts_max_us) - int(ts_min_us) + 1)
    n = F.lit(int(n_folds))
    last = F.lit(int(n_folds) - 1)

    def fold_of(e):
        return F.least(_floordiv((e - mn) * n, span), last.cast("long"))

    emb = F.lit(int(round(embargo_s * 1_000_000)))
    return df.withColumn("fold_id", fold_of(ep)).withColumn(
        "purged", fold_of(ep + emb) > fold_of(ep)
    )


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    n_bins: int = 10,
    decimals: int = 2,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``value_col`` between the first
    and second half of the time range, per group — the standard
    drift monitor for deployed feature pipelines:

        PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref)

    (rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 re-fit).

    Bin assignment is exact integer arithmetic: values are scaled to
    integers at ``decimals`` precision (pass the column's actual
    precision; lossy for wider values, in which case pre-round) and
    cut into ``n_bins`` equal-width integer bins over the GLOBAL
    min/max — fixed-width rather than reference-quantile bins, so the
    cuts are engine-exact and need no per-group quantile state. ``eps``
    smooths empty bins (PSI is infinite on a bin one side never
    populates — the standard additive guard).

    Shape: one map-side pass computes (group, bin, half) counts via
    partial aggregation; per-group totals and the PSI fold are a
    second tiny aggregate over at most ``2 * n_bins`` rows per group.
    Bounds come from one driver-side min/max (catalog stats).
    """
    df = ensure_ltz(df, ts_col)
    gk = list(group_cols or [])
    scale = 10 ** int(decimals)
    iv = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    ep = F.unix_micros(F.col(ts_col))
    row = df.select(
        F.min(iv).alias("vmn"), F.max(iv).alias("vmx"),
        F.min(ep).alias("tmn"), F.max(ep).alias("tmx"),
    ).first()
    vmn, vspan = int(row["vmn"]), int(row["vmx"]) - int(row["vmn"]) + 1
    tmid = int(row["tmn"]) + (int(row["tmx"]) - int(row["tmn"])) // 2
    b = _floordiv((iv - F.lit(vmn)) * F.lit(int(n_bins)), F.lit(vspan))
    half = F.when(ep <= F.lit(tmid), F.lit(0)).otherwise(F.lit(1))

    counts = (
        df.select(*gk, b.alias("bin"), half.alias("half"))
        .groupBy(*gk, "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c_cur"),
        )
    )
    tot = counts.groupBy(*gk).agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    joined = counts.join(tot, gk) if gk else counts.crossJoin(F.broadcast(tot))
    p_ref = F.col("c_ref") / F.col("n_ref") + F.lit(float(eps))
    p_cur = F.col("c_cur") / F.col("n_cur") + F.lit(float(eps))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    out = joined.groupBy(*gk).agg(
        F.round(F.sum(term), 4).alias("psi"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
    return out


def _join_back(df: DataFrame, stats: DataFrame, group_cols: "list[str]"):
    """Broadcast the per-group stats frame back onto the rows with
    null-safe key equality (groupBy keeps a NULL group; a plain join
    would silently drop those rows — the zscore_by_type lesson)."""
    if not group_cols:
        return df.crossJoin(F.broadcast(stats))
    # rename the stats-side keys so the (self-derived) join condition is
    # unambiguous — stats descends from df, and same-name attributes
    # would otherwise lean on dataset-id disambiguation
    ren = {g: f"__stat_{g}" for g in group_cols}
    for g, r in ren.items():
        stats = stats.withColumnRenamed(g, r)
    b = F.broadcast(stats)
    cond = None
    for g, r in ren.items():
        c = df[g].eqNullSafe(F.col(r))
        cond = c if cond is None else cond & c
    return df.join(b, cond, "left").drop(*ren.values())


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_cols: "list[str] | None" = None,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` into its group's
    [lower, upper] exact-percentile envelope — the standard outlier cap
    before scaling/encoding numeric features (a single fat-finger value
    otherwise owns the feature's z-scale).  Adds ``<value>_w`` (the
    clipped value), ``clipped_low`` and ``clipped_high`` flags.

    Shape: one partial-agg'd groupBy computes the two percentiles per
    group (group count is small — broadcast back), then the clip is a
    map-side least/greatest.  Exact percentile is the oracle-checkable
    lane; at 100 TB swap in percentile_approx (t-digest — mergeable,
    one pass, no per-group sort) with the same query shape.  NULL
    values stay NULL and never clip; an all-NULL group yields NULL
    bounds and NULL output (guarded CASE — Spark's greatest() SKIPS
    nulls while ANSI engines propagate them, so the guard keeps both
    engines on the defined path)."""
    gk = list(group_cols or [])
    lim = df.groupBy(*gk).agg(
        F.percentile(value_col, F.lit(float(lower))).alias("_lo"),
        F.percentile(value_col, F.lit(float(upper))).alias("_hi"),
    )
    j = _join_back(df, lim, gk)
    v = F.col(value_col)
    clipped = F.when(
        v.isNull() | F.col("_lo").isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    return (
        j.withColumn(f"{value_col}_w", clipped)
        .withColumn("clipped_low", (v < F.col("_lo")).cast("int"))
        .withColumn("clipped_high", (v > F.col("_hi")).cast("int"))
        .drop("_lo", "_hi")
    )


def mad_zscore(
    df: DataFrame,
    value_col: str = "value",
    group_cols: "list[str] | None" = None,
    c: float = 0.6745,
    flag_at: float = 3.5,
) -> DataFrame:
    """Robust per-group z-score via median / MAD (the Iglewicz–Hoaglin
    modified z-score M = c·(x − med) / MAD, outlier at |M| > 3.5) —
    unlike mean/std, a breakdown point of 50%, so the score of normal
    rows is unaffected by the very outliers being hunted.

    Two exact-percentile aggregates (median, then median of absolute
    deviations — the second genuinely depends on the first, so two
    passes is the true data dependency, not a missed fusion), each
    broadcast back onto the rows; the score itself is map-side
    arithmetic.  A zero-MAD group (>50% of rows at one value) yields
    NULL scores rather than ±inf.  Adds ``_med``/``_mad`` (group
    stats), ``robust_z`` and ``is_outlier``."""
    gk = list(group_cols or [])
    med = df.groupBy(*gk).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    j = _join_back(df, med, gk).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = j.groupBy(*gk).agg(
        F.percentile("_absdev", F.lit(0.5)).alias("_mad")
    )
    j2 = _join_back(j, mad, gk)
    rz = (
        F.lit(float(c))
        * (F.col(value_col) - F.col("_med"))
        / F.when(F.col("_mad") == 0, F.lit(None).cast("double")).otherwise(
            F.col("_mad")
        )
    )
    return (
        j2.withColumn("robust_z", rz)
        .withColumn(
            "is_outlier", (F.abs(F.col("robust_z")) > F.lit(float(flag_at))).cast("int")
        )
        .drop("_absdev")
    )


def referential_audit(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    relation: "str | None" = None,
) -> DataFrame:
    """Referential-integrity audit of one FK→PK relation — the ingest
    gate a 100 TB pipeline runs before trusting a join: orphan child
    rows (FK present but unmatched) silently vanish from inner joins,
    NULL FKs vanish from every join, and duplicated PKs fan joins out.

    Shape: the orphan count is a LEFT join + flag aggregate (NOT a
    count of an anti-join — this keeps null-FK and orphan tallies in
    ONE pass over the child); parent-side stats are a second tiny
    aggregate; the two 1-row frames merge through a union + groupBy
    (a lit-keyed 1-row join would constant-fold into a nested-loop
    join).  Exact count_distinct on the PK is the oracle-checkable
    lane; at scale swap approx_count_distinct, same shape.

    Returns one row: (relation, n_child, n_fk_null, n_orphans,
    n_parent, n_pk_dup_rows)."""
    rel = relation or f"{fk}->{pk}"
    # distinct PKs before the orphan probe: a duplicated parent key must
    # not fan the child out (n_child stays the true child row count)
    hit = (
        parent.select(F.col(pk).alias("__pk"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    j = child.select(F.col(fk).alias("__fk")).join(
        hit, F.col("__fk") == F.col("__pk"), "left"
    )
    child_side = j.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0)).alias("n_fk_null"),
        F.sum(
            F.when(F.col("__fk").isNotNull() & F.col("__hit").isNull(), 1)
            .otherwise(0)
        ).alias("n_orphans"),
    ).select(
        F.lit(rel).alias("relation"),
        "n_child", "n_fk_null", "n_orphans",
        F.lit(None).cast("long").alias("n_parent"),
        F.lit(None).cast("long").alias("n_pk_dup_rows"),
    )
    parent_side = parent.agg(
        F.count(F.lit(1)).alias("n_parent"),
        F.count_distinct(F.col(pk)).alias("n_pk"),
    ).select(
        F.lit(rel).alias("relation"),
        F.lit(None).cast("long").alias("n_child"),
        F.lit(None).cast("long").alias("n_fk_null"),
        F.lit(None).cast("long").alias("n_orphans"),
        "n_parent",
        (F.col("n_parent") - F.col("n_pk")).alias("n_pk_dup_rows"),
    )
    return (
        child_side.unionByName(parent_side)
        .groupBy("relation")
        .agg(
            F.max("n_child").alias("n_child"),
            F.max("n_fk_null").alias("n_fk_null"),
            F.max("n_orphans").alias("n_orphans"),
            F.max("n_parent").alias("n_parent"),
            F.max("n_pk_dup_rows").alias("n_pk_dup_rows"),
        )
    )


def ts_disorder(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Timestamp-disorder audit per entity: how often does event time
    run BACKWARD along the arrival sequence (``seq_col``), and by how
    much — the number that decides a streaming job's watermark delay
    and whether a batch pipeline needs a re-sort before windowing
    (sessionize / as-of assume per-entity time order; silent disorder
    turns into silent feature corruption).

    One lag window over the (entity, seq) order — shares the shape
    (and at scale, the shuffle) of the lag/lead feature pass.  Returns
    per entity: (entity, n_events, n_backward, max_backstep_s,
    disorder_ratio)."""
    df = ensure_ltz(df, ts_col)
    w = Window.partitionBy(entity_col).orderBy(
        F.col(seq_col).asc_nulls_first()
    )
    ep = F.unix_micros(F.col(ts_col))
    back_us = F.lag(ep).over(w) - ep  # positive when time ran backward
    d = df.select(
        F.col(entity_col),
        back_us.alias("_back_us"),
    )
    return d.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("_back_us") > 0, 1).otherwise(0)).alias(
            "n_backward"
        ),
        F.round(
            F.max(F.when(F.col("_back_us") > 0, F.col("_back_us")))
            .cast("double") / F.lit(1e6),
            4,
        ).alias("max_backstep_s"),
        F.round(
            F.sum(F.when(F.col("_back_us") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("disorder_ratio"),
    )


def split_leakage(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split contamination audit: content groups (by exact text
    hash) whose members landed in MORE THAN ONE train/val/test split —
    the eval-leakage failure mode that survives a correct hash split
    whenever duplicate content carries different ids.  Run it after
    ``sampling.hash_split`` + before training; any returned row means
    dedup must run before (or on top of) the carve.

    100-TB shape: one hash-aggregation on the content hash (text itself
    never shuffles beyond the map-side md5), count + distinct-split
    roll-up per group, filter n_splits >= 2 — output is only the
    offending groups.

    Returns (content_hash, n_copies, n_splits, splits)."""
    g = df.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col(split_col)
    )
    return (
        g.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct(split_col).alias("n_splits"),
            F.sort_array(F.collect_set(split_col)).alias("splits"),
        )
        .filter(F.col("n_splits") >= 2)
    )


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CDC-style corpus snapshot diff: classify every document id across
    two corpus versions as added / removed / changed / unchanged by id
    presence + exact content hash — the ingestion-audit table a
    re-crawled 100 TB corpus needs before re-running dedup and
    re-carving splits (changed+added rows are the only work).

    100-TB shape: each side collapses to (id, md5) map-side — text
    never shuffles — then ONE full-outer co-partitioned join on id;
    output is one narrow row per id in either version.

    Returns (id, status, old_hash, new_hash)."""
    o = old_df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new_df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") == F.col("new_hash"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        F.col("id").alias(id_col),
        status.alias("status"),
        "old_hash",
        "new_hash",
    )
