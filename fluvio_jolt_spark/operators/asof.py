"""Point-in-time (as-of) join — Spark has no native ASOF JOIN.

Primary implementation: union-tag + last-known-value window. One
shuffle on the entity key, fully Catalyst (codegen'd window), scales to
arbitrary right-side density, and AQE handles join-side skew. Tie
semantics are pinned to ``<=``: a snapshot with ``snap_ts == ts`` IS
visible to that turn (right rows order before left rows at equal ts).

Cross-check implementation: per-entity ``pd.merge_asof`` via
applyInPandas — used in tests to validate the window variant, and as
the escape hatch when the right side carries many columns.

Zero-leakage invariant (tested): no joined value may originate from a
snapshot with ``snap_ts > ts``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    right_on: str = "snap_ts",
    by: str | list[str] = "conv_id",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right values with
    ``right_on <= on`` (or ``<`` when strict) within the same ``by`` keys.

    Plan shape: union → one shuffle on (by) → window sort on
    (event time, side priority) → filter left rows. No join node at all,
    so there is no row-multiplication risk and no broadcast-size limit.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by_cols + [right_on]]

    # Side priority at equal timestamps: right first for <=, left first for <.
    right_prio = 0 if not strict else 2
    left_prio = 1

    l_tag = left.withColumn("_evt_ts", F.col(on)).withColumn("_prio", F.lit(left_prio))
    for c in value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    r_tag = right.withColumn("_evt_ts", F.col(right_on)).withColumn("_prio", F.lit(right_prio))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = by_cols + ["_evt_ts", "_prio"] + \
        [c for c in left.columns if c not in by_cols] + value_cols
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    w = (
        Window.partitionBy(*by_cols)
        .orderBy("_evt_ts", "_prio")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))

    return unioned.filter(F.col("_prio") == left_prio).drop("_evt_ts", "_prio")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    right_on: str = "snap_ts",
    by: str = "conv_id",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Cross-check variant: cogroup both sides by entity and run
    ``pd.merge_asof`` per group (applyInPandas over a cogroup). Same
    output contract as ``asof_join``."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in [by, right_on]]

    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields) + [right.schema[c] for c in value_cols]
    schema = T.StructType(fields)
    allow_exact = not strict
    left_cols = left.columns

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=left_cols + value_cols)
        lpdf = lpdf.sort_values(on, kind="mergesort")
        if rpdf.empty:
            for c in value_cols:
                lpdf[c] = None
            return lpdf
        rpdf = rpdf.sort_values(right_on, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf[[right_on] + value_cols],
            left_on=on,
            right_on=right_on,
            direction="backward",
            allow_exact_matches=allow_exact,
        )
        return merged[left_cols + value_cols]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=schema)
    )
