"""Per-conversation windowed turn features — pure Catalyst expressions.

Every frame ends at ``Window.currentRow``: nothing reads forward in
time except features explicitly named ``lead_*`` (the zero-temporal-
leakage rule). All windows share one partitioning
(``partitionBy(conv_id)``), so Catalyst computes the whole feature set
in a single sort+window stage: one shuffle for the entire pipeline.

At 100 TB: the shuffle key is conv_id; mega-conversations are the skew
risk (AQE cannot split a window partition) — see ``skew.py`` for the
salted two-pass variant that bounds per-task partition size while
producing identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.epoch import ensure_ltz

SESSION_GAP_S = 30 * 60


def turn_order_window(partition_cols=("conv_id",), order_cols=("turn_idx", "ts")) -> Window:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def with_turn_features(
    df: DataFrame,
    session_gap_s: int = SESSION_GAP_S,
    rolling_k: int = 5,
    include_leads: bool = True,
    tool_is_name: bool = False,
) -> DataFrame:
    """Compute the transcript feature vector per (conv_id, turn_idx, ts).

    Features (all backward-looking unless lead_-prefixed):
      prev_ts, inter_turn_s   — lag(ts), seconds since previous turn
      prev_role, role_alternated — role-change flag vs previous turn
      is_tool_call            — non-empty tool column
      tool_calls_last_k       — rolling tool-call count, last k turns incl. current
      tool_calls_cum          — running tool-call count
      session_id              — gap>threshold sessionization (0-based per conv)
      turn_in_session         — 0-based index within the session
      last_tool_name          — backfill: most recent tool name seen so far
      lead_ts, lead_role      — explicit forward-looking features

    tool_is_name: the ``tool`` column already holds the extracted tool
    NAME (or '' for no call) instead of the raw tool-call JSON — the
    shuffle-byte-reduced plan shape (see operators.encoding) where the
    json path extraction happened before the shuffle.
    """
    # Session-robust: naive parquet timestamps arrive as TIMESTAMP_NTZ
    # under a stock session and reject unix_micros/numeric casts.
    df = ensure_ltz(df, "ts")

    w = turn_order_window()
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wroll = w.rowsBetween(-(rolling_k - 1), Window.currentRow)

    prev_ts = F.lag("ts").over(w)
    gap_s = (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / F.lit(1_000_000.0)

    out = (
        df.withColumn("prev_ts", prev_ts)
        .withColumn("inter_turn_s", gap_s)
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn(
            "role_alternated",
            F.when(F.col("prev_role").isNull(), F.lit(None).cast("boolean")).otherwise(
                F.col("role") != F.col("prev_role")
            ),
        )
        .withColumn(
            "is_tool_call",
            (F.col("tool").isNotNull() & (F.col("tool") != F.lit(""))).cast("int"),
        )
    )
    out = (
        out.withColumn("tool_calls_last_k", F.sum("is_tool_call").over(wroll))
        .withColumn("tool_calls_cum", F.sum("is_tool_call").over(wcum))
        .withColumn(
            "session_break",
            F.when(F.col("inter_turn_s") > F.lit(float(session_gap_s)), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("session_break").over(wcum))
        .withColumn(
            "turn_in_session",
            F.row_number().over(
                Window.partitionBy("conv_id", "session_id").orderBy("turn_idx", "ts")
            )
            - F.lit(1),
        )
        .withColumn(
            "last_tool_name",
            F.last(
                F.when(
                    F.col("is_tool_call") == 1,
                    F.col("tool") if tool_is_name else F.get_json_object("tool", "$.name"),
                ),
                ignorenulls=True,
            ).over(wcum),
        )
    )
    if include_leads:
        out = out.withColumn("lead_ts", F.lead("ts").over(w)).withColumn(
            "lead_role", F.lead("role").over(w)
        )
    return out.drop("session_break")


def backfill(
    df: DataFrame,
    value_col: str,
    partition_cols=("conv_id",),
    order_cols=("turn_idx", "ts"),
    direction: str = "forward",
) -> DataFrame:
    """Fill nulls from the last known value (forward) or next known value
    (backward). Forward fill is leakage-safe; backward fill reads the
    future and is only for label/offline use — callers opt in explicitly.
    """
    if direction == "forward":
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last(value_col, ignorenulls=True).over(w)
    elif direction == "backward":
        ordering = [F.col(c).desc() for c in order_cols]
        w = (
            Window.partitionBy(*partition_cols)
            .orderBy(*ordering)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last(value_col, ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be forward|backward, got {direction!r}")
    return df.withColumn(value_col + "_filled", filled)
