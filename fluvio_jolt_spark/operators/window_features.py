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


def with_decayed_sum(
    df: DataFrame,
    tau_s: float,
    value_col: str | None = None,
    partition_cols=("conv_id",),
    ts_col: str = "ts",
    out_col: str = "decayed_sum",
    reanchor_chunk_tau: float | None = None,
) -> DataFrame:
    """Exponentially time-decayed running sum per partition:

        out(i) = sum_{j : ts_j <= ts_i} v_j * exp(-(ts_i - ts_j) / tau_s)

    (v_j = ``value_col``, or 1 per row when None — a decayed event
    count). The naive form is O(n^2) per partition; this computes it
    O(n) in one window stage via the anchored factorization

        out(i) = exp(-(e_i - b)/tau) * cumsum_j( v_j * exp((e_j - b)/tau) )

    with b = the partition's earliest epoch. b is a full-partition min,
    but the minimum of an epoch column is always achieved at the
    earliest row — available in every prefix — so the feature remains
    leakage-free. The cumulative sum uses the default RANGE frame
    (ties on ts accumulate together), which Spark and ANSI engines
    order identically, so results are engine-reproducible.

    Overflow bound: exp((e - b)/tau) requires the partition's time
    span to stay under ~690*tau_s (IEEE double). For unbounded spans
    (years of events, tau of minutes) pass ``reanchor_chunk_tau``
    (chunk width C*tau, 350 <= C <= 690): rows re-anchor per chunk and
    the previous chunk's anchored total carries over with factor
    exp(-C); contributions from >= 2 chunks back decay by exp(-2C),
    which underflows to exact +0.0 in double for C >= ~355, so the
    one-chunk carry is EXACT in double arithmetic — no approximation.
    The carry join keys on (partition, chunk); at cluster scale it
    reuses the window's hash partitioning on the partition cols.
    """
    df = ensure_ltz(df, ts_col)
    pk = list(partition_cols)
    e = F.unix_micros(F.col(ts_col)) / F.lit(1_000_000.0)
    v = F.col(value_col) if value_col is not None else F.lit(1.0)
    tau = F.lit(float(tau_s))

    if reanchor_chunk_tau is None:
        wfull = Window.partitionBy(*pk)
        wcum = Window.partitionBy(*pk).orderBy(e)
        base = F.min(e).over(wfull)
        cum = F.sum(v * F.exp((e - base) / tau)).over(wcum)
        return df.withColumn(out_col, F.exp((base - e) / tau) * cum)

    c = float(reanchor_chunk_tau)
    if not (350.0 <= c <= 690.0):
        raise ValueError(f"reanchor_chunk_tau must be in [350, 690], got {c}")
    width = c * float(tau_s)
    tmp_e, tmp_ch, tmp_r, tmp_t = "_dsum_e", "_dsum_chunk", "_dsum_r", "_dsum_term"
    wbase = Window.partitionBy(*pk)
    with_cols = (
        df.withColumn(tmp_e, e)
        .withColumn(
            tmp_ch,
            F.floor((F.col(tmp_e) - F.min(tmp_e).over(wbase)) / F.lit(width)),
        )
        .withColumn(
            tmp_r,
            F.col(tmp_e)
            - F.min(tmp_e).over(wbase)
            - F.col(tmp_ch) * F.lit(width),
        )
        .withColumn(tmp_t, v * F.exp(F.col(tmp_r) / tau))
    )
    wcum = Window.partitionBy(*pk, tmp_ch).orderBy(F.col(tmp_e))
    cum_in_chunk = F.sum(tmp_t).over(wcum)
    # Previous chunk's anchored total, decayed across the boundary.
    # exp(-2C) == +0.0 in double, so one chunk back is the whole carry.
    totals = with_cols.groupBy(*pk, tmp_ch).agg(F.sum(tmp_t).alias("_dsum_S"))
    wlag = Window.partitionBy(*pk).orderBy(tmp_ch)
    prev = totals.select(
        *pk,
        tmp_ch,
        (F.lag("_dsum_S").over(wlag)
         * F.when(
             F.lag(tmp_ch).over(wlag) == F.col(tmp_ch) - 1, F.lit(1.0)
         ).otherwise(F.lit(0.0))
         ).alias("_dsum_carry"),
    )
    # NULL iff no non-null contribution in the current-chunk prefix OR
    # the previous chunk; anything older decayed by exp(-2C) == exact
    # +0.0 in double, so its numeric value is 0 either way — the
    # variants can differ only in NULL-vs-0.0 for such rows.
    carry = F.col("_dsum_carry")
    out = (
        with_cols.join(prev, pk + [tmp_ch], "left")
        .withColumn(
            out_col,
            F.when(
                cum_in_chunk.isNull() & carry.isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.exp(-F.col(tmp_r) / tau)
                * (
                    F.coalesce(cum_in_chunk, F.lit(0.0))
                    + F.coalesce(carry, F.lit(0.0)) * F.exp(F.lit(-c))
                )
            ),
        )
    )
    return out.drop(tmp_e, tmp_ch, tmp_r, tmp_t, "_dsum_carry")


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


def with_forward_label(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    partition_cols=("user_id",),
    horizon_s: float = 86_400.0,
    out_prefix: str = "label",
) -> DataFrame:
    """Forward label extraction — the ONE deliberately forward-looking
    computation in a training pipeline, named ``label_*`` like the
    ``lead_*`` features (everything unprefixed is backward-only; the
    zero-temporal-leakage rule): per row, sum and count of
    ``value_col`` over the half-open future window (t, t + horizon]
    within the partition. NULL sum when no future rows exist — an
    unknowable label is absent, not 0 (the tail rows inside the last
    horizon are censored; training code drops or special-cases them).

    Exact integer-µs RANGE frame (1 .. horizon µs following), so the
    window bounds are engine-reproducible. One shuffle on the
    partition cols — and it re-uses the partitioning of any preceding
    backward feature windows over the same entity.
    """
    df = ensure_ltz(df, ts_col)
    pk = list(partition_cols)
    e = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*pk)
        .orderBy(e)
        .rangeBetween(1, int(round(horizon_s * 1_000_000)))
    )
    return df.withColumn(f"{out_prefix}_sum", F.sum(value_col).over(w)).withColumn(
        f"{out_prefix}_count", F.count(value_col).over(w)
    )


def state_transition_matrix(
    df: DataFrame,
    entity_col: str = "conv_id",
    state_col: str = "role",
    order_cols=("turn_idx", "ts"),
    decimals: int = 4,
) -> DataFrame:
    """Corpus-level Markov transition matrix of an ordered per-entity
    state sequence: for transcripts, how often does a ``user`` turn
    follow an ``assistant`` turn, a ``tool`` turn follow an
    ``assistant`` turn, and so on — the structural signature of a
    conversation corpus (role-alternation health, tool-loop detection,
    truncated-dialog drift between corpus snapshots).

    Returns (prev_state, state, n, frac) where ``frac`` is the
    row-normalized transition probability P(state | prev_state),
    rounded. The first turn of each entity (no predecessor) appears
    under prev_state = NULL — kept, because the start-of-conversation
    distribution is itself a feature.

    Shuffle shape at 10^12 turns: ONE hash-partition + sort on the
    entity key for the lag window (shared with any other per-entity
    window stage in the same plan), then a partial-agg'd groupBy on the
    (prev_state, state) pair — the second shuffle carries only
    |states|^2 rows per map partition. The row-normalizing total is a
    window over prev_state on the already-tiny matrix, not a second
    pass over the data."""
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = df.select(
        F.lag(state_col).over(w).alias("prev_state"),
        F.col(state_col).alias("state"),
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), decimals).alias("frac"),
    )
