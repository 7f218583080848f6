"""Shuffle-byte reduction: dictionary/key encoding for the hot stages.

Shuffle and sort stages are DRAM-bandwidth-bound (BENCH/BASELINE.md):
bytes-per-row through the exchanges is the scaling currency. These
helpers shrink the feature-stage rows losslessly:

* ``dict_encode``/``dict_decode`` — a low-cardinality string column
  (role: 4 values) becomes a tinyint against an explicitly captured
  dictionary. In UnsafeRow terms: a string field costs an 8-byte
  offset word + padded bytes (~24 B for "assistant"); a tinyint costs
  its fixed 8-byte word only.
* ``distinct_values`` — captures the dictionary from the data itself
  (one column-pruned, partially-aggregated pass: scan-speed on a
  dictionary-encoded parquet column), so the encoding is lossless by
  construction for the job that captured it.
* ``conv_key``/``conv_str`` — the generator's ``conv_%08d`` ids
  round-trip through a plain long (24 B string field → 8 B word).

The per-row decode work (element_at over a literal array,
format_string) is a map-side expression after the shuffles — it costs
CPU in the embarrassingly-parallel regime (measured 0.92 scaling) to
save bytes in the bandwidth-bound one (~0.65): exactly the right
trade on both this box and a real cluster's network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_values(df: DataFrame, col: str) -> list:
    """Sorted distinct values of a column — the captured dictionary.
    Partial aggregation makes this a scan-speed pass over one pruned
    column; cardinality must be small enough to collect (caller's
    contract — role/tool-name style columns)."""
    return sorted(r[0] for r in df.select(col).distinct().collect() if r[0] is not None)


def dict_encode(col, values: list) -> "F.Column":
    """String → 1-based tinyint position in `values` (NULL stays NULL).
    Values outside the captured dictionary would encode to 0 — callers
    that did not capture `values` from the same data must validate."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.array_position(arr, col).cast("tinyint")


def dict_decode(col, values: list) -> "F.Column":
    """1-based tinyint → string (NULL stays NULL — via get(), which is
    0-based and NULL-safe; element_at misbehaves on NULL indices)."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.get(arr, col.cast("int") - 1)


def conv_key(col) -> "F.Column":
    """'conv_%08d' string id → long join/partition key."""
    return F.substring(col, 6, 15).cast("long")


def conv_str(col) -> "F.Column":
    """long key → the original 'conv_%08d' id."""
    return F.format_string("conv_%08d", col)
