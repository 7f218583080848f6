"""Point-in-interval (range) join without an equi key.

Spark has no native range join: a bare ``l.ts BETWEEN r.start AND
r.end`` predicate plans as BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) — O(|points| x |intervals|) and
the classic scale-killer for event-in-window queries.

``interval_join_binned`` is the standard blocking rewrite: quantize
time into fixed-width bins; each interval explodes into the bins it
covers, each point maps to exactly one bin, and the join becomes an
EQUI-join on (bin [, by-keys]) followed by the exact BETWEEN refine.
Candidate fan-out per interval is ceil(span / bin_width) + 1, so the
bin width tunes shuffle volume vs duplication: pick it near the median
interval span. This is the same rewrite Databricks' range-join hints
and interval libraries perform; here it is explicit, engine-agnostic
Catalyst (sequence + explode + equi-join) so AQE/skew handling apply
as for any other join.

Semantics: a point p matches interval i iff start <= p <= end
(inclusive both ends; half-open available via ``end_inclusive=False``).
A point pairs with EVERY matching interval (duplicating joins are the
caller's contract, as in SQL). Output never double-counts a pair: a
point has one bin, so each (point, interval) meets in exactly one bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: "list[str] | None" = None,
    bin_width_s: int = 3600,
    end_inclusive: bool = True,
) -> DataFrame:
    """Inner point-in-interval join via bin blocking (module docstring).

    ``by``: optional extra equi-keys (entity-scoped intervals); with an
    equi key Spark's SMJ would already avoid the nested loop, but the
    binning still bounds the per-key candidate set for long intervals.
    """
    by = list(by or [])
    width_us = int(bin_width_s) * 1_000_000  # micros

    def _bin_of(col: str) -> "F.Column":
        # Exact integer FLOOR division on longs. A double round-trip
        # (us / width).cast('long') truncates toward zero — pre-epoch
        # timestamps would collapse bins -0/+0 into one double-width bin
        # (breaking the documented fan-out bound) and beyond 2^53 us the
        # double loses integer precision. (us - pmod(us, w)) is an exact
        # non-negative-remainder multiple of w, so the SQL integral
        # `div` is exact floor division for every long.
        us = f"unix_micros({col})"
        return F.expr(f"(({us} - pmod({us}, {width_us}L)) div {width_us}L)")

    pts = points.withColumn("_bin", _bin_of(point_col))
    ivs = intervals.withColumn(
        "_bin", F.explode(F.sequence(_bin_of(start_col), _bin_of(end_col)))
    )
    refine = F.col(point_col) >= F.col(start_col)
    refine &= (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return pts.join(ivs, ["_bin"] + by).filter(refine).drop("_bin")
