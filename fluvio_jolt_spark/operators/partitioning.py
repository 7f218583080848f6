"""Scan-parallelism repair for CPU-dense map stages.

Spark sizes scan splits by INPUT bytes (spark.sql.files.maxPartitionBytes),
which is right for I/O-bound scans but starves operators whose map stage
amplifies the input by orders of magnitude (n-gram explodes, per-shingle
hashing, per-element array math): a compact single-row-group parquet file
yields ONE scan task and the whole explode+hash pipeline runs on one core
regardless of cluster size. Parquet row-group granularity means split
configs (maxPartitionBytes / minPartitionNum) cannot help either — a
split without a row-group midpoint reads zero rows.

``fan_out`` is the guide §2.5 "input skew: repartition immediately after
the read" fix, made scale-adaptive: it round-robin-repartitions ONLY when
the frame's actual partition count is below the session's parallelism.
At 100 TB a table scan has thousands of row groups and this is a no-op;
it fires exactly in the degenerate case (few/unsplittable files) where a
one-time shuffle of the not-yet-exploded rows is orders of magnitude
cheaper than single-threading the downstream CPU.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: "int | None" = None) -> DataFrame:
    """Round-robin repartition a frame that arrives with fewer partitions
    than the session's parallelism; no-op otherwise (and for streaming
    frames, which manage their own partitioning).

    Call it BEFORE a CPU-dense map stage and AFTER projecting down to the
    columns that stage needs, so the repair shuffle carries the narrow
    projection only. Round-robin keeps it deterministic-safe: Spark sorts
    before round-robin repartitioning (SPARK-23207) so retried tasks
    reproduce the same placement, and no downstream result here depends
    on row placement (hash-keyed aggregations/joins only).
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = int(min_partitions or sc.defaultParallelism)
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
