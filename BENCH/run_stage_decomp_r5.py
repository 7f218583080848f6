"""Round-5 per-stage scaling decomposition at 2.4M turns (pinned).

Same protocol as r4 (taskset-pinned fresh JVM per run, /dev/shm
scratch, full-size warm-up, catalog stats precomputed), over the r5
flagship composition: the as-of fill now runs on a (conv_id, turn_idx,
ts) narrow projection and joins back in the payload stage, so the wide
feature frame shuffles exactly once. Stage milestones mirror r4 for
comparability:

  scan          raw table scan
  features      windowed feature frame (noop sink)
  asof          features JOIN narrow as-of fill — everything before
                the payload (r4: as-of fill OVER the feature frame;
                the stage boundary is the same semantic milestone)
  reshape       jolt mapInPandas over the payload
  full_noop     whole pipeline, noop sink
  full_parquet  whole pipeline, parquet sink (the real job)

Usage: python BENCH/run_stage_decomp_r5.py [n_turns]
Writes BENCH/stage_decomp_r5.json.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STAGES = ["scan", "features", "asof", "reshape", "full_noop", "full_parquet"]


def _one_run(cores: int, n_turns: int, stage: str) -> float:
    scratch = "/dev/shm/fjs-decomp5"
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.sources.transcripts import read_transcripts
from fluvio_jolt_spark.operators.encoding import (conv_key, dict_encode,
                                                  distinct_values)
from fluvio_jolt_spark.operators.skew import with_turn_features_salted
from fluvio_jolt_spark.operators.window_features import with_turn_features
from fluvio_jolt_spark.operators.asof import asof_join, asof_join_salted
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from pyspark.sql import functions as F
import bench

spark = build_session(app_name="fjs-decomp5", master="local[{cores}]",
                      shuffle_partitions={2 * cores},
                      extra_conf={{"spark.local.dir": {scratch!r} + "/local"}})
turns, snaps = read_transcripts(spark, n_turns={n_turns})
roles = distinct_values(turns, "role")
max_conv = turns.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
chunk_rows = 8192
salted = max_conv > 4 * chunk_rows

def narrow_frame():
    return turns.select(
        conv_key(F.col("conv_id")).alias("conv_id"), "turn_idx",
        dict_encode(F.col("role"), roles, strict=False).alias("role"),
        F.when(F.col("tool").isNotNull() & (F.col("tool") != ""),
               F.coalesce(F.get_json_object("tool", "$.name"), F.lit(""))
              ).otherwise("").alias("tool"),
        "ts")

def feats_frame():
    narrow = narrow_frame()
    if salted:
        return with_turn_features_salted(narrow, chunk_rows=chunk_rows,
                                         tool_is_name=True)
    return with_turn_features(narrow, tool_is_name=True)

def asofn_frame():
    asof_left = narrow_frame().select("conv_id", "turn_idx", "ts")
    snaps_enc = snaps.withColumn("conv_id", conv_key(F.col("conv_id")))
    if salted:
        a = asof_join_salted(asof_left, snaps_enc, on="ts", right_on="snap_ts",
                             by="conv_id", chunk_rows=chunk_rows)
    else:
        a = asof_join(asof_left, snaps_enc, on="ts", right_on="snap_ts",
                      by="conv_id")
    snap_cols = [c for c in a.columns if c not in ("conv_id", "turn_idx", "ts")]
    return a.select(F.col("conv_id").alias("_ck"), "turn_idx", *snap_cols)

def build():
    stage = {stage!r}
    if stage == "scan":
        return turns
    if stage == "features":
        return feats_frame()
    if stage == "asof":
        feats = feats_frame().drop("tool").withColumnRenamed("conv_id", "_ck")
        return feats.join(asofn_frame().hint("SHUFFLE_HASH"), ["_ck", "turn_idx"])
    if stage == "reshape":
        return jolt_reshape(turns.select("conv_id", "turn_idx", "text", "tool"),
                            reference_bench_spec(), columns="text")
    return bench.build_flagship_frame(spark, turns, snaps, chunk_rows=chunk_rows,
                                      roles=roles, max_conv=max_conv)

def run(df, tag):
    if {stage!r} == "full_parquet":
        df.write.mode("overwrite").parquet({scratch!r} + "/out_" + tag)
        shutil.rmtree({scratch!r} + "/out_" + tag, ignore_errors=True)
    else:
        df.write.format("noop").mode("overwrite").save()

run(build(), "warm")  # full-size warm-up: same AQE/codegen plan
times = []
for i in range(3):  # median-of-3: single-shot stage numbers track host
    t0 = time.perf_counter()  # noise spikes on this box (r4 lesson)
    run(build(), f"timed{{i}}")
    times.append(time.perf_counter() - t0)
print("ELAPSED", sorted(times)[1])
spark.stop()
"""
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO))
    shutil.rmtree(scratch + "/local", ignore_errors=True)
    for line in proc.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"stage run failed ({cores}c {stage}):\n"
                       f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")


def main(n_turns: int = 2_400_000) -> None:
    import bench

    out: dict = {"n_turns": n_turns, "stages": {}}
    # interleave 2c/8c per stage so drift hits both configs alike
    for stage in STAGES:
        row = {}
        for cores in (2, 8):
            row[f"local[{cores}]"] = round(_one_run(cores, n_turns, stage), 1)
        row["efficiency_2_to_8"] = round(
            row["local[2]"] / (4 * row["local[8]"]), 3
        )
        out["stages"][stage] = row
        print(json.dumps({stage: row}), flush=True)
    out["membw_ceiling"] = bench._membw_ceiling([2, 8])
    (REPO / "BENCH" / "stage_decomp_r5.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000)
