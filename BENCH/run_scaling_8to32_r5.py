"""Round-5 addendum: 8->32-core scaling of the bucketed fastpath lane.

The round's N->4N evidence is the 2->8 sweep (run_bucket_sweep_r5.py);
this runner measures the SAME zero-exchange bucketed job at the other
4x step this box offers — local[8] -> local[32], the flagship's actual
session size — with the DRAM-streaming ceiling probed at 8 and 32
processes in the same window.  Earlier rounds established that 8->32
on this single-socket VM is bounded by the one shared memory bus (the
4-separate-JVM control in BENCH/multijvm_r*.json scales no better), so
the honest comparison is engine ratio vs bus ratio, same as the 2->8
analysis in BENCH/BASELINE.md.

Differences from the 2->8 sweep, both deliberate:
  * 128-bucket table (vs 64) so the 32-core leg runs 4 task waves
    instead of 2 — wave quantization would otherwise bill idle-core
    time to the engine (see run_bucket_sweep_r5.py docstring).
  * cores (8, 32) and membw probes (8, 32).

Usage: python BENCH/run_scaling_8to32_r5.py [n_buckets]
Appends one row to BENCH/scaling_8to32_r5.jsonl.
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

import bench  # noqa: E402

N_TURNS = 2_400_000
OUT_JSONL = REPO / "BENCH" / "scaling_8to32_r5.jsonl"


def _warehouse(n_buckets: int) -> str:
    return f"/dev/shm/fjs-bkt-wh-{n_buckets}"


def _prep_tables(n_buckets: int) -> None:
    wh = _warehouse(n_buckets)
    done = Path(wh) / "_PREP_DONE"
    if done.exists():
        return
    from fluvio_jolt_spark.plans.session import build_session
    from fluvio_jolt_spark.sources.tables import BucketedTableSource
    from fluvio_jolt_spark.sources.transcripts import read_transcripts

    spark = build_session(
        app_name="fjs-8to32-prep",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    turns, snaps = read_transcripts(spark, n_turns=N_TURNS)
    src = BucketedTableSource(n_buckets=n_buckets, bucket_col="conv_id")
    for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    src.write(turns, "fjs_bkt_turns")
    src.write(snaps, "fjs_bkt_snaps")
    spark.stop()
    done.touch()


def _one_run(cores: int, n_buckets: int) -> float:
    wh = _warehouse(n_buckets)
    scratch = f"/dev/shm/fjs-8to32-{n_buckets}"
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.asof import asof_join_bucketed
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.operators.window_features import with_turn_features

spark = build_session(app_name="fjs-8to32", master="local[{cores}]",
                      shuffle_partitions={2 * cores},
                      extra_conf={{"spark.sql.warehouse.dir": {wh!r},
                                   "spark.local.dir": {scratch!r} + "/local"}})
for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
    path = {wh!r} + "/" + name
    sch = spark.read.parquet(path).schema
    ddl = ", ".join(f"`{{f.name}}` {{f.dataType.simpleString()}}" for f in sch)
    spark.sql(
        f"CREATE TABLE {{name}} ({{ddl}}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id) INTO {n_buckets} BUCKETS "
        f"LOCATION '{{path}}'"
    )
spec_json = reference_bench_spec()

def build():
    bt = spark.table("fjs_bkt_turns")
    bs = spark.table("fjs_bkt_snaps")
    feats = with_turn_features(
        bt.select("conv_id", "turn_idx", "role", "tool", "ts"),
        session_gap_s=1800)
    feats = asof_join_bucketed(feats, bs, on="ts", right_on="snap_ts",
                               by="conv_id", key_cols=("turn_idx",))
    joined = feats.join(bt.select("conv_id", "turn_idx", "text"),
                        ["conv_id", "turn_idx"])
    return jolt_reshape(joined, spec_json, columns="text")

def run(tag):
    build().write.mode("overwrite").parquet({scratch!r} + "/out_" + tag)
    shutil.rmtree({scratch!r} + "/out_" + tag, ignore_errors=True)

run("warm")  # full-size warm-up, same plan as the timed run
t0 = time.perf_counter()
run("timed")
print("ELAPSED", time.perf_counter() - t0)
spark.stop()
"""
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO))
    shutil.rmtree(scratch + "/local", ignore_errors=True)
    for line in proc.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"8to32 run failed ({cores}c, {n_buckets} buckets):\n"
                       f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")


def main(n_buckets: int) -> None:
    _prep_tables(n_buckets)
    t0 = time.time()
    stat_before = bench._read_proc_stat()
    times: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(3):
        for cores in (8, 32):
            times[cores].append(_one_run(cores, n_buckets))
    med = {c: sorted(v)[len(v) // 2] for c, v in times.items()}
    row = {
        "n_turns": N_TURNS,
        "n_buckets": n_buckets,
        "kernel": "fastpath",
        "local[8]": {"runs_sec": sorted(round(x, 1) for x in times[8]),
                     "median_sec": round(med[8], 1),
                     "turns_per_sec": round(N_TURNS / med[8], 1)},
        "local[32]": {"runs_sec": sorted(round(x, 1) for x in times[32]),
                      "median_sec": round(med[32], 1),
                      "turns_per_sec": round(N_TURNS / med[32], 1)},
        "scaling_efficiency_8_to_32": round(med[8] / (4 * med[32]), 3),
        "membw_ceiling": bench._membw_ceiling([8, 32]),
        "host_health": bench.host_health(stat_before),
        "elapsed_s": round(time.time() - t0, 1),
    }
    with OUT_JSONL.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
