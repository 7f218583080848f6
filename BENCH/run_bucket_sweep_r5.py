"""Round-5 bucket-count sweep for the zero-exchange bucketed lane.

The bucketed job is ONE stage of n_buckets tasks (no Exchange nodes),
so bucket count IS the parallelism grain: 16 buckets = 2 waves on 8
cores, and any per-bucket duration variance turns the last wave into
idle cores. At 2 cores the same variance averages out over 8 waves —
that asymmetry depresses the measured 2->8 ratio without any real
shuffle/DRAM cost behind it. At 100 TB the tables carry thousands of
buckets, so the deployment shape is "many waves per core at every
cluster size"; this sweep measures how much of the remaining 2->8 gap
at 2.4M turns is wave quantization by trying 16 / 32 / 64 buckets on
identical data.

Protocol: same as BENCH/run_scaling_r5.py (taskset-pinned fresh JVMs,
/dev/shm warehouse+scratch, full-size warm-up, 2c/8c interleaved,
median of 3 rounds), one pass per bucket count, per-pass DRAM ceiling.
Table prep per bucket count is untimed (ingest-time decision).

Usage: python BENCH/run_bucket_sweep_r5.py [bucket_counts...]
Appends rows to BENCH/bucket_sweep_r5.jsonl.
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
OUT_JSONL = REPO / "BENCH" / "bucket_sweep_r5.jsonl"


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
        app_name="fjs-bkt-sweep-prep",
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
    scratch = f"/dev/shm/fjs-bkt-sweep-{n_buckets}"
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.asof import asof_join_bucketed
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.operators.window_features import with_turn_features

spark = build_session(app_name="fjs-bkt-sweep", master="local[{cores}]",
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
    raise RuntimeError(f"sweep run failed ({cores}c, {n_buckets} buckets):\n"
                       f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")


def main(bucket_counts: list[int]) -> None:
    for nb in bucket_counts:
        _prep_tables(nb)
    for nb in bucket_counts:
        t0 = time.time()
        stat_before = bench._read_proc_stat()
        times: dict[int, list[float]] = {2: [], 8: []}
        for _ in range(3):
            for cores in (2, 8):
                times[cores].append(_one_run(cores, nb))
        med = {c: sorted(v)[len(v) // 2] for c, v in times.items()}
        row = {
            "n_turns": N_TURNS,
            "n_buckets": nb,
            "local[2]": {"runs_sec": sorted(round(x, 1) for x in times[2]),
                         "median_sec": round(med[2], 1),
                         "turns_per_sec": round(N_TURNS / med[2], 1)},
            "local[8]": {"runs_sec": sorted(round(x, 1) for x in times[8]),
                         "median_sec": round(med[8], 1),
                         "turns_per_sec": round(N_TURNS / med[8], 1)},
            "scaling_efficiency_2_to_8": round(med[2] / (4 * med[8]), 3),
            "membw_ceiling": bench._membw_ceiling([2, 8]),
            "host_health": bench.host_health(stat_before),
            "elapsed_s": round(time.time() - t0, 1),
        }
        with OUT_JSONL.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [32, 64])
