"""Round-5 N→4N scaling evidence at 2.4M turns — HEADLINE = the
co-bucketed zero-exchange layout (promoted per r4's measurement: plain
parquet rawls 2→8 ≈ 0.50 because the payload exchange + sink become
the 8-core critical path, while the bucketed job on identical input
measured 0.66–0.77). The plain-parquet lane is still run and reported,
now with the r5 composition (as-of fill over the 3-column narrow
frame, wide feature frame shuffles once).

Protocol (unchanged from r3/r4, see BENCH/BASELINE.md): taskset-pinned
fresh JVM per run, /dev/shm warehouse+scratch, full-size warm-up run
compiling the identical AQE/codegen plan, catalog stats precomputed,
2c/8c interleaved within each round, median of 3 rounds per rep, both
LANES interleaved inside the same rep so they sample the same box
window, simultaneous DRAM-bandwidth ceiling per rep.

Table prep (bucketing) happens once, untimed — at 100 TB the tables
are written bucketed at ingest; re-bucketing per query is not the
deployment shape.

Usage: python BENCH/run_scaling_r5.py [reps]
Appends per-rep rows to BENCH/scaling_r5.jsonl; summary to
BENCH/scaling_r5.json.
"""

from __future__ import annotations

import json
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

N_TURNS = 2_400_000
# 64 = suggest_bucket_count(2.4M): the bucket-count sweep
# (bucket_sweep_r5.jsonl) showed 16 buckets quantizes into 2 task
# waves at 8 cores and costs ~0.06-0.08 raw ratio vs 64.
N_BUCKETS = 64
# same path scheme as run_bucket_sweep_r5._warehouse(64), so an
# already-prepped sweep warehouse is reused
WAREHOUSE = "/dev/shm/fjs-bkt-wh-64"
OUT_JSONL = REPO / "BENCH" / "scaling_r5.jsonl"
OUT_JSON = REPO / "BENCH" / "scaling_r5.json"


def _prep_tables() -> None:
    """Write the bucketed managed tables once (untimed ingest step)."""
    done = Path(WAREHOUSE) / "_PREP_DONE"
    if done.exists():
        return
    from fluvio_jolt_spark.plans.session import build_session
    from fluvio_jolt_spark.sources.tables import BucketedTableSource
    from fluvio_jolt_spark.sources.transcripts import read_transcripts

    spark = build_session(
        app_name="fjs-bkt-prep",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": WAREHOUSE},
    )
    turns, snaps = read_transcripts(spark, n_turns=N_TURNS)
    src = BucketedTableSource(n_buckets=N_BUCKETS, bucket_col="conv_id")
    for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    src.write(turns, "fjs_bkt_turns")
    src.write(snaps, "fjs_bkt_snaps")
    spark.stop()
    done.touch()


def _one_bucketed_run(cores: int) -> float:
    """One pinned fresh-JVM run of the zero-exchange bucketed job (the
    run_features --layout=bucketed plan) over the prepped tables."""
    scratch = "/dev/shm/fjs-bkt-scale"
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.asof import asof_join_bucketed
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.operators.window_features import with_turn_features

spark = build_session(app_name="fjs-bkt-scale", master="local[{cores}]",
                      shuffle_partitions={2 * cores},
                      extra_conf={{"spark.sql.warehouse.dir": {WAREHOUSE!r},
                                   "spark.local.dir": {scratch!r} + "/local"}})
spec_json = reference_bench_spec()

# The in-memory catalog is per-session: re-register the prepped bucketed
# data as EXTERNAL bucketed tables (same files, same bucket spec — the
# writer's bucket-id file naming is what the scan trusts).
for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
    path = {WAREHOUSE!r} + "/" + name
    sch = spark.read.parquet(path).schema
    ddl = ", ".join(f"`{{f.name}}` {{f.dataType.simpleString()}}" for f in sch)
    spark.sql(
        f"CREATE TABLE {{name}} ({{ddl}}) USING parquet "
        f"CLUSTERED BY (conv_id) SORTED BY (conv_id) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{{path}}'"
    )

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
    raise RuntimeError(f"bucketed run failed ({cores}c):\n"
                       f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")


def _lane_summary(times: "dict[int, list[float]]") -> dict:
    med = {c: sorted(v)[len(v) // 2] for c, v in times.items()}
    out = {
        f"local[{c}]": {
            "runs_sec": sorted(round(x, 1) for x in times[c]),
            "median_sec": round(med[c], 1),
            "turns_per_sec": round(N_TURNS / med[c], 1),
        }
        for c in times
    }
    out["scaling_efficiency_2_to_8"] = round(med[2] / (4 * med[8]), 3)
    return out


def main(n_reps: int = 4) -> None:
    _prep_tables()
    reps: list[dict] = []
    if OUT_JSONL.exists():
        reps = [json.loads(l) for l in OUT_JSONL.read_text().splitlines() if l.strip()]
    while len(reps) < n_reps:
        t0 = time.time()
        plain: dict[int, list[float]] = {2: [], 8: []}
        bkt: dict[int, list[float]] = {2: [], 8: []}
        for _ in range(3):  # interleaved rounds, lanes adjacent
            for cores in (2, 8):
                plain[cores].append(bench._one_scaling_run(cores, N_TURNS))
                bkt[cores].append(_one_bucketed_run(cores))
        rep = {
            "rep": len(reps),
            "n_turns": N_TURNS,
            "n_buckets": N_BUCKETS,
            "bucketed": _lane_summary(bkt),
            "plain": _lane_summary(plain),
            "membw_ceiling": bench._membw_ceiling([2, 8]),
            "elapsed_s": round(time.time() - t0, 1),
        }
        reps.append(rep)
        with OUT_JSONL.open("a") as f:
            f.write(json.dumps(rep) + "\n")
        print(json.dumps(rep), flush=True)

    bkt_raws = [r["bucketed"]["scaling_efficiency_2_to_8"] for r in reps]
    plain_raws = [r["plain"]["scaling_efficiency_2_to_8"] for r in reps]
    summary = {
        "protocol": "HEADLINE = co-bucketed zero-exchange job (untimed "
        "ingest-time bucketing; run_features --layout=bucketed plan); plain "
        "lane = r5 flagship (narrow as-of, single wide shuffle). Pinned "
        "interleaved 2->8, fresh JVMs, /dev/shm warehouse+scratch, full-size "
        "warm-up, median of 3 rounds per rep, lanes interleaved per rep.",
        "n_turns": N_TURNS,
        "headline_lane": "bucketed",
        "bucketed_reps": bkt_raws,
        "bucketed_median_raw_2_to_8": round(statistics.median(bkt_raws), 3),
        "plain_reps": plain_raws,
        "plain_median_raw_2_to_8": round(statistics.median(plain_raws), 3),
        "membw_ceiling_per_rep": [
            r["membw_ceiling"]["membw_eff_2_to_8"] for r in reps
        ],
        "detail": reps,
    }
    OUT_JSON.write_text(json.dumps(summary, indent=1))
    print(json.dumps({
        "bucketed_median_raw_2_to_8": summary["bucketed_median_raw_2_to_8"],
        "plain_median_raw_2_to_8": summary["plain_median_raw_2_to_8"],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
