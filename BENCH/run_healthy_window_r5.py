"""Round-5 healthy-window measurement runner.

The late-r5 jolt kernel fast paths (2.05x same-window A/B) invalidate
three absolute numbers that were recorded on the OLD kernel, but the
only windows available since the change have a collapsed DRAM bus
(membw 2->8 efficiency 0.43-0.65 with the documented co-tenant
signature). This script polls the bus and, the moment it reads
healthy, takes — in one uninterrupted window, bus re-probed between
steps:

1. a direct pin for ``canary_healthy_us_ref`` (7 single-thread canary
   runs, median) to replace the derived 7.3 µs/rec;
2. one 64-bucket zero-exchange sweep pass (the round's headline
   scaling lane) on the fast kernel, appended to
   ``bucket_sweep_r5.jsonl`` with ``kernel: fastpath``;
3. the sf0.1 flagship bench (median of 5) for the headline
   turns/sec row.

Healthy = 8-proc DRAM streaming >= 85 GB/s on two consecutive probes
90 s apart. The original gate also required 2-proc <= 26 GB/s
(BENCH/BASELINE.md healthy windows read ~20-22 / 71-85, and the
co-tenant signature INFLATES the 2-proc number), but the box rebooted
mid-round onto what behaves like a different host — 2-proc now reads
33-37 GB/s even as 8-proc recovers to 96+ — so the 2-proc ceiling
would never fire. A strong absolute 8-proc supply is the part of
"healthy" that actually bounds the 32-core flagship and the 8-core
sweep leg; the 2-proc number is recorded for the ratio context.

Usage: python BENCH/run_healthy_window_r5.py [max_wait_minutes]
Writes progress + results to BENCH/healthy_window_r5.json as it goes.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

OUT = REPO / "BENCH" / "healthy_window_r5.json"
POLL_S = 300


def _probe() -> dict:
    return bench._membw_ceiling([2, 8])


def _healthy(m: dict) -> bool:
    # >=85 was calibrated on the first post-reboot host ("8-proc recovers
    # to 96+"); the box rebooted AGAIN onto a profile whose otherwise-idle
    # 8-proc supply oscillates 80-94 (two in-runner probes pinned 80.7
    # with loadavg ~0 and no co-tenant signature). 78 keeps the gate above
    # the documented collapsed-bus band (54-78 with INFLATED 2-proc) while
    # letting an idle-box window on this host profile actually fire.
    return m["procs_8_gbps"] >= 78.0


def _save(state: dict) -> None:
    OUT.write_text(json.dumps(state, indent=1))


def main(max_wait_min: float) -> None:
    state: dict = {"probes": [], "status": "waiting"}
    deadline = time.time() + max_wait_min * 60
    streak = 0
    while streak < 2:  # two consecutive healthy probes, 90 s apart
        m = _probe()
        state["probes"].append(m)
        _save(state)
        if _healthy(m):
            streak += 1
            if streak < 2:
                time.sleep(90)
            continue
        streak = 0
        if time.time() > deadline:
            state["status"] = "timed_out_waiting_for_healthy_window"
            _save(state)
            print(json.dumps(state["probes"][-3:]))
            return
        time.sleep(POLL_S)

    state["status"] = "measuring"
    state["window_probe"] = m
    _save(state)

    # 1. canary pin (seconds; CPU-only)
    runs = [bench.jolt_kernel_us_per_rec() for _ in range(7)]
    state["canary_pin"] = {
        "runs_us": [round(x, 2) for x in runs],
        "median_us": round(statistics.median(runs), 2),
    }
    _save(state)

    # 2. one 64-bucket sweep pass on the fast kernel (~20 min).
    #    run_bucket_sweep_r5 appends its own row to bucket_sweep_r5.jsonl;
    #    tag the tail row afterwards so readers can split old/new kernel.
    sweep_jsonl = REPO / "BENCH" / "bucket_sweep_r5.jsonl"
    n_before = sum(1 for _ in sweep_jsonl.open())
    proc = subprocess.run(
        [sys.executable, str(REPO / "BENCH" / "run_bucket_sweep_r5.py"), "64"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    rows = sweep_jsonl.read_text().splitlines()
    if len(rows) > n_before:
        tagged = json.loads(rows[-1])
        tagged["kernel"] = "fastpath"
        # rows measured after the mapInArrow reshape engine landed carry
        # an explicit engine tag so old/new rows split cleanly
        tagged["reshape_engine"] = "arrow"
        rows[-1] = json.dumps(tagged)
        sweep_jsonl.write_text("\n".join(rows) + "\n")
        state["sweep_pass"] = tagged
    else:
        state["sweep_pass"] = {"error": proc.stderr[-800:]}
    state["post_sweep_probe"] = _probe()
    _save(state)

    # 3. sf0.1 flagship bench (~15 min) — full JSON kept separately.
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, cwd=str(REPO),
        env={**__import__("os").environ,
             "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"},
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            full = json.loads(line)
            (REPO / "BENCH" / "bench_sf01_fastkernel_r5.json").write_text(line)
            state["flagship"] = {
                k: full.get(k)
                for k in ("value", "flagship_runs_sec", "turns_per_sec",
                          "jolt_kernel_us_per_rec", "flagship_bucketed",
                          "membw_ceiling", "host_health")
            }
            break
    else:
        state["flagship"] = {"error": proc.stderr[-800:]}
    state["status"] = "done"
    _save(state)
    print(json.dumps({k: state[k] for k in ("canary_pin", "sweep_pass",
                                            "flagship", "window_probe")},
                     default=str)[:1500])


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 180.0)
