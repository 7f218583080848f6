"""Round-4 scaling protocol driver (BENCH/BASELINE.md §2 protocol).

Round-3 finding: at 600k turns the feature+as-of stage is
SCHEDULING-bound at 8 cores (sub-second tasks), so the raw 2→8 number
floors below the engine's real scaling. This round runs the identical
pinned-interleaved protocol at 2.4M turns (4x the work per task,
above the salt threshold) — the VERDICT-prescribed honest path to the
raw ≥0.75 target.

Gating: each repetition fires only when the box's simultaneously
measured DRAM-bandwidth ceiling (2→8 membw efficiency) reads ≥ 0.84 —
otherwise the rep would measure host contention, not the engine
(memory: the box's DRAM streaming bandwidth fluctuates 2x
minute-to-minute). Every rep records its own ceiling alongside the
raw number so the pair is always interpretable.

Usage: python BENCH/run_scaling_r4.py [n_reps]  (default 4)
Appends one JSON line per repetition to BENCH/scaling_r4.jsonl and
writes the final summary to BENCH/scaling_r4.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

N_TURNS = 2_400_000
MEMBW_GATE = 0.84
OUT_JSONL = REPO / "BENCH" / "scaling_r4.jsonl"
OUT_JSON = REPO / "BENCH" / "scaling_r4.json"


def main(n_reps: int = 4) -> None:
    from fluvio_jolt_spark.sources.transcripts import materialize

    materialize(N_TURNS)  # cached from r3; no-op when present
    reps: list[dict] = []
    if OUT_JSONL.exists():
        reps = [json.loads(l) for l in OUT_JSONL.read_text().splitlines() if l.strip()]
    while len(reps) < n_reps:
        waited = 0
        while True:
            ceil = bench._membw_ceiling([2, 8])
            if ceil["membw_eff_2_to_8"] >= MEMBW_GATE:
                break
            waited += 1
            if waited > 60:  # ~1h of gating: record the best we saw anyway
                break
            time.sleep(45)
        t0 = time.time()
        res = bench.scaling_runs(N_TURNS, pairs=((2, 8),), rounds=3)
        rep = {
            "rep": len(reps),
            "n_turns": N_TURNS,
            "pre_gate_membw_eff": ceil["membw_eff_2_to_8"],
            "gate_waits": waited,
            "elapsed_s": round(time.time() - t0, 1),
            **res,
        }
        reps.append(rep)
        with OUT_JSONL.open("a") as f:
            f.write(json.dumps(rep) + "\n")
        print(json.dumps(rep), flush=True)

    raws = [r["scaling_efficiency_2_to_8"] for r in reps]
    membw = [r["membw_ceiling"]["membw_eff_2_to_8"] for r in reps]
    summary = {
        "protocol": "pinned interleaved 2->8, fresh JVMs, /dev/shm scratch, "
        "full-size warm-up, catalog stats precomputed, median of 3 "
        "interleaved rounds per rep; rep fires when membw ceiling >= 0.84",
        "n_turns": N_TURNS,
        "reps": raws,
        "median_raw_2_to_8": round(statistics.median(raws), 3),
        "best_raw_2_to_8": max(raws),
        "membw_ceiling_per_rep": membw,
        "median_membw_ceiling": round(statistics.median(membw), 3),
        "detail": reps,
    }
    OUT_JSON.write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: summary[k] for k in
                      ("median_raw_2_to_8", "best_raw_2_to_8",
                       "median_membw_ceiling", "reps")}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
