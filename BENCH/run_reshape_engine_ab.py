"""Interleaved A/B: jolt_reshape engine="arrow" (mapInArrow) vs
engine="pandas" (mapInPandas) on the flagship reshape stage.

Rationale: mapInPandas converts EVERY column of the batch to pandas
object arrays and back — for a transcripts row that means conv_id,
role, tool and the JSON payload all materialize as Python strings
twice per direction. mapInArrow leaves passthrough columns as
untouched Arrow buffers; only the processed JSON column is
materialized (once in, once out). Same jolt kernel both sides.

Protocol: one warm-up per engine, then R interleaved (arrow, pandas)
timed pairs on identical input (synthetic transcripts, N turns,
local[C]); medians reported. Writes BENCH/reshape_engine_ab.json.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "BENCH" / "reshape_engine_ab.json"

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

code = f"""
import sys, time, json
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.sources.transcripts import read_transcripts

spark = build_session(app_name="reshape-ab", master="local[{CORES}]",
                      shuffle_partitions={CORES})
turns, _ = read_transcripts(spark, n_turns={N_TURNS})
turns = turns.localCheckpoint()  # pin input; time ONLY the reshape stage
spec = reference_bench_spec()

def run(engine):
    t0 = time.perf_counter()
    n = jolt_reshape(turns, spec, columns="text", engine=engine).count()
    return time.perf_counter() - t0, n

run("arrow"); run("pandas")  # warm both code paths
res = {{"arrow": [], "pandas": []}}
for i in range({RUNS}):
    for eng in ("arrow", "pandas"):
        dt, n = run(eng)
        res[eng].append(dt)
print("RES", json.dumps(res))
spark.stop()
"""

t0 = time.time()
proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=str(REPO))
res = None
for line in proc.stdout.splitlines():
    if line.startswith("RES"):
        res = json.loads(line[4:])
if res is None:
    print(proc.stdout[-3000:])
    print(proc.stderr[-3000:])
    raise SystemExit("no RES line")

med = {k: statistics.median(v) for k, v in res.items()}
out = {
    "n_turns": N_TURNS,
    "cores": CORES,
    "runs_each": RUNS,
    "times": res,
    "median_s": {k: round(v, 3) for k, v in med.items()},
    "arrow_speedup_vs_pandas": round(med["pandas"] / med["arrow"], 3),
    "turns_per_s": {k: round(N_TURNS / v) for k, v in med.items()},
    "wall_s": round(time.time() - t0, 1),
}
OUT.write_text(json.dumps(out, indent=1))
print(json.dumps(out, indent=1))
