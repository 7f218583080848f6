"""spark-submit entry point for the transcript feature pipeline.

  spark-submit --py-files fluvio_jolt_spark.zip \
      fluvio_jolt_spark/jobs/run_features.py \
      --turns <parquet path or synthetic:N> --snapshots <path|-> \
      --out /path/out --buckets 64 [--resume]

Runs reshape + salted window features + as-of join with per-bucket
checkpoints/lineage (plans.checkpoint); a second invocation with
--resume skips committed buckets.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# allow spark-submit without --py-files when run from the repo root
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--turns", required=True, help="parquet path or synthetic:<n_turns>")
    p.add_argument("--snapshots", default="-", help="parquet path, '-' for none/synthetic")
    p.add_argument("--out", required=True)
    p.add_argument("--spec", default=None, help="jolt spec JSON file (default: bench spec)")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--chunk-rows", type=int, default=8192)
    p.add_argument(
        "--reindex-turns",
        action="store_true",
        help="re-derive a dense 0-based turn_idx per conv_id (row_number over "
        "(turn_idx, ts)) before the salted feature stage. REQUIRED for "
        "external parquet whose turn_idx has gaps: the salted chunking "
        "assumes dense contiguous turn_idx (see skew.with_turn_features_salted) "
        "and silently misplaces chunk-seam carry rows otherwise. Synthetic "
        "inputs are dense by construction; one extra window pass when on.",
    )
    p.add_argument("--session-gap-s", type=int, default=1800)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    from fluvio_jolt_spark.operators.asof import asof_join
    from fluvio_jolt_spark.operators.reshape import jolt_reshape, reference_bench_spec
    from fluvio_jolt_spark.operators.skew import with_turn_features_salted
    from fluvio_jolt_spark.plans.checkpoint import BUCKET_COL, CheckpointedRun
    from fluvio_jolt_spark.plans.session import build_session
    from fluvio_jolt_spark.sources.transcripts import materialize

    spark = build_session(app_name="fjs-run-features")

    if args.turns.startswith("synthetic:"):
        n = int(args.turns.split(":", 1)[1])
        tpath, spath = materialize(n)
        turns = spark.read.parquet(str(tpath))
        snaps = spark.read.parquet(str(spath))
    else:
        turns = spark.read.parquet(args.turns)
        snaps = spark.read.parquet(args.snapshots) if args.snapshots != "-" else None

    if args.reindex_turns:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
        turns = turns.withColumn("turn_idx", F.row_number().over(w) - 1)

    spec_json = (
        Path(args.spec).read_text() if args.spec else reference_bench_spec()
    )

    def pipeline(df):
        feats = with_turn_features_salted(
            df.select("conv_id", "turn_idx", "role", "tool", "ts", BUCKET_COL),
            chunk_rows=args.chunk_rows,
            session_gap_s=args.session_gap_s,
        )
        if snaps is not None:
            feats = asof_join(feats, snaps, on="ts", right_on="snap_ts", by="conv_id")
        payload = jolt_reshape(
            df.select("conv_id", "turn_idx", "text"), spec_json, columns="text"
        )
        return feats.join(payload, ["conv_id", "turn_idx"])

    lineage = {
        "job": "run_features",
        "turns": args.turns,
        "snapshots": args.snapshots,
        "spec_sha": __import__("hashlib").sha256(spec_json.encode()).hexdigest()[:16],
        "chunk_rows": args.chunk_rows,
        "session_gap_s": args.session_gap_s,
    }
    run = CheckpointedRun(args.out, n_buckets=args.buckets, lineage=lineage)
    if not args.resume and run.completed_buckets():
        print("output has committed buckets; pass --resume to continue", file=sys.stderr)
        return 2

    t0 = time.time()
    report = run.run(turns, pipeline)
    report["elapsed_s"] = round(time.time() - t0, 3)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
