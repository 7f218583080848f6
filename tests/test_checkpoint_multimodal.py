"""Checkpoint/resume semantics + multimodal plumbing."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from fluvio_jolt_spark.operators.multimodal import (
    extract_image_features,
    fake_decode_image,
    repartition_by_bytes,
    sample_video_frames,
    synth_media,
)
from fluvio_jolt_spark.plans.checkpoint import (
    BUCKET_COL,
    CheckpointedRun,
    reshape_error_counters,
    with_bucket,
)


def _pipeline(df):
    return df.withColumn("doubled", F.col("turn_idx") * 2)


def test_checkpoint_first_run_commits_all(spark, transcripts_small, tmp_path):
    df, _ = transcripts_small
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=4, lineage={"job": "t"})
    report = run.run(df, _pipeline)
    assert report["ran_buckets"] == [0, 1, 2, 3]
    assert report["rows_in"] == df.count()
    assert report["rows_out"] == df.count()
    assert run.completed_buckets() == {0, 1, 2, 3}


def test_checkpoint_resume_skips_completed(spark, transcripts_small, tmp_path):
    df, _ = transcripts_small
    out = str(tmp_path / "out")
    run = CheckpointedRun(out, n_buckets=4)
    run.run(df, _pipeline)

    # sabotage one manifest → that bucket must rerun, others skip
    victim = Path(out) / "_manifest" / "bucket_2.json"
    victim.unlink()
    run2 = CheckpointedRun(out, n_buckets=4)
    report = run2.run(df, _pipeline)
    assert report["skipped_buckets"] == [0, 1, 3]
    assert report["ran_buckets"] == [2]

    # full output present and correct after resume
    data = spark.read.parquet(out + "/data")
    assert data.count() == df.count()
    assert run2.run(df, _pipeline)["ran_buckets"] == []


def test_torn_manifest_not_counted(spark, transcripts_small, tmp_path):
    df, _ = transcripts_small
    out = str(tmp_path / "out")
    run = CheckpointedRun(out, n_buckets=2)
    run.run(df, _pipeline)
    (Path(out) / "_manifest" / "bucket_0.json").write_text("{not json")
    assert CheckpointedRun(out, n_buckets=2).completed_buckets() == {1}


def test_lineage_recorded(spark, transcripts_small, tmp_path):
    df, _ = transcripts_small
    out = str(tmp_path / "out")
    lineage = {"input": "/root/testdata", "spec_hash": "abc123", "version": "0.1.0"}
    CheckpointedRun(out, n_buckets=2, lineage=lineage).run(df, _pipeline)
    doc = json.loads((Path(out) / "_manifest" / "bucket_0.json").read_text())
    assert doc["lineage"] == lineage
    assert doc["rows_in"] > 0


def test_error_counters(spark):
    from fluvio_jolt_spark.operators.reshape import jolt_reshape

    spec = json.dumps([{"operation": "shift", "spec": {"a": {"@(1,missing)": "o"}}}])
    df = spark.createDataFrame(
        [('{"a":{"b":1}}',), ('{"ok":1}',), ("bad",)], "text string"
    )
    counters = reshape_error_counters(spark, jolt_reshape(df, spec))
    assert counters == {"rows": 3, "errors": 2, "error_kinds": 2}


# ---- multimodal ----


def test_fake_decode_roundtrip(spark):
    media = synth_media(spark, n=6)
    row = media.filter(F.col("kind") == "image").first()
    arr = fake_decode_image(bytes(row.payload))
    assert arr.shape == (row.height, row.width, 3)


def test_image_features(spark):
    media = synth_media(spark, n=12)
    feats = extract_image_features(media).toPandas()
    assert len(feats) == media.filter("kind = 'image'").count()
    assert feats.mean_r.between(0, 255).all()
    # deterministic: same input → same signature
    feats2 = extract_image_features(media).toPandas()
    assert (feats.sort_values("media_id").sig64.to_numpy()
            == feats2.sort_values("media_id").sig64.to_numpy()).all()


def test_video_frame_sampling_prunes_payload(spark, tmp_path):
    media = synth_media(spark, n=12)
    path = str(tmp_path / "media")
    media.write.parquet(path)
    frames = sample_video_frames(spark.read.parquet(path), every_ms=500)
    pdf = frames.toPandas()
    assert (pdf.frame_ts_ms % 500 == 0).all()
    # column pruning: the parquet ReadSchema must not include the binary payload
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0], plan


def test_repartition_by_bytes(spark):
    media = synth_media(spark, n=32)
    out = repartition_by_bytes(media, target_bytes=1 << 12)  # tiny target → many parts
    assert out.rdd.getNumPartitions() > 1


def test_bucket_stability(spark, transcripts_small):
    df, _ = transcripts_small
    a = with_bucket(df, n_buckets=8).select("conv_id", BUCKET_COL).distinct()
    counts = a.groupBy("conv_id").count().agg(F.max("count")).collect()[0][0]
    assert counts == 1, "bucket must be a pure function of conv_id"
