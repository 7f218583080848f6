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


def test_ppm_roundtrip_and_header_forms():
    """encode->decode is lossless; decoder handles comment lines and
    multi-whitespace headers (netpbm spec forms)."""
    import numpy as np

    from fluvio_jolt_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    # comment + extra whitespace in header
    body = arr.tobytes()
    weird = b"P6\n# a comment\n 17\t13\n# another\n255\n" + body
    assert (decode_ppm(weird) == arr).all()


def test_bmp_roundtrip_with_row_padding():
    """Odd width (17*3=51 bytes/row -> 1 pad byte) exercises the 4-byte
    row alignment; bottom-up BGR order round-trips exactly."""
    import numpy as np

    from fluvio_jolt_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(6)
    for w in (17, 18, 19, 20):
        arr = rng.randint(0, 256, size=(7, w, 3), dtype=np.uint8)
        payload = encode_bmp(arr)
        assert len(payload) > 54
        assert (decode_bmp(payload) == arr).all()


def test_real_codec_features_distributed(spark):
    """The distributed mapInPandas feature stage over REAL encoded
    PPM/BMP byte streams matches the local pure-function reference —
    the real-codec analogue of the stub-codec golden test."""
    from fluvio_jolt_spark.operators.multimodal import (
        extract_image_features,
        image_feature_row,
        synth_ppm_bmp_media,
        synth_ppm_bmp_media_rows,
    )

    media = synth_ppm_bmp_media(spark, n=24).repartition(6)
    got = extract_image_features(media).toPandas().sort_values("media_id")
    cols = synth_ppm_bmp_media_rows(n=24)
    want = [
        image_feature_row(mid, p)
        for mid, p in zip(cols["media_id"], cols["payload"])
    ]
    assert len(got) == len(want) == 24
    for row, (mid, r, g, b, s, sig) in zip(got.itertuples(index=False), want):
        assert row.media_id == mid and row.sig64 == sig
        assert abs(row.mean_r - r) < 1e-9 and abs(row.std_gray - s) < 1e-9


def test_decode_image_dispatch():
    """Magic-byte dispatch: PPM/BMP decode natively; unknown compressed
    formats raise the documented NotImplementedError without PIL."""
    import numpy as np
    import pytest as _pytest

    from fluvio_jolt_spark.operators.multimodal import decode_image, encode_bmp, encode_ppm

    arr = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    assert (decode_image(encode_bmp(arr)) == arr).all()
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with _pytest.raises(NotImplementedError, match="PPM"):
            decode_image(b"\x89PNG\r\n\x1a\nfakefakefake")


def test_wav_roundtrip_and_chunk_walk():
    """RIFF/WAVE PCM-16 codec: encode->decode is identity (mono and
    stereo), unknown chunks are skipped with word alignment, and
    non-PCM formats raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from fluvio_jolt_spark.operators.multimodal import decode_wav, encode_wav

    mono = (np.arange(100, dtype=np.int16) * 300 - 15000)[:, None]
    out, sr = decode_wav(encode_wav(mono, 8000))
    assert sr == 8000 and (out == mono).all()

    stereo = np.stack([mono[:, 0], -mono[:, 0]], axis=1).astype(np.int16)
    out, sr = decode_wav(encode_wav(stereo, 16000))
    assert sr == 16000 and out.shape == (100, 2) and (out == stereo).all()

    # splice an odd-sized unknown chunk between fmt and data: a
    # spec-compliant reader skips it (word-aligned) and still decodes
    raw = encode_wav(mono, 8000)
    fmt_end = 12 + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # pad byte
    spliced = raw[:fmt_end] + junk + raw[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, sr = decode_wav(spliced)
    assert (out == mono).all()

    bad = bytearray(encode_wav(mono, 8000))
    bad[20] = 3  # audio_format = IEEE float
    with _pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(bad))
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_audio_features_distributed(spark):
    """The distributed WAV decode+DSP stage equals the local pure
    function over the same real byte streams (the audio analogue of the
    real-codec image test)."""
    from fluvio_jolt_spark.operators.multimodal import (
        audio_feature_row,
        extract_audio_features,
        synth_wav_media,
        synth_wav_media_rows,
    )

    got = (
        extract_audio_features(synth_wav_media(spark, n=24))
        .orderBy("media_id")
        .toPandas()
    )
    cols = synth_wav_media_rows(n=24)
    want = [
        audio_feature_row(mid, p)
        for mid, p in zip(cols["media_id"], cols["payload"])
    ]
    assert len(got) == len(want) == 24
    for row, (mid, sr, ch, ns, rms, peak, zc) in zip(
        got.itertuples(index=False), want
    ):
        assert (row.media_id, row.sample_rate, row.n_channels, row.n_samples) == (
            mid, sr, ch, ns,
        )
        assert abs(row.rms - rms) < 1e-12 and abs(row.zero_cross_rate - zc) < 1e-12
    # the synth table exercises both channel counts and sample rates
    assert set(got.n_channels) == {1, 2} and set(got.sample_rate) == {8000, 16000}
