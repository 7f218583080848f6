"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED behind import-guards (the
image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError unless PIL is importable, and tests use the
deterministic fake codec below. Everything Spark-side — schemas,
batching, UDF signatures, partition sizing — is real and tested, so
swapping in a real codec is a one-function change.

Scale notes: binary payloads make rows big; the operators here
repartition by byte-size budget (``repartition_by_bytes``) rather than
row count, and metadata-only operations prune the binary column at scan
(column pruning is checked in tests).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synth_media_rows(n: int = 64, seed: int = 42) -> dict:
    """Pure-Python generation of the deterministic fake media table —
    shared by the Spark table builder AND the driver oracle (which
    precomputes expected feature values locally, so the distributed
    mapInPandas path is checked against a single-process reference)."""
    kinds = ["image", "audio", "video"]
    cols: dict = {k: [] for k in
                  ("media_id", "kind", "mime", "width", "height", "duration_ms", "payload")}
    for i in range(n):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
        kind = kinds[i % 3]
        w, hgt = 16 + (i % 8) * 16, 16 + (i % 5) * 16
        dur = 1000 + (i % 7) * 500
        header = struct.pack("<4sHHI", kind[:4].encode().ljust(4), w, hgt, dur)
        body = (h * ((w * hgt * 3) // 8 + 1))[: w * hgt * 3]
        cols["media_id"].append(i)
        cols["kind"].append(kind)
        cols["mime"].append("image/png" if kind == "image" else "application/octet-stream")
        cols["width"].append(w)
        cols["height"].append(hgt)
        cols["duration_ms"].append(dur if kind != "image" else None)
        cols["payload"].append(header + body)
    return cols


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes with a 16-byte header encoding (kind, width, height). Built
    through Arrow — py4j row serialization of binary payloads is
    ~10× slower."""
    cols = synth_media_rows(n, seed)
    # Arrow table, not pandas: pandas coerces a None-bearing int column
    # to float64/NaN, which createDataFrame rejects for IntegerType.
    # Arrow keeps it a nullable int32 end-to-end.
    import pyarrow as pa

    table = pa.table(
        {
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "kind": pa.array(cols["kind"], pa.string()),
            "mime": pa.array(cols["mime"], pa.string()),
            "width": pa.array(cols["width"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "duration_ms": pa.array(cols["duration_ms"], pa.int32()),
            "payload": pa.array(cols["payload"], pa.binary()),
        }
    )
    return spark.createDataFrame(table, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder — unavailable in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this environment; "
            "use fake_decode_image (deterministic stand-in) or install pillow"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(BytesIO(payload)) here")


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: reinterpret body bytes as HxWx3 uint8
    using the synthetic header."""
    _kind, w, h, _dur = struct.unpack("<4sHHI", payload[:12])
    body = np.frombuffer(payload[12:12 + w * h * 3], dtype=np.uint8)
    return body.reshape(h, w, 3)


def image_feature_row(media_id: int, payload: bytes) -> tuple:
    """Per-image features from the (fake-)decoded array — pure function
    shared by the distributed mapInPandas stage and the local oracle
    reference: (media_id, mean_r, mean_g, mean_b, std_gray, sig64)."""
    arr = fake_decode_image(payload)
    gray = arr.astype(np.float64).mean(axis=2)
    # 8x8 average-hash signature
    ah = gray[: (gray.shape[0] // 8) * 8, : (gray.shape[1] // 8) * 8]
    ah = ah.reshape(8, ah.shape[0] // 8, 8, ah.shape[1] // 8).mean((1, 3))
    bits = (ah > ah.mean()).flatten()
    sig = 0
    for b in bits:
        sig = (sig << 1) | int(b)
    sig -= 1 << 64 if sig >= 1 << 63 else 0
    return (
        int(media_id),
        float(arr[:, :, 0].mean()),
        float(arr[:, :, 1].mean()),
        float(arr[:, :, 2].mean()),
        float(gray.std()),
        int(sig),
    )


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", batch_budget_bytes: int = 64 << 20
) -> DataFrame:
    """Per-image features (mean/std per channel + phash-like signature)
    via mapInPandas. Batch shape: the iterator yields per-Arrow-batch
    frames; heavy decode stays inside numpy."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("mean_r", T.DoubleType(), True),
            T.StructField("mean_g", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
            T.StructField("std_gray", T.DoubleType(), True),
            T.StructField("sig64", T.LongType(), True),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                image_feature_row(int(mid), bytes(payload))
                for mid, payload in zip(pdf["media_id"], pdf[payload_col])
            ]
            yield pd.DataFrame(
                recs, columns=["media_id", "mean_r", "mean_g", "mean_b", "std_gray", "sig64"]
            )

    images = df.filter(F.col("kind") == "image").select("media_id", payload_col)
    return images.mapInPandas(feats, schema=out_schema)


def sample_video_frames(
    df: DataFrame, every_ms: int = 500, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame index and byte-offset (decode stubbed — offsets computed from
    metadata only, so the binary column is NOT read: column pruning)."""
    vids = df.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    idx = F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))
    return vids.select(
        "media_id",
        F.explode(idx).alias("frame_no"),
        (F.col("frame_no") * every_ms).alias("frame_ts_ms"),
    )


def repartition_by_bytes(
    df: DataFrame, payload_col: str = "payload", target_bytes: int = 256 << 20
) -> DataFrame:
    """Size partitions by payload bytes, not rows — binary media rows
    vary by orders of magnitude. One pass to estimate mean row size,
    then repartition to ceil(total/target)."""
    stats = df.select(
        F.count("*").alias("n"), F.avg(F.length(payload_col)).alias("avg_bytes")
    ).collect()[0]
    if not stats.n:
        return df
    total = stats.n * (stats.avg_bytes or 1)
    parts = max(1, int(total // target_bytes) + 1)
    return df.repartition(parts)
