"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels. The image/audio codec libraries are NOT available
in this environment, so the decode step is STUBBED: ``decoder="fake"``
produces deterministic synthetic features from the payload bytes (so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested), and ``decoder="pillow"``/``"librosa"`` raise
NotImplementedError until the libraries exist on the cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    base = spark.range(0, n)

    def gen(batches):
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
                kind = kinds[i % 3]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "payload": payload,
                        "meta": {
                            "width": 64 + (i % 8) * 32 if kind != "audio" else None,
                            "height": 64 + (i % 5) * 32 if kind != "audio" else None,
                            "duration_ms": 1000 + i % 9000 if kind != "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: 16 floats from sha256."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0)


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract as an Arrow-batched kernel. Only the 'fake'
    decoder works in this sandbox; real decoders raise until their libs are
    installed cluster-side."""
    if decoder not in ("fake", "pillow", "librosa"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def kernel(batches):
        for pdf in batches:
            if decoder != "fake":
                raise NotImplementedError(
                    f"decoder {decoder!r} requires media libraries not present in this environment"
                )
            feats, shas, nb = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                feats.append(_fake_decode(b).tolist())
                shas.append(hashlib.sha256(b).hexdigest())
                nb.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": shas,
                    "feature": feats,
                    "n_bytes": nb,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    the decode of each frame is the stubbed step; the distribution plan
    (explode by timestamp, repartition by media) is real."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ts_ms")).repartition("media_id")
