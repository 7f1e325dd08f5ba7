"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Graft requirement: image/audio/video as ``binary`` columns with typed
metadata, processed through ``mapInPandas`` in Arrow batches.  The
container has no image/audio codecs, so the decode step is STUBBED —
``decode_stub`` parses a deterministic fake header (and the real-codec
hook raises NotImplementedError) — but the Spark-side plumbing (schema,
batch iteration, partitioning, UDF signatures) is real and tested.

Fake payload format (deterministic, produced by synthesize_media):
    bytes 0-3   magic  b'FAKE'
    byte  4     kind   (0=image, 1=audio, 2=video)
    bytes 5-8   width / sample-rate   (uint32 BE)
    bytes 9-12  height / n-samples    (uint32 BE)
    bytes 13..  payload (xxhash-seeded deterministic noise)
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

KINDS = ["image", "audio", "video"]
_MAGIC = b"FAKE"


def synthesize_media(spark: SparkSession, n: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (driver-side header packing; payload
    bytes derived from sha256 of (seed, id) — no RNG)."""
    rows = []
    for i in range(n):
        kind_i = i % 3
        w = 16 + (i * 7) % 240
        h = 16 + (i * 13) % 240
        body = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        payload = _MAGIC + struct.pack(">BII", kind_i, w, h) + body
        rows.append((i, KINDS[kind_i], payload,
                      (f"src{i % 10}", f"{KINDS[kind_i]}/fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "width int, height int, valid boolean"
)


def decode_stub(payload: bytes) -> tuple[int, int, bool]:
    """Parse the fake header.  Real codec integration point: replace this
    with PIL/librosa/pyav decode — those libs are absent in this
    container, so anything non-FAKE raises NotImplementedError."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decode requires codec libraries not present here"
        )
    _, w, h = struct.unpack(">BII", payload[4:13])
    return w, h, True


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per-Arrow-batch iteration, binary
    payloads never leave the executor, output is narrow typed columns.

    At 100 TB: payloads dominate size, so this stage projects them away
    as early as possible; downstream ops see only (id, features).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            dims = pdf["payload"].map(_safe_decode)
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            out["valid"] = dims.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def _safe_decode(payload: bytes) -> tuple[int, int, bool]:
    try:
        return decode_stub(payload)
    except Exception:
        return (0, 0, False)  # quarantine semantics — row kept, flagged


def resize_stub(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """'Resize' = recompute header with clamped dims (the real pixel
    resample is behind the codec stub).  Demonstrates binary-in/binary-out
    mapInPandas with bounded Arrow batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                try:
                    w, h, _ = decode_stub(b)
                except Exception:
                    return b
                scale = max(w, h) / max_dim if max(w, h) > max_dim else 1.0
                nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                # preserve the original kind byte — resize must not
                # relabel audio/video payloads as image
                return _MAGIC + struct.pack(">BII", b[4], nw, nh) + b[13:]
            pdf = pdf.assign(payload=pdf["payload"].map(shrink))
            yield pdf

    return media.mapInPandas(op, schema=media.schema)


def frame_sample_stub(media: DataFrame, every_n: int = 4) -> DataFrame:
    """'Frame sampling' for video rows: emit one row per sampled frame
    index (UDTF shape: 1 row in → N rows out via mapInPandas)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                try:
                    w, h, _ = decode_stub(payload)
                except Exception:
                    continue
                n_frames = max(1, (w * h) // 4096)
                for f in range(0, n_frames, every_n):
                    rows.append((mid, f, hashlib.sha256(
                        payload[13:] + struct.pack(">I", f)
                    ).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_hash"])

    return media.mapInPandas(op, schema="media_id long, frame_idx int, frame_hash string")


def q_multimodal_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-surface window into the multimodal plumbing (rows-only —
    input is the deterministic synthetic media table, not an sf table):
    synthesize → mapInPandas feature extraction → per-kind census.
    Byte-level behavior is pinned by tests/test_pipeline.py."""
    media = synthesize_media(spark, n=300, seed=42)
    feats = extract_media_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.sum(F.when(F.col("valid"), 0).otherwise(1)).alias("n_invalid"),
        )
        .orderBy("kind")
    )


QUERIES = {
    "multimodal_census": q_multimodal_census,
}
