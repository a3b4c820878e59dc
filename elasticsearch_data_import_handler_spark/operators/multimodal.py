"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages.  The codec libraries (Pillow/ffmpeg/torchaudio) are
NOT in this container, so the *decode kernels* are stubbed — a deterministic
fake when ``deterministic_stub=True`` (so the distributed plumbing — schema,
partitioning, batch shape, UDF signatures — is fully testable), otherwise
``NotImplementedError`` naming the library a real deployment plugs in.

The Spark side is real: batch iteration, zero-copy Arrow binary transfer,
bounded batch sizes (`spark.sql.execution.arrow.maxRecordsPerBatch`), and
partition-count guidance for large blobs (repartition so a partition's blob
bytes stay ≤ ~256 MB; blobs never shuffle except in that explicit
repartition).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests (binary payloads of
    varying size + plausible metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(100, 5000))
        payload = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        meta = (int(rng.integers(16, 1024)), int(rng.integers(16, 1024)),
                44100 if kind == "audio" else 0,
                int(rng.integers(0, 60_000)) if kind != "image" else 0,
                {"image": "png", "audio": "pcm16", "video": "h264"}[kind])
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, deterministic_stub: bool) -> np.ndarray:
    if not deterministic_stub:
        raise NotImplementedError(
            f"real {kind} decode requires Pillow/ffmpeg — not in this container; "
            "plug the codec into operators/multimodal.py::_decode_stub"
        )
    # deterministic fake: feature = first 16 bytes folded to float32 in [0,1)
    a = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (a.reshape(16, 4).sum(axis=1) % 251).astype(np.float32) / 251.0


def extract_features(media: DataFrame, deterministic_stub: bool = True) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature array<float>) via mapInPandas.

    The feature kernel is the stub; the batch plumbing (Arrow binary in,
    vectorized numpy per batch, bounded memory) is the real deliverable."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, k, deterministic_stub)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "feature": feats,
            })

    return media.mapInPandas(
        _batches,
        schema="media_id bigint, kind string, n_bytes bigint, feature array<float>",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  deterministic_stub: bool = True) -> DataFrame:
    """video rows → one row per sampled frame timestamp (plumbing for frame
    extraction; the actual frame decode is the stub)."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    frames = vids.select(
        "media_id", F.explode(ts).alias("frame_ms"), "payload"
    )
    if not deterministic_stub:
        raise NotImplementedError("frame decode requires ffmpeg")
    return frames.select(
        "media_id", "frame_ms",
        F.xxhash64(F.col("payload"), F.col("frame_ms")).alias("frame_fingerprint"),
    )
