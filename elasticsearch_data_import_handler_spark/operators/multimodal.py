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

The synthetic media generator is *closed-form deterministic* (payload bytes
= md5 chain, metadata = modular arithmetic on the row id), built entirely
from JVM expressions — so the deterministic stub's feature math is
reproducible in ANY engine with an md5 function, which is what lets the
driver's DuckDB oracle hash-verify this pipeline end-to-end.
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

# Closed-form synthetic-media parameters (mirrored literally in the DuckDB
# oracle in __spark_entry__.py — change them together).
PAYLOAD_DIGESTS = 16          # payload = first n_bytes of 16 chained md5s
N_BYTES = "64 + (media_id * 37) % 192"          # ∈ [64, 255]; ≥64 → no padding
DURATION_MS = "(media_id * 997) % 60000"


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payloads + plausible metadata).

    payload(i) = first n_bytes(i) bytes of unhex(md5(i||'|0') || … ||
    md5(i||'|15')); every field is a closed-form function of the row id, so
    both the Spark pipeline and a SQL oracle can regenerate it bit-exactly.
    """
    hex_chain = F.concat(*[
        F.md5(F.concat(F.col("media_id").cast("string"), F.lit(f"|{r}")))
        for r in range(PAYLOAD_DIGESTS)
    ])
    kind = (F.when(F.col("media_id") % 3 == 0, "image")
            .when(F.col("media_id") % 3 == 1, "audio").otherwise("video"))
    return (
        spark.range(n).select(F.col("id").alias("media_id"))
        .withColumn("kind", kind)
        .withColumn("n_bytes", F.expr(N_BYTES))
        .withColumn("blob", F.unhex(hex_chain))
        .withColumn("payload", F.expr("substring(blob, 1, n_bytes)"))
        .withColumn("meta", F.struct(
            (F.lit(16) + (F.col("media_id") * 13) % 1008).cast("int").alias("width"),
            (F.lit(16) + (F.col("media_id") * 29) % 1008).cast("int").alias("height"),
            F.when(F.col("kind") == "audio", 44100).otherwise(0)
            .cast("int").alias("sample_rate"),
            F.when(F.col("kind") == "image", 0)
            .otherwise(F.expr(DURATION_MS)).cast("int").alias("duration_ms"),
            F.when(F.col("kind") == "image", "png")
            .when(F.col("kind") == "audio", "pcm16")
            .otherwise("h264").alias("codec"),
        ))
        .select("media_id", "kind", "payload", "meta")
    )


def _decode_stub(payload: bytes, kind: str, deterministic_stub: bool) -> np.ndarray:
    if not deterministic_stub:
        raise NotImplementedError(
            f"real {kind} decode requires Pillow/ffmpeg — not in this container; "
            "plug the codec into operators/multimodal.py::_decode_stub"
        )
    # deterministic fake: 16 features, each = (sum of 4 consecutive payload
    # bytes) mod 251, scaled to [0,1) in float64 (exact in any engine)
    a = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (a.reshape(16, 4).sum(axis=1, dtype=np.int64) % 251) / 251.0


def extract_features(media: DataFrame, deterministic_stub: bool = True) -> DataFrame:
    """media → (media_id, kind, n_bytes, feature array<double>) via mapInPandas.

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
        schema="media_id bigint, kind string, n_bytes bigint, feature array<double>",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  deterministic_stub: bool = True) -> DataFrame:
    """video rows → one row per sampled frame timestamp (plumbing for frame
    extraction; the actual frame decode is the stub).

    The fingerprint is md5(hex(payload) || ':' || frame_ms) — pure JVM and
    reproducible in the SQL oracle (xxhash64 was not)."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    frames = vids.select(
        "media_id", F.explode(ts).alias("frame_ms"), "payload"
    )
    if not deterministic_stub:
        raise NotImplementedError("frame decode requires ffmpeg")
    return frames.select(
        "media_id", F.col("frame_ms").cast("long").alias("frame_ms"),
        F.md5(F.concat(F.hex("payload"), F.lit(":"),
                       F.col("frame_ms").cast("string"))).alias("frame_fingerprint"),
    )
