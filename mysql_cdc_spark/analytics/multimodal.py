"""Multimodal (binary-payload) column plumbing.

Treats image/audio/video as opaque ``binary`` columns with typed metadata.
The container has no image/audio libraries, so the *decode* step is a
deterministic fake behind ``decode_payload_stub`` (clearly marked; swap in
PIL/ffmpeg at deploy time) — but everything Spark-side is real and tested:
schema, Arrow batch shape, ``mapInPandas`` plumbing, partitioning, and the
metadata extraction path.

The synthetic payloads derive deterministically from ``documents.text``
(utf-8 bytes + a fake RIFF-style header), so the oracle can verify the
metadata path end-to-end in SQL.

- multimodal_meta      binary metadata extraction (pure built-ins + oracle)
- multimodal_features  mapInPandas feature extraction over Arrow batches
                       (deterministic fake decode; rows-only check)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

# fake 8-byte header: magic 'SYN0' + 4 reserved bytes
_MAGIC = b"SYN0\x00\x00\x00\x00"


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the deterministic binary payload column (header ∥ utf-8 text).

    In production this column comes straight off parquet/Iceberg as
    ``binary`` — the rest of the pipeline is unchanged.
    """
    return docs.withColumn(
        "payload",
        F.concat(
            F.lit(_MAGIC),
            F.encode(F.col("text"), "utf-8"),
        ),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary: byte length, header magic check,
    body checksum (md5 of the payload tail). All JVM built-ins — the
    pattern for 'validate 10^9 blobs without decoding them'."""
    docs = load(spark, sf_dir, "documents")
    return (
        with_payload(docs)
        .selectExpr(
            "doc_id",
            "length(payload) as n_bytes",
            "cast(substring(payload, 1, 4) as string) as magic",
            "md5(substring(payload, 9, length(payload) - 8)) as body_md5",
            "length(payload) - 8 as body_bytes",
        )
    )


META_SQL = """
SELECT doc_id,
       8 + octet_length(encode(text)) AS n_bytes,
       'SYN0' AS magic,
       md5(text) AS body_md5,
       octet_length(encode(text)) AS body_bytes
FROM documents
"""


# ---------------------------------------------------------------------------
# decode stub + Arrow-batched feature extraction
# ---------------------------------------------------------------------------

def decode_payload_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'image' from the payload bytes.

    Real deployment replaces this with PIL/libav decode. The fake reshapes
    the body bytes into a (h, w) uint8 array (h = 16, w = ceil(len/16)) so
    downstream feature code exercises realistic shapes.
    """
    body = payload[len(_MAGIC):]
    if not body:
        return np.zeros((16, 1), dtype=np.uint8)
    arr = np.frombuffer(body, dtype=np.uint8)
    w = (len(arr) + 15) // 16
    padded = np.zeros(16 * w, dtype=np.uint8)
    padded[: len(arr)] = arr
    return padded.reshape(16, w)


FEATURE_SCHEMA = (
    "doc_id long, height int, width int, mean_intensity double, "
    "p99_intensity double, frame_samples array<double>"
)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of (doc_id, payload) in, one
    batch of per-doc features out. Vectorized inside the batch; 'frame
    sampling' takes every 4th column mean (the video-frame analog)."""
    for pdf in batches:
        out = {
            "doc_id": [], "height": [], "width": [],
            "mean_intensity": [], "p99_intensity": [], "frame_samples": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_payload_stub(bytes(payload))
            out["doc_id"].append(doc_id)
            out["height"].append(img.shape[0])
            out["width"].append(img.shape[1])
            out["mean_intensity"].append(round(float(img.mean()), 4))
            out["p99_intensity"].append(round(float(np.percentile(img, 99)), 4))
            out["frame_samples"].append(
                [round(float(img[:, c].mean()), 4) for c in range(0, img.shape[1], 4)][:8]
            )
        yield pd.DataFrame(out)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Plumbing notes for scale: payloads stay in Arrow buffers end-to-end
    (binary column → Arrow → numpy view, no per-row Python on the
    DataFrame); repartition count controls decode parallelism since blob
    decode is CPU-bound, not scan-bound."""
    docs = load(spark, sf_dir, "documents")
    payloads = with_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
}

ORACLES = {
    "multimodal_meta": META_SQL,
    # multimodal_features: deterministic but not SQL-expressible (stubbed
    # binary decode in a pandas UDF) → rows-only check by design.
}
