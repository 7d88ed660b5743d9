"""Multimodal (binary-payload) column plumbing.

Treats image/audio/video as opaque ``binary`` columns with typed metadata.

Since round 5 the decode step is REAL for the formats the standard
library can handle (analytics/codecs.py): ``multimodal_png_features``
round-trips genuine PNGs (zlib scanlines + filter reconstruction) and
``multimodal_wav_stats`` genuine RIFF/PCM WAVs — both built
deterministically from ``documents.text`` so their pixel/sample content
stays SQL-expressible and the DuckDB oracles hold exactly. JPEG /
interlaced PNG / video still need external codecs at deploy time, so
the original deterministic fake (``decode_payload_stub``, clearly
marked) remains for the header-only plumbing queries.

- multimodal_meta          binary metadata extraction (built-ins + oracle)
- multimodal_features      mapInPandas feature extraction over Arrow
                           batches (deterministic fake decode)
- multimodal_png_features  REAL PNG encode→decode→features (same exact
                           feature contract, same oracle)
- multimodal_wav_stats     REAL WAV encode→decode→sample stats
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
    "p99_scaled long, frame_samples string"
)


def exact_image_features(img: np.ndarray) -> tuple[float, int, list[int]]:
    """Reference (per-image) feature definitions — the contract the batch
    kernel reproduces. All outputs are exactly representable so the Spark
    kernel and the SQL oracle agree bit-for-bit:

    - ``mean_intensity``: sum / (16·w), one exact IEEE double division
    - ``p99_scaled``: 99th percentile × 100 with linear interpolation on
      the exact rational index 99·(N−1)/100 (integer arithmetic, no float
      0.99 rounding like np.percentile's)
    - ``frame_samples``: every-4th-column mean × 10000 (= column sum × 625
      since columns have 16 entries), first 8 samples, as exact ints
    """
    h, w = img.shape
    flat = np.sort(img.reshape(-1).astype(np.int64))
    n = h * w
    idx = 99 * (n - 1)
    f, rem = idx // 100, idx % 100
    c = min(f + 1, n - 1)
    p99_scaled = int(flat[f] * 100 + (flat[c] - flat[f]) * rem)
    mean = float(img.astype(np.int64).sum() / n)
    samples = [int(img[:, col].astype(np.int64).sum() * 625) for col in range(0, w, 4)][:8]
    return mean, p99_scaled, samples


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch of (doc_id, payload) in, one
    batch of per-doc features out — numpy over the whole batch (offsets,
    bincount segment/column sums, one global sort for percentiles), no
    per-row Python on the byte path."""
    import pyarrow as pa

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        arr = pa.array(pdf["payload"], type=pa.large_binary())
        pa_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        hdr = len(_MAGIC)
        starts = pa_offsets[:-1] + arr.offset + hdr
        ends = pa_offsets[1:] + arr.offset
        lens = np.maximum(ends - starts, 0)

        w = np.maximum((lens + 15) // 16, 1)
        big_n = 16 * w

        # gather body bytes (headers stripped) into one contiguous array
        total = int(lens.sum())
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=cum[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], lens)
        body = data[np.repeat(starts, lens) + within]
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)

        # segment sums (bincount: empty segments naturally sum to 0)
        body_i8 = body.astype(np.int64)
        sums = np.bincount(seg, weights=body_i8, minlength=n).astype(np.int64)
        mean = sums / (16.0 * w)

        # exact p99: one global segment-major sort; padding zeros are a
        # virtual prefix of each sorted segment (0 is the byte minimum)
        sorted_body = np.sort(seg * 256 + body_i8) & 255
        idx99 = 99 * (big_n - 1)
        f, rem = idx99 // 100, idx99 % 100
        c = np.minimum(f + 1, big_n - 1)
        pad = big_n - lens

        def _sel(k):
            inside = k >= pad
            flat = cum[:-1] + np.where(inside, k - pad, 0)
            vals = sorted_body[np.minimum(flat, max(total - 1, 0))] if total else np.zeros(n, dtype=np.int64)
            return np.where(inside & (lens > 0), vals, 0)

        sf, sc = _sel(f), _sel(c)
        p99_scaled = sf * 100 + (sc - sf) * rem

        # frame samples: every 4th column, first 8 — column sums via bincount
        col = within % np.repeat(w, lens)
        sel = (col % 4 == 0) & (col < 32)
        slot = seg[sel] * 8 + col[sel] // 4
        colsums = np.bincount(slot, weights=body_i8[sel], minlength=n * 8).astype(np.int64)
        samples = (colsums * 625).reshape(n, 8)
        n_slots = np.minimum(8, (w + 3) // 4)
        frame_samples = [
            ",".join(map(str, samples[i, : n_slots[i]])) for i in range(n)
        ]

        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "height": np.full(n, 16, dtype=np.int32),
                "width": w.astype(np.int32),
                "mean_intensity": mean,
                "p99_scaled": p99_scaled,
                "frame_samples": frame_samples,
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Plumbing notes for scale: payloads stay in Arrow buffers end-to-end
    (binary column → Arrow → numpy views over the batch's offset/data
    buffers; per-batch reduceat/sort/bincount, no per-row Python on the
    byte path); repartition count controls decode parallelism since blob
    decode is CPU-bound, not scan-bound."""
    docs = load(spark, sf_dir, "documents")
    payloads = with_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


# Exact SQL mirror of the feature kernel (valid because the synthetic
# payload body is the utf-8 text and the corpus is pure ASCII — byte
# values == codepoints). Integer arithmetic keeps every output exactly
# comparable across engines.
FEATURES_SQL = """
WITH docs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS len,
         GREATEST(CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT), 1) AS w
  FROM documents
),
chars AS (
  SELECT d.doc_id, d.w, t.i, ascii(substr(d.text, CAST(t.i AS INT), 1)) AS b
  FROM docs d, unnest(generate_series(1, d.len)) AS t(i)
),
agg AS (
  SELECT doc_id, w, sum(b)::BIGINT AS total,
         list_sort(list(b)) AS sorted_b, count(*)::BIGINT AS len
  FROM chars GROUP BY doc_id, w
),
cols AS (
  SELECT doc_id, ((i - 1) % w) // 4 AS slot, sum(b)::BIGINT AS colsum
  FROM chars
  WHERE ((i - 1) % w) % 4 = 0 AND ((i - 1) % w) // 4 < 8
  GROUP BY doc_id, slot
),
samples AS (
  SELECT doc_id,
         string_agg((colsum * 625)::VARCHAR, ',' ORDER BY slot) AS frame_samples
  FROM cols GROUP BY doc_id
),
ranked AS (
  SELECT *,
         (99 * (16 * w - 1)) // 100 AS f,
         LEAST((99 * (16 * w - 1)) // 100 + 1, 16 * w - 1) AS c,
         (99 * (16 * w - 1)) % 100 AS rem,
         16 * w - len AS pad
  FROM agg
)
SELECT r.doc_id,
       16 AS height,
       CAST(r.w AS INT) AS width,
       r.total::DOUBLE / (16 * r.w) AS mean_intensity,
       CAST((CASE WHEN r.f < r.pad THEN 0 ELSE r.sorted_b[CAST(r.f - r.pad + 1 AS INT)] END) * 100
            + ((CASE WHEN r.c < r.pad THEN 0 ELSE r.sorted_b[CAST(r.c - r.pad + 1 AS INT)] END)
               - (CASE WHEN r.f < r.pad THEN 0 ELSE r.sorted_b[CAST(r.f - r.pad + 1 AS INT)] END))
              * r.rem AS BIGINT) AS p99_scaled,
       s.frame_samples
FROM ranked r JOIN samples s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# REAL codecs (stdlib-only PNG / WAV, analytics/codecs.py)
# ---------------------------------------------------------------------------


def _to_png_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each doc's text bytes as a genuine greyscale PNG whose
    pixel grid is the SAME 16×w layout the fake decoder exposes — so the
    exact-feature oracle stays valid while the bytes on the wire are a
    real zlib-compressed, filtered, CRC'd PNG."""
    from .codecs import encode_png

    for pdf in batches:
        payloads = []
        for text in pdf["text"]:
            body = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            w = max((len(body) + 15) // 16, 1)
            img = np.zeros(16 * w, dtype=np.uint8)
            img[: len(body)] = body
            # filter varies per doc: exercises None/Sub/Up reconstruction
            payloads.append(
                encode_png(img.reshape(16, w), filter_type=len(body) % 3)
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _png_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .codecs import decode_png

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_png(bytes(payload))
            mean, p99, samples = exact_image_features(img)
            rows.append(
                (
                    doc_id, img.shape[0], img.shape[1], mean, p99,
                    ",".join(map(str, samples)),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "height", "width", "mean_intensity",
                "p99_scaled", "frame_samples",
            ],
        )


def multimodal_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: text bytes → genuine PNG binary
    column (mapInPandas encode stage) → genuine PNG decode + exact
    features (mapInPandas decode stage). Same feature contract as the
    fake-decode twin, so the same SQL oracle pins it — any filter
    mis-reconstruction, CRC slip, or shape error hash-mismatches."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        _to_png_payloads, schema="doc_id long, payload binary"
    )
    return payloads.mapInPandas(_png_features, schema=FEATURE_SCHEMA)


_WAV_RATE = 8000


def _to_wav_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .codecs import encode_wav

    for pdf in batches:
        payloads = []
        for text in pdf["text"]:
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            payloads.append(encode_wav(b.astype(np.int16), _WAV_RATE))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _wav_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .codecs import decode_wav

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = decode_wav(bytes(payload))
            s = samples.astype(np.int64)
            rows.append(
                (
                    doc_id, len(s), rate, float(s.sum() / len(s)),
                    int(s.max()), int((s * s).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_samples", "sample_rate", "mean_amp", "peak",
                "energy",
            ],
        )


def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: text bytes as PCM16 samples →
    genuine RIFF/WAV binary column → genuine WAV decode → exact sample
    statistics, SQL-oracle-checked."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        _to_wav_payloads, schema="doc_id long, payload binary"
    )
    return payloads.mapInPandas(
        _wav_stats,
        schema=(
            "doc_id long, n_samples long, sample_rate int, "
            "mean_amp double, peak long, energy long"
        ),
    )


WAV_STATS_SQL = f"""
WITH chars AS (
  SELECT d.doc_id, ascii(substr(d.text, CAST(t.i AS INT), 1)) AS b
  FROM documents d,
       unnest(generate_series(1, octet_length(encode(d.text)))) AS t(i)
)
SELECT doc_id,
       count(*)::BIGINT AS n_samples,
       {_WAV_RATE} AS sample_rate,
       sum(b)::DOUBLE / count(*) AS mean_amp,
       max(b)::BIGINT AS peak,
       sum(b * b)::BIGINT AS energy
FROM chars GROUP BY doc_id
"""


def _png_resize_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .codecs import decode_png

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_png(bytes(payload))
            small = img[::2, ::2]  # 2× decimation per axis
            s64 = small.astype(np.int64)
            rows.append(
                (
                    doc_id, small.shape[0], small.shape[1],
                    float(s64.sum() / s64.size), int(s64.sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "height", "width", "mean_intensity", "pix_sum"],
        )


def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode → downsample: genuine PNG payloads decode and
    decimate 2× per axis (every even row/column — the classic stride-2
    downsample), then exact stats over the RESIZED pixels. The
    oracle recomputes the same stats from the text bytes by selecting
    even (row, col) grid positions — a resize that picks wrong source
    pixels, drops padding cells, or mis-shapes hash-mismatches."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        _to_png_payloads, schema="doc_id long, payload binary"
    )
    return payloads.mapInPandas(
        _png_resize_stats,
        schema=(
            "doc_id long, height int, width int, mean_intensity double, "
            "pix_sum long"
        ),
    )


# even rows × even cols of the 16×w grid; padded cells are zeros, so the
# sum runs over real chars at selected positions while the denominator
# is the full resized grid (8 × ceil(w/2))
PNG_RESIZE_SQL = """
WITH docs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS len,
         GREATEST(CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT), 1) AS w
  FROM documents
),
sel AS (
  SELECT d.doc_id, d.w,
         sum(CASE WHEN ((t.i - 1) // d.w) % 2 = 0
                   AND ((t.i - 1) % d.w) % 2 = 0
                  THEN ascii(substr(d.text, CAST(t.i AS INT), 1))
                  ELSE 0 END)::BIGINT AS pix_sum
  FROM docs d, unnest(generate_series(1, d.len)) AS t(i)
  GROUP BY d.doc_id, d.w
)
SELECT doc_id,
       8 AS height,
       CAST((w + 1) // 2 AS INT) AS width,
       pix_sum::DOUBLE / (8 * ((w + 1) // 2)) AS mean_intensity,
       pix_sum
FROM sel
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_png_features": multimodal_png_features,
    "multimodal_wav_stats": multimodal_wav_stats,
    "multimodal_png_resize": multimodal_png_resize,
}

ORACLES = {
    "multimodal_meta": META_SQL,
    "multimodal_features": FEATURES_SQL,
    "multimodal_png_features": FEATURES_SQL,
    "multimodal_wav_stats": WAV_STATS_SQL,
    "multimodal_png_resize": PNG_RESIZE_SQL,
}
