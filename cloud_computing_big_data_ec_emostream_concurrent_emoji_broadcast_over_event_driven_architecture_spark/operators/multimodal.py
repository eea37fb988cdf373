"""Multimodal column convention (SURVEY.md §7 Phase 5): media as opaque
``binary`` payloads + a typed metadata struct, with decode / feature
extraction as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic stub (``_fake_decode``) — the Spark-side
plumbing (schema, batch iteration, partition-preserving flow, typed
feature output) is real and is what the tests exercise. Swapping the stub
for PIL/ffmpeg changes one function, not the plan.

``documents.text`` stands in for the raw bytes (``encode(text, 'utf-8')``);
a real pipeline reads parquet/blob-store binary columns identically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register

MODALITY = "text-bytes"

# head_hex is a scalar hex fingerprint of the first 8 bytes — the contract
# surface stays hashable/sortable for differential checks (an array<int>
# column here broke the driver's canonicalizer in round 1)
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, "
    "checksum long, head_hex string"
)


def binary_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct<modality,n_bytes>)
    — the engine's multimodal column convention."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(MODALITY).alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — deterministic stand-in for an image/audio decode.
    Replace with the real library call (PIL.Image.open etc.) when the
    dependency exists; everything around it is production plumbing."""
    checksum = 0
    for b in payload:
        checksum = (checksum * 131 + b) % (1 << 61)
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "head_hex": payload[:8].hex(),
    }


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, typed feature rows out."""
    for pdf in batches:
        feats = pdf["payload"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": [m["modality"] for m in pdf["meta"]],
                "n_bytes": [f["n_bytes"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
                "head_hex": [f["head_hex"] for f in feats],
            }
        )


@register(
    "q_multimodal_meta",
    tags=("multimodal",),
    oracle=f"""
        SELECT doc_id, '{MODALITY}' AS modality,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — JVM-side only (no decode), so
    metadata scans never touch the heavy bytes at scale (column pruning
    drops ``payload`` entirely)."""
    bf = binary_frame(spark, sf_dir)
    return bf.select(
        "doc_id", F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@register(
    "q_multimodal_features",
    tags=("multimodal", "pandas-udf"),
    oracle=None,  # decode stub is Python-side — driver's rows-only check;
    # exactness is pinned by tests/test_multimodal.py instead
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas — the pattern for decode/resize/frame-sample stages. The
    stub keeps outputs deterministic (byte length, rolling checksum, head
    bytes) so tests can assert exact values."""
    return binary_frame(spark, sf_dir).mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )


FRAME_BYTES = 256
FRAME_STRIDE = 2  # keep every 2nd frame


@register(
    "q_multimodal_frames",
    tags=("multimodal", "frames"),
    oracle=f"""
        WITH f AS (
            SELECT doc_id, n_chars,
                   unnest(range(0, CAST(ceil(n_chars * 1.0 / {FRAME_BYTES})
                                        AS BIGINT))) AS frame_idx
            FROM documents
        )
        SELECT d.doc_id, f.frame_idx,
               md5(substr(d.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS INT),
                          {FRAME_BYTES})) AS frame_md5
        FROM f JOIN documents d ON f.doc_id = d.doc_id
        WHERE f.frame_idx % {FRAME_STRIDE} = 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    256-byte frames, keep every 2nd, fingerprint each frame — the video
    frame-sample pattern with the decode stubbed by byte slicing (the
    documents text is ASCII, so the DuckDB oracle's char slices are the
    same bytes). One-to-many expansion is sequence+explode — pure
    codegen, no Python; per-frame work partitions with the frame, so a
    1-hour video and a 10-second clip cost proportionally. Swap the
    byte-slice for a real codec via mapInPandas (see _extract_features)
    when the library exists."""
    frames = (
        binary_frame(spark, sf_dir)
        # empty payloads yield no frames (F.sequence(0, -1) would step
        # DOWNWARD and emit spurious indices — Spark sequences are
        # bidirectional)
        .filter(F.col("meta.n_bytes") > 0)
        .select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.col("meta.n_bytes") / F.lit(FRAME_BYTES)).cast(
                        "long"
                    )
                    - 1,
                )
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % FRAME_STRIDE == 0)
    )
    frame = F.substring(
        F.col("payload"), F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES
    )
    return frames.select(
        "doc_id", "frame_idx", F.md5(frame).alias("frame_md5")
    )


RESIZE_BYTES = 128


@register(
    "q_multimodal_resize",
    tags=("multimodal", "resize"),
    oracle=f"""
        SELECT doc_id,
               md5(CASE WHEN n_chars >= {RESIZE_BYTES}
                        THEN substr(text, 1, {RESIZE_BYTES})
                        ELSE text || repeat(chr(32),
                                            {RESIZE_BYTES} - n_chars) END)
                   AS resized_md5,
               {RESIZE_BYTES} AS n_bytes
        FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fixed-shape over binary payloads: truncate or pad every
    payload to exactly 128 bytes and fingerprint the result — the
    image-resize pattern with the codec stubbed by byte slicing (ASCII
    text ⇒ the oracle's char ops are the same bytes; space is the
    deterministic pad). Pure per-row projection: at 100 TB this is
    embarrassingly parallel and never shuffles."""
    bf = binary_frame(spark, sf_dir)
    resized = F.rpad(
        F.substring(F.col("payload").cast("string"), 1, RESIZE_BYTES),
        RESIZE_BYTES,
        " ",
    )
    return bf.select(
        "doc_id",
        F.md5(F.encode(resized, "utf-8")).alias("resized_md5"),
        F.lit(RESIZE_BYTES).alias("n_bytes"),
    )
