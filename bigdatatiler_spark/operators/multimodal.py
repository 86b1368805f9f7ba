"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas UDFs over
``mapInPandas``. The decode step itself is STUBBED here (no image/audio
libraries in this container — see ``decode_stub``) but the Spark-side
plumbing — schema, batch iteration, partition sizing — is real and
tested in tests/test_multimodal.py.

The oracle-checked query covers the deterministic part of the pipeline:
payload synthesis (text→utf8 bytes as a stand-in blob), size accounting,
content hashing, and frame-count derivation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..tables import table

FRAME_BYTES = 256  # fake "bytes per frame" used by the frame-count derivation

#: Output schema of the decode/feature-extract stage.
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("payload_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column + metadata struct to a document
    table. Stand-in for reading real media via ``binaryFile`` — the
    downstream plumbing (BinaryType column, metadata struct) is identical."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_stub(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode / feature-extract stage as ``mapInPandas``.

    ``fake=True`` derives deterministic pseudo-metadata from the bytes
    (so plumbing is testable); ``fake=False`` is the real-decoder slot and
    raises NotImplementedError — the image/audio libs are not in this
    container. Arrow-batched: each pandas batch holds many payloads, the
    per-row Python cost is one len() + two byte reads.
    """

    def _decode(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available; "
                    "use fake=True for deterministic plumbing tests"
                )
            payloads = pdf["payload"]
            lens = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": "fake/utf8",
                    "payload_len": lens,
                    # deterministic pseudo-dimensions from the first bytes
                    "width": payloads.map(lambda b: (b[0] if len(b) else 0) + 1),
                    "height": payloads.map(lambda b: (b[-1] if len(b) else 0) + 1),
                    "n_frames": (lens + FRAME_BYTES - 1) // FRAME_BYTES,
                }
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


@register(
    "multimodal_payload_stats",
    oracle=f"""
    SELECT
      doc_id,
      octet_length(encode(text)) AS payload_len,
      sha256(text)               AS content_sha256,
      CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) AS n_frames,
      CASE WHEN octet_length(encode(text)) > length(text) THEN 1 ELSE 0 END AS is_multibyte
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half of the multimodal pipeline: binary payload
    synthesis, byte accounting (UTF-8 length vs char length), content
    hash, frame-count derivation. Map-only, no shuffle; the binary column
    never leaves the JVM."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("payload_len"),
        F.sha2(F.col("text").cast("string"), 256).alias("content_sha256"),
        F.ceil(F.length(payload) / F.lit(float(FRAME_BYTES))).cast("int").alias("n_frames"),
        F.when(F.length(payload) > F.length("text"), 1).otherwise(0).alias("is_multibyte"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_stub(
    df: DataFrame, target_w: int, target_h: int, fake: bool = True
) -> DataFrame:
    """Resize stage over decoded media: (payload, width, height) →
    (payload', target_w, target_h). Fake mode scales the byte budget by
    the area ratio and truncates — deterministic, so the batch plumbing
    (binary in AND out of Arrow) is testable; ``fake=False`` is the
    real-resampler slot (PIL/ffmpeg), not available in this container.
    """

    def _resize(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resizing requires PIL/ffmpeg — use fake=True"
                )

            def _scale(row):
                area = max(row["width"] * row["height"], 1)
                keep = max(
                    1, int(len(row["payload"]) * min(target_w * target_h / area, 1.0))
                )
                return row["payload"][:keep]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf.apply(_scale, axis=1),
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stage: one input payload → every_n-th FRAME_BYTES
    slice as its own row (the 1→N fan-out shape of video frame
    extraction). mapInPandas output rows need not align 1:1 with input
    rows — the returned batch is simply longer; Spark re-batches. The
    fan-out multiplies downstream row count, so at 100 TB sample *before*
    shuffling (this stage is narrow) and repartition after."""

    def _sample(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    out_ids.append(row["doc_id"])
                    out_idx.append(i)
                    out_frames.append(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_index": out_idx, "frame": out_frames}
            )

    return df.mapInPandas(_sample, FRAME_SCHEMA)
