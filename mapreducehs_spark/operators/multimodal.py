"""Multimodal column plumbing: opaque binary payloads + typed metadata.

LLM-data-pipeline surface mandated by BASELINE.json (absent in the
reference).  Conventions:

- A modality column is ``BinaryType`` payload + a sibling struct of
  typed metadata (``modality``, ``mime``, ``n_bytes``, ``checksum``).
- At 100 TB the payload column is *pointer-style* where possible: store
  (path, offset, length) into an object store and load bytes inside the
  UDF — shuffling raw media through every stage is the classic
  anti-pattern.  ``attach_payload`` here materializes real bytes because
  the testdata is synthetic text; the schema contract is identical.
- Decode / feature-extract run as Arrow-batched ``mapInPandas`` — the
  only sane shape for per-item Python media libs (one Python worker per
  partition, batches amortize serialization).  The actual image/audio
  decode libs are NOT in this container, so ``decode_image`` raises
  ``NotImplementedError`` by design and ``fake_features`` provides the
  deterministic stand-in used by tests (real deployments swap the body,
  the Spark plumbing — schema, partitioning, batch shape — is what is
  tested here).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_payload(df: DataFrame, text_col: str = "text", modality: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct from
    a source column (UTF-8 bytes of the text in this synthetic setup)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def read_binary_dir(spark, path: str) -> DataFrame:
    """Directory-of-files reader: Spark's ``binaryFile`` source
    (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path)


def decode_image(payload_bytes: bytes) -> "np.ndarray":
    """STUB — image decode requires a codec lib (PIL/cv2) not present in
    this container.  Deployments replace this body; everything calling
    it goes through the same mapInPandas plumbing as fake_features."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; not available in this environment"
    )


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a media feature extractor: folds the
    sha256 digest into ``dim`` floats in [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The production shape for decode/resize/frame-sample: mapInPandas,
    one pandas batch of payloads in, features out.  Swap
    ``fake_features`` for a real extractor without touching the plan.
    """
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != payload_col
    ) + f", features array<double>"

    other_cols = [c for c in df.columns if c != payload_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_features(p, dim) for p in pdf[payload_col]]
            out = pdf[other_cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB shape for video frame sampling: emits (id, frame_index) rows
    for frames 0, n, 2n… of a declared frame count in metadata; the
    decode of each frame is a NotImplementedError stub like
    ``decode_image``.  Demonstrates the explode-then-process plan shape."""
    n_frames = F.coalesce(F.col("meta.n_bytes") / 1000, F.lit(0)).cast("int")
    return df.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )


def payload_byte_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-row payload byte statistics via ``mapInArrow`` — the
    zero-copy variant of the mapInPandas path: batches arrive as
    pyarrow RecordBatches with the binary column as one contiguous
    Arrow data buffer + offsets, skipping the pandas object-per-cell
    materialization entirely.  For opaque-media columns this is the
    right batch interface at 100 TB (payload bytes never become Python
    objects; numpy views the flattened buffer and reduces per-segment).

    Emits (doc_id, n_bytes, head_byte, byte_sum).
    """
    import pyarrow as pa

    def batches(it):
        for batch in it:
            ids = batch.column(batch.schema.get_field_index("doc_id"))
            payload = batch.column(batch.schema.get_field_index(payload_col))
            data_buf = payload.buffers()[2]
            buf = (
                np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None
                else np.zeros(0, dtype=np.uint8)
            )
            offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
                payload.offset : payload.offset + len(payload) + 1
            ].astype(np.int64)
            n_bytes = offs[1:] - offs[:-1]
            if len(buf):
                # reduceat needs in-range, and sums need a wide dtype
                starts = np.minimum(offs[:-1], len(buf) - 1)
                sums = np.add.reduceat(buf.astype(np.int64), starts)[: len(n_bytes)]
                sums = np.where(n_bytes > 0, sums, 0)
                head = np.where(n_bytes > 0, buf[starts].astype(np.int32), -1)
            else:
                sums = np.zeros(len(n_bytes), dtype=np.int64)
                head = np.full(len(n_bytes), -1, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(n_bytes),
                    pa.array(head.astype(np.int32)),
                    pa.array(sums),
                ],
                names=["doc_id", "n_bytes", "head_byte", "byte_sum"],
            )

    return df.select("doc_id", payload_col).mapInArrow(
        batches, schema="doc_id long, n_bytes long, head_byte int, byte_sum long"
    )
