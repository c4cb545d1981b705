"""Multimodal (binary payload) column plumbing.

Treats image/audio/video as opaque `binary` columns plus a typed
metadata struct, with decode / feature-extraction as Arrow-batched
mapInPandas stages. The decode itself is a STUB here — no image/audio
libraries ship in this container — but everything Spark-side is real:
schemas, batch iteration, partition safety, and the deterministic
fake-feature path used by tests and the driver query.

At 100 TB: payloads live in parquet binary columns (or object-store
pointers); mapInPandas keeps per-task memory = one Arrow batch, so the
decode stage scales with partition count, not file count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this environment


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Synthesize a deterministic binary payload + metadata struct from
    a text column (stands in for real image/audio bytes)."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("fake-md5").alias("codec"),
        ),
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Batch 'decode' of binary payloads via mapInPandas.

    Real decoders are unavailable — raise if asked for them; the
    deterministic fake extracts byte-level features with the exact
    batch shape a real decoder (PIL.Image.open per payload, etc.)
    would use.
    """

    schema = f"{id_col} bigint, payload_len int, first_byte int, byte_sum bigint"

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload_len": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else None),
                    "byte_sum": payloads.map(lambda b: int(sum(b))),
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode_batch, schema=schema)


def resize_payload(df: DataFrame, id_col: str = "doc_id", target_bytes: int = 8) -> DataFrame:
    """'Resize' stage with REAL Spark plumbing and a deterministic fake
    kernel: where a real pipeline would decode+resample pixels (PIL is
    unavailable), this stride-samples the payload bytes down to
    `target_bytes`. Schema, Arrow batching, and partition behavior are
    exactly what the real kernel would use — swap `_shrink` for
    PIL.Image.resize when the library exists."""

    def _shrink(b: bytes) -> bytes:
        if not b:
            return b
        stride = max(1, len(b) // target_bytes)
        return b[::stride][:target_bytes]

    schema = f"{id_col} bigint, resized binary, resized_len int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            shrunk = pdf["payload"].map(_shrink)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "resized": shrunk, "resized_len": shrunk.map(len)}
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=schema)


def sample_frames(df: DataFrame, id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """'Frame sampling' stage: a real video pipeline emits one row per
    sampled frame (row-expanding mapInPandas); the fake kernel splits
    the payload into `n_frames` equal byte chunks. The EXPANSION shape
    (one input row -> n output rows, frame_idx column) is the real
    contract a decoder plugs into."""

    schema = f"{id_col} bigint, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                step = max(1, len(b) // n_frames)
                for j in range(n_frames):
                    out_ids.append(i)
                    out_idx.append(j)
                    out_frames.append(bytes(b[j * step : (j + 1) * step]))
            yield pd.DataFrame({id_col: out_ids, "frame_idx": out_idx, "frame": out_frames})

    return df.select(id_col, "payload").mapInPandas(batches, schema=schema)


def decode_image(*_a, **_k):  # pragma: no cover - explicit stub
    raise NotImplementedError(
        "image decoding requires PIL/cv2 which are not installed; "
        "decode_features() provides the deterministic fake path"
    )
