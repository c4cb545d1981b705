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


def decode_image(*_a, **_k):  # pragma: no cover - explicit stub
    raise NotImplementedError(
        "image decoding requires PIL/cv2 which are not installed; "
        "decode_features() provides the deterministic fake path"
    )


def resize_image(*_a, **_k):  # pragma: no cover - explicit stub
    raise NotImplementedError("image ops unavailable in this environment")


def sample_frames(*_a, **_k):  # pragma: no cover - explicit stub
    raise NotImplementedError("video ops unavailable in this environment")
