"""§2.6 Multimodal pipeline query (binary payload plumbing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cpx_etl_spark.operators.multimodal import attach_payload, decode_features
from cpx_etl_spark.queries import register
from cpx_etl_spark.sources import load_table


@register("mm_binary_pipeline")  # rows-only: decode runs through mapInPandas
def mm_binary_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata -> Arrow-batched feature decode.

    The byte features are deterministic (payload = unhex(md5(text))),
    so the driver's rows-only check still pins row count and schema.
    """
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_payload(docs), id_col="doc_id")
