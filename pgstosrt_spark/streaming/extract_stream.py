"""Streaming extraction: readStream(documents) -> flat cue/text span rows.

The per-doc re-aggregation (groupBy + collect_list) needs a complete doc
and is a batch concern; the streaming form emits *flat* span rows in
append mode — exactly the rows the batch pipeline aggregates — so a
downstream batch compaction (or foreachBatch MERGE) can fold them per doc.
The kernels are identical to the batch path (kernels.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import CUE_SCHEMA, make_fused_kernel
from ..sources.tables import DOCUMENTS_SCHEMA


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def extract_stream(documents: DataFrame) -> DataFrame:
    """Streaming documents -> flat span rows (text passthrough + cues)."""
    spans = documents.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    text_rows = spans.filter(F.col("kind") == "text").select(
        "doc_id", "offset", F.lit(0).alias("seq"), "kind", "text", "media_ref"
    )
    media = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref", F.unbase64(F.col("text")).alias("payload")
    )
    cues = media.mapInPandas(make_fused_kernel(), schema=CUE_SCHEMA).filter(
        F.col("kind") == "cue"
    )
    return text_rows.unionByName(cues)
