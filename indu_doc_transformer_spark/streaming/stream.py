"""Structured Streaming extraction: incremental processing with its own
checkpointing (the alternative resume path to plans/checkpoint.py).

The reference is a batch system with incremental flavor (SURVEY.md
2.9); the streaming recast reads the documents table as a file stream,
deduplicates by url within a watermark on warc_ts (late-data handling
the reference lacks), runs the same Arrow kernel, and writes with
Trigger.AvailableNow — a killed run resumes from the stream checkpoint
with exactly-once file-sink semantics."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import extraction as ex
from ..sources.corpus import CORPUS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    await_termination: bool = True,
):
    """Incremental extraction over a growing documents directory."""
    src = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    deduped = src.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
    extracted = deduped.select("url", "warc_ts", "html", "lang").mapInPandas(
        ex._extract_batches, schema=ex.EXTRACTION_SCHEMA
    )
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_metrics(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
):
    """Windowed per-page-type counts with late-data handling — the
    streaming analog of the per-partition counter metrics."""
    src = spark.readStream.schema(CORPUS_SCHEMA).parquet(input_dir)
    extracted = src.select("url", "warc_ts", "html", "lang").mapInPandas(
        ex._extract_batches, schema=ex.EXTRACTION_SCHEMA
    )
    agg = (
        extracted.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", window), "page_type")
        .agg(F.count("*").alias("docs"), F.sum(F.size("rows")).alias("rows"))
    )
    return agg
