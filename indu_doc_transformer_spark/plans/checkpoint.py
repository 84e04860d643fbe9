"""Checkpoint/resume: completed-bucket registry for idempotent restart.

North rule: 'checkpoints completed partitions so a killed run resumes
idempotently at 10^12-document scale'. Scheme (SURVEY.md 4.2):

- the url space is bucketized by pmod(xxhash64(url), num_buckets) —
  the same salt key the extraction stage repartitions on;
- buckets are processed in chunks; each chunk's output lands in
  bucket-partitioned storage with dynamic partition overwrite, then the
  chunk's bucket ids are appended to a registry table;
- restart filters the input with an anti-join against the registry
  (here a simple NOT IN over the tiny registry), so completed buckets
  are never recomputed and a half-written chunk is rewritten
  idempotently (partition overwrite, deterministic GUIDs downstream).

The registry is tiny (num_buckets rows) — reading it to the driver is
deliberate, not a scale problem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BucketRegistry:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def completed(self) -> set[int]:
        try:
            return {r.bucket for r in self.spark.read.parquet(self.path).collect()}
        except Exception:
            return set()

    def mark(self, buckets: list[int]) -> None:
        df = self.spark.createDataFrame(
            [(int(b),) for b in buckets], schema="bucket int"
        )
        df.coalesce(1).write.mode("append").parquet(self.path)


def bucket_col(num_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")


def run_checkpointed(
    docs: DataFrame,
    out_dir: str,
    process,
    num_buckets: int = 32,
    chunk_size: int = 8,
) -> dict:
    """Run ``process(chunk_df) -> DataFrame`` over bucket chunks with
    resume. Returns {'processed_chunks': n, 'skipped_buckets': m}."""
    spark = docs.sparkSession
    registry = BucketRegistry(spark, os.path.join(out_dir, "_registry"))
    done = registry.completed()

    docs = docs.withColumn("bucket", bucket_col(num_buckets))
    processed = 0
    for start in range(0, num_buckets, chunk_size):
        chunk = [b for b in range(start, min(start + chunk_size, num_buckets))]
        todo = [b for b in chunk if b not in done]
        if not todo:
            continue
        sub = docs.where(F.col("bucket").isin(todo))
        out = process(sub)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, "extracted"))
        )
        registry.mark(todo)
        processed += 1
    return {"processed_chunks": processed, "skipped_buckets": len(done)}
