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
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ProcessingControl:
    """Cooperative cancellation + processing state, the Spark recast of
    the reference's plugin stop-request surface and event state machine
    (/root/reference/src/indu_doc/plugins/plugin.py:131-142
    stop_processing; plugins/events.py:13-158 states).

    ``stop()`` is safe from any thread (a signal handler, a UI): it
    flips the flag AND cancels the run's Spark job group, so an
    in-flight chunk's tasks are interrupted rather than run to
    completion. ``run_checkpointed`` checks the flag between chunks and
    treats a cancelled in-flight chunk as a clean stop — the chunk is
    NOT marked complete, and because chunk output lands via dynamic
    partition overwrite with deterministic GUIDs downstream, a later
    run rewrites the half-written chunk idempotently and resumes from
    the registry. States: idle -> running -> stopped | done | error.
    """

    def __init__(self, spark: SparkSession, group: str = "indu-doc-pipeline"):
        self.spark = spark
        self.group = group
        self.state = "idle"
        self._stop = threading.Event()

    def stop(self) -> None:
        self._stop.set()
        try:
            self.spark.sparkContext.cancelJobGroup(self.group)
        except Exception:
            pass  # context already stopped: flag alone suffices

    @property
    def stopped(self) -> bool:
        return self._stop.is_set()


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
    control: ProcessingControl | None = None,
    on_chunk=None,
) -> dict:
    """Run ``process(chunk_df) -> DataFrame`` over bucket chunks with
    resume. Returns {'processed_chunks': n, 'skipped_buckets': m,
    'stopped': bool}.

    ``control`` enables cooperative stop (see ProcessingControl): each
    chunk's jobs run under the control's job group with task
    interruption on cancel; a stop request lands either between chunks
    (flag check) or mid-chunk (cancelled write raises, caught here) —
    in both cases the interrupted chunk is NOT registered and the
    restart redoes it idempotently. ``on_chunk(idx, n_chunks, todo)``
    is called before each chunk starts (CLI progress display)."""
    spark = docs.sparkSession
    registry = BucketRegistry(spark, os.path.join(out_dir, "_registry"))
    done = registry.completed()
    skipped = len(done)

    docs = docs.withColumn("bucket", bucket_col(num_buckets))
    chunks = [
        list(range(start, min(start + chunk_size, num_buckets)))
        for start in range(0, num_buckets, chunk_size)
    ]
    processed = 0
    stopped = False
    if control is not None:
        control.state = "running"
    try:
        for idx, chunk in enumerate(chunks):
            todo = [b for b in chunk if b not in done]
            if not todo:
                continue
            if control is not None and control.stopped:
                stopped = True
                break
            if on_chunk is not None:
                on_chunk(idx, len(chunks), todo)
            if control is not None:
                spark.sparkContext.setJobGroup(
                    control.group,
                    f"extract chunk {idx + 1}/{len(chunks)}",
                    interruptOnCancel=True,
                )
            try:
                sub = docs.where(F.col("bucket").isin(todo))
                out = process(sub)
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("bucket")
                    .parquet(os.path.join(out_dir, "extracted"))
                )
            except Exception:
                if control is not None and control.stopped:
                    # cancelled mid-chunk: half-written partitions are
                    # rewritten idempotently on resume; do NOT register
                    stopped = True
                    break
                if control is not None:
                    control.state = "error"
                raise
            registry.mark(todo)
            done.update(todo)
            processed += 1
    finally:
        if control is not None:
            # clear the per-thread job group so later jobs on this
            # thread aren't cancellable via this control
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            if control.state == "running":
                control.state = "stopped" if stopped else "done"
    return {
        "processed_chunks": processed,
        "skipped_buckets": skipped,
        "stopped": stopped,
    }
