"""End-to-end extraction pipeline orchestration.

Stage 1 (extract): documents -> salted mapInPandas kernel -> nested
extraction table, written bucket-partitioned with a completed-bucket
registry (kill-and-restart resumes idempotently).

Stage 2 (assemble): read extraction output back (explicit
materialization barrier: at 100 TB the extraction output is a real
Iceberg table, and assembly is a separate, restartable job), derive the
normalized rows, run the relational assembly, write entity tables +
lineage + metrics.

The flagship query and benchmarks drive these two stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import (
    DEFAULT_ASPECTS,
    PAGE_SETUPS,
    AspectsConfig,
    page_setups_from_json,
    page_setups_to_json,
)
from .operators import assembly as asm_op
from .operators import extraction as ex
from .plans.checkpoint import run_checkpointed
from .sources.catalog import read_table, write_table

ENTITY_TABLES = [
    "xtargets",
    "xtarget_aspects",
    "aspects",
    "connections",
    "links",
    "pins",
    "attributes",
    "object_attributes",
    "lineage",
    "errors",
]


def run_extraction(
    docs: DataFrame,
    out_dir: str,
    num_buckets: int = 32,
    chunk_size: int = 8,
    control=None,
    on_chunk=None,
    page_setups_json: str | None = None,
) -> dict:
    """Stage 1 with checkpoint/resume. Extraction output keeps the
    bucket column for partition pruning downstream. ``control`` is a
    plans.checkpoint.ProcessingControl for cooperative stop (a stopped
    run resumes from the bucket registry); ``on_chunk`` is a progress
    callback (idx, n_chunks, buckets); ``page_setups_json`` overrides
    the built-in page setups (CLI -e/--extraction-settings)."""

    from pyspark.sql import Observation

    observations: list[Observation] = []

    def process(chunk: DataFrame) -> DataFrame:
        pruned = chunk.select("url", "warc_ts", "html", "lang", "bucket")
        # salt/repartition on the bucket key itself: co-locates the
        # kernel work with the downstream partitioned write
        pruned = pruned.repartition(max(8, chunk_size), F.col("bucket"), F.col("url"))
        kernel = (
            ex._extract_batches
            if page_setups_json is None
            else ex.make_extract_batches(page_setups_json)
        )
        extracted = pruned.mapInPandas(
            kernel, schema=ex.EXTRACTION_SCHEMA + ", bucket int"
        )
        # E3 job-level progress/counters: observed metrics ride the
        # write action, no extra pass (plugin.py:176-187 analog)
        obs = Observation(f"extract_chunk_{len(observations)}")
        observations.append(obs)
        return extracted.observe(
            obs,
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size("rows")).alias("rows"),
            F.sum(
                F.size(F.filter("errors", lambda e: e["severity"] == "FAULT"))
            ).alias("faults"),
        )

    stats = run_checkpointed(
        docs, out_dir, process, num_buckets, chunk_size,
        control=control, on_chunk=on_chunk,
    )
    # an interrupted chunk's observation never resolves — only read
    # observations for chunks that ran to completion
    stats["observed"] = [o.get for o in observations[: stats["processed_chunks"]]]
    return stats


def run_metadata(
    spark: SparkSession,
    config: AspectsConfig = DEFAULT_ASPECTS,
    page_setups: dict = PAGE_SETUPS,
) -> DataFrame:
    """One-row schema-contract table persisted alongside the entity
    tables (reference analog: exporters/db_builder/db.py:159-161 and
    the metadata insert at db.py:413-416, which stores
    ``configs.get_db_representation()``). A warehouse consumer can
    reconstruct the AspectsConfig and per-page-type setups that
    produced a run from the output alone — the entity schemas are
    config-dependent (aspect columns), so the output is not
    self-describing without this."""
    import datetime

    return spark.createDataFrame(
        [
            (
                config.to_json_str(),
                page_setups_to_json(page_setups),
                ",".join(ENTITY_TABLES),
                spark.version,
                spark.sparkContext.applicationId,
                datetime.datetime.now(datetime.timezone.utc).isoformat(),
            )
        ],
        "aspects_config string, page_setups string, entity_tables string, "
        "spark_version string, app_id string, created_utc string",
    )


def run_assembly(
    spark: SparkSession,
    out_dir: str,
    config: AspectsConfig = DEFAULT_ASPECTS,
    page_setups: dict = PAGE_SETUPS,
) -> dict[str, DataFrame]:
    """Stage 2: entity tables from the persisted extraction output."""
    extracted = read_table(spark, os.path.join(out_dir, "extracted"))
    rows = ex.rows_table(extracted)
    tables = asm_op.assemble(rows, config)
    # extraction-stage error channel joins the assembly one
    tables["errors"] = tables["errors"].unionByName(ex.errors_table(extracted))
    for name in ENTITY_TABLES:
        write_table(tables[name], os.path.join(out_dir, name))
    # per-partition counter metrics (north rule)
    write_table(
        ex.partition_metrics(extracted), os.path.join(out_dir, "metrics_partitions")
    )
    write_table(
        extracted.select("url", "page_type", "extracted_text"),
        os.path.join(out_dir, "extracted_text"),
    )
    write_table(ex.spans_table(extracted), os.path.join(out_dir, "spans"))
    # run-metadata: the config contract that produced this output
    write_table(
        run_metadata(spark, config, page_setups), os.path.join(out_dir, "metadata")
    )
    return tables


def run_full(
    docs: DataFrame,
    out_dir: str,
    num_buckets: int = 32,
    config: AspectsConfig = DEFAULT_ASPECTS,
    control=None,
    on_chunk=None,
    page_setups_json: str | None = None,
    chunk_size: int = 8,
) -> dict:
    """Both stages. A stop request during extraction skips assembly
    (the registry keeps the completed buckets; rerun to finish)."""
    stats = run_extraction(
        docs, out_dir, num_buckets, chunk_size,
        control=control, on_chunk=on_chunk, page_setups_json=page_setups_json,
    )
    if stats.get("stopped"):
        return stats
    setups = (
        PAGE_SETUPS
        if page_setups_json is None
        else page_setups_from_json(page_setups_json)
    )
    run_assembly(docs.sparkSession, out_dir, config, setups)
    return stats
