"""Pipeline orchestration: end-to-end outputs + idempotent resume."""

import os

import pytest
from pyspark.sql import functions as F

from indu_doc_transformer_spark import pipeline
from indu_doc_transformer_spark.plans.checkpoint import BucketRegistry, run_checkpointed
from indu_doc_transformer_spark.sources.corpus import corpus_df

N = 80


def test_full_pipeline_outputs(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = corpus_df(spark, N, partitions=4)
    stats = pipeline.run_full(docs, out, num_buckets=8)
    assert stats["processed_chunks"] > 0

    extracted = spark.read.parquet(os.path.join(out, "extracted"))
    assert extracted.count() == N
    # bucket partitioning present for pruning
    assert "bucket" in extracted.columns

    for t in pipeline.ENTITY_TABLES:
        df = spark.read.parquet(os.path.join(out, t))
        assert df.count() >= 0
    xt = spark.read.parquet(os.path.join(out, "xtargets"))
    assert xt.count() > 20
    et = spark.read.parquet(os.path.join(out, "extracted_text"))
    assert et.count() == N
    pm = spark.read.parquet(os.path.join(out, "metrics_partitions"))
    assert pm.agg(F.sum("docs")).first()[0] == N
    # E3 observed job-level counters cover every processed doc
    assert sum(m["docs"] for m in stats["observed"]) == N


def test_run_metadata_reconstructs_config(spark, tmp_path):
    """Run-metadata table (reference db.py:159-161,413-416): one row
    persisted with the assembly output from which the exact
    AspectsConfig and page setups can be reconstructed."""
    from indu_doc_transformer_spark.config import (
        DEFAULT_ASPECTS,
        PAGE_SETUPS,
        AspectsConfig,
        page_setups_from_json,
    )

    out = str(tmp_path / "out")
    docs = corpus_df(spark, 20, partitions=2)
    pipeline.run_full(docs, out, num_buckets=4)
    meta = spark.read.parquet(os.path.join(out, "metadata")).collect()
    assert len(meta) == 1
    row = meta[0]
    assert AspectsConfig.from_json_str(row.aspects_config) == DEFAULT_ASPECTS
    assert page_setups_from_json(row.page_setups) == PAGE_SETUPS
    assert row.entity_tables.split(",") == pipeline.ENTITY_TABLES
    assert row.spark_version == spark.version and row.app_id


def test_entity_tables_roundtrip_equality(spark, tmp_path):
    """S8/§5.3: written entity tables read back equal to the in-memory
    assembly result (the reference's DB save/load self-check,
    manager.py:505-531)."""
    from indu_doc_transformer_spark.operators import assembly as asm_op
    from indu_doc_transformer_spark.operators import extraction as ex

    docs = corpus_df(spark, 60, partitions=4)
    tables = asm_op.assemble(ex.rows_table(ex.extract(docs, 4)))
    for name in ("xtargets", "connections", "links", "pins", "attributes"):
        p = str(tmp_path / name)
        tables[name].write.parquet(p)
        back = spark.read.parquet(p)
        orig = {tuple(r) for r in tables[name].collect()}
        assert {tuple(r) for r in back.collect()} == orig


def test_kill_and_resume_is_idempotent(spark, tmp_path):
    """Kill after the first chunk; restart; outputs equal an
    uninterrupted run with zero duplicate/lost urls (north rule)."""
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")
    docs = corpus_df(spark, N, partitions=4)

    class Boom(Exception):
        pass

    calls = {"n": 0}

    def process(chunk):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return chunk.select("url", "bucket")

    with pytest.raises(Boom):
        run_checkpointed(docs, out_a, process, num_buckets=8, chunk_size=2)
    done_after_kill = BucketRegistry(spark, os.path.join(out_a, "_registry")).completed()
    assert 0 < len(done_after_kill) < 8

    # restart (no Boom): only remaining buckets processed
    def process_ok(chunk):
        return chunk.select("url", "bucket")

    stats = run_checkpointed(docs, out_a, process_ok, num_buckets=8, chunk_size=2)
    assert stats["skipped_buckets"] == len(done_after_kill)

    run_checkpointed(docs, out_b, process_ok, num_buckets=8, chunk_size=2)

    a = {r.url for r in spark.read.parquet(os.path.join(out_a, "extracted")).collect()}
    b = {r.url for r in spark.read.parquet(os.path.join(out_b, "extracted")).collect()}
    assert a == b
    assert len(a) == N  # zero lost
    cnt = spark.read.parquet(os.path.join(out_a, "extracted")).count()
    assert cnt == N  # zero duplicated
