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


def test_stop_between_chunks_and_resume(spark, tmp_path):
    """Cooperative stop (ProcessingControl — reference
    plugin.py:131-142 stop_processing recast): a stop requested while
    chunk 1 runs is honored at the next chunk boundary; the interrupted
    run's registry keeps completed buckets, and rerunning the same
    pipeline resumes and produces output identical to an uninterrupted
    run."""
    from indu_doc_transformer_spark.plans.checkpoint import ProcessingControl

    docs = corpus_df(spark, N, partitions=4)
    a = str(tmp_path / "a")
    pipeline.run_full(docs, a, num_buckets=8)

    b = str(tmp_path / "b")
    control = ProcessingControl(spark, group="test-stop")

    def on_chunk(idx, n_chunks, buckets):
        if idx == 1:  # deterministic: flag flips while chunk 1 runs
            control.stop()

    stats = pipeline.run_full(
        docs, b, num_buckets=8, chunk_size=2, control=control, on_chunk=on_chunk
    )
    assert stats["stopped"] and control.state == "stopped"
    assert 0 < stats["processed_chunks"] < 4
    done = BucketRegistry(spark, os.path.join(b, "_registry")).completed()
    assert 0 < len(done) < 8
    # assembly must NOT have run on the partial extraction
    assert not os.path.exists(os.path.join(b, "xtargets"))

    resumed = pipeline.run_full(docs, b, num_buckets=8, chunk_size=2)
    assert not resumed["stopped"] and resumed["skipped_buckets"] == len(done)

    key = lambda out: sorted(
        (r.url, r.extracted_text)
        for r in spark.read.parquet(os.path.join(out, "extracted"))
        .select("url", "extracted_text").collect()
    )
    assert key(a) == key(b)
    cnt = lambda out, t: spark.read.parquet(os.path.join(out, t)).count()
    for t in ("xtargets", "connections", "lineage"):
        assert cnt(a, t) == cnt(b, t)


def test_cancel_mid_chunk_resumes_idempotently(spark, tmp_path):
    """stop() DURING a chunk's job cancels the job group (interrupt),
    the chunk is not registered, and a rerun rewrites its half-written
    partitions idempotently (dynamic partition overwrite) — final
    output equals a never-interrupted run."""
    import threading
    import time

    from pyspark.sql import functions as F

    from indu_doc_transformer_spark.plans.checkpoint import (
        ProcessingControl,
        run_checkpointed,
    )

    docs = corpus_df(spark, 48, partitions=4).select("url")

    def make_process(sleep_s):
        def process(chunk):
            def kern(batches):
                import hashlib
                import time as _t

                for pdf in batches:
                    _t.sleep(sleep_s)
                    pdf = pdf.copy()
                    pdf["digest"] = [
                        hashlib.md5(u.encode()).hexdigest() for u in pdf["url"]
                    ]
                    yield pdf[["url", "digest", "bucket"]]

            return chunk.mapInPandas(
                kern, schema="url string, digest string, bucket int"
            )

        return process

    a = str(tmp_path / "a")
    run_checkpointed(docs, a, make_process(0.0), num_buckets=4, chunk_size=1)

    b = str(tmp_path / "b")
    control = ProcessingControl(spark, group="test-cancel")
    fired = []

    def on_chunk(idx, n_chunks, buckets):
        if idx == 1 and not fired:
            fired.append(1)
            t = threading.Timer(0.7, control.stop)  # lands mid-job: the
            t.start()  # slow kernel holds chunk 1's job >= 1.5s

    stats = run_checkpointed(
        docs, b, make_process(1.5), num_buckets=4, chunk_size=1,
        control=control, on_chunk=on_chunk,
    )
    assert stats["stopped"]
    done = BucketRegistry(spark, os.path.join(b, "_registry")).completed()
    assert len(done) < 4, "cancelled chunk must not be registered"

    resumed = run_checkpointed(
        docs, b, make_process(0.0), num_buckets=4, chunk_size=1
    )
    assert not resumed["stopped"]
    key = lambda out: sorted(
        (r.url, r.digest)
        for r in spark.read.parquet(os.path.join(out, "extracted")).collect()
    )
    assert key(a) == key(b)


def test_cli_end_to_end(spark, tmp_path, capsys):
    """CLI parity (reference cli.py:135-217 / tests/test_cli.py
    spirit): synth corpus in, entity tables + stats block + JSON export
    out; -c and -e accept the reference-shaped config files and drive
    the run."""
    import glob
    import json

    from indu_doc_transformer_spark.__main__ import main
    from indu_doc_transformer_spark.config import (
        PAGE_SETUPS,
        AspectsConfig,
        page_setups_to_json,
    )

    # reference-shaped aspects config (config.json:1-16 layout)
    cfg = tmp_path / "aspects.json"
    cfg.write_text(json.dumps({"aspects": [
        {"Separator": "=", "Aspect": "Function"},
        {"Separator": "+", "Aspect": "Location"},
        {"Separator": "-", "Aspect": "Product"},
    ]}))
    setups = tmp_path / "setups.json"
    setups.write_text(page_setups_to_json(PAGE_SETUPS))

    out, exp = str(tmp_path / "out"), str(tmp_path / "exp")
    rc = main([
        "synth:60", "-o", out, "-c", str(cfg), "-e", str(setups),
        "--export", exp, "--no-progress", "--buckets", "4",
    ], spark=spark)
    captured = capsys.readouterr().out
    assert rc == 0, captured
    assert "Processing Statistics:" in captured
    assert "Xtargets:" in captured
    assert "Processing completed successfully!" in captured
    assert "Data exported to:" in captured
    # the -c config is recorded in run metadata (it drove assembly)
    meta = spark.read.parquet(os.path.join(out, "metadata")).collect()[0]
    assert AspectsConfig.from_json_str(meta.aspects_config) == \
        AspectsConfig.from_json_str(cfg.read_text())
    # exported entity JSON is real spark json output
    assert glob.glob(exp + "/xtargets/part-*")
    # bad input -> error path, exit 1
    assert main(["/nonexistent/nowhere.parquet", "-o", str(tmp_path / "o2"),
                 "--no-progress"], spark=spark) == 1


def test_custom_extraction_settings_missing_type_is_error_row(spark):
    """User-supplied -e settings that omit a classified page type must
    produce per-doc FAULT rows (the E2 rule), not a task-killing
    KeyError; docs of the remaining types extract normally."""
    import json

    from indu_doc_transformer_spark.config import (PAGE_SETUPS,
                                                   page_setups_to_json)
    from indu_doc_transformer_spark.operators import extraction as ex

    docs = corpus_df(spark, 40, partitions=2)
    full = ex.extract(docs)
    types = {r.page_type for r in full.select("page_type").distinct().collect()
             if r.page_type}
    assert len(types) >= 2
    dropped = sorted(types)[0]
    setups = {k: v for k, v in PAGE_SETUPS.items() if k != dropped}
    out = ex.extract(docs, page_setups_json=page_setups_to_json(setups))
    rows = out.select("url", "page_type", "errors", "rows").collect()
    assert len(rows) == 40  # no task failures, every doc produced a row
    hit = [r for r in rows if r.page_type == dropped]
    assert hit, "corpus must contain the dropped type"
    for r in hit:
        assert any("No page setup" in e.message for e in r.errors), r
        assert r.rows == []
    ok = [r for r in rows if r.page_type in types and r.page_type != dropped]
    assert any(r.rows for r in ok)  # other types unaffected


def test_cli_input_routing(spark, monkeypatch):
    """A parquet path that merely CONTAINS '.warc' must route to the
    table reader, not the archive parser; real .warc/.warc.gz paths and
    globs route to the WARC reader."""
    from unittest.mock import MagicMock

    from indu_doc_transformer_spark import __main__ as cli
    from indu_doc_transformer_spark.sources import catalog, warc

    calls = []
    monkeypatch.setattr(warc, "read_warc", lambda s, p: calls.append(("warc", p)))
    monkeypatch.setattr(catalog, "read_table", lambda s, p: calls.append(("table", p)))
    for spec, want in [
        ("/d/crawl.warc_extracted.parquet", "table"),
        ("/d/x.warc.gz", "warc"),
        ("/d/x.warc", "warc"),
        ("/d/crawl/*.warc.gz", "warc"),
        ("/d/docs_parquet", "table"),
    ]:
        calls.clear()
        cli.load_input(MagicMock(), spec)
        assert calls and calls[0][0] == want, (spec, calls)
