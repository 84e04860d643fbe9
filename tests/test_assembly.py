"""Distributed assembly vs the pure-Python God-factory oracle.

Every entity table produced by operators/assembly.py must be
set-identical to kernels/assemble.py (which encodes the reference's
factory semantics, pinned by golden GUID tests)."""

import pytest

from indu_doc_transformer_spark.kernels.assemble import assemble_documents
from indu_doc_transformer_spark.operators import assembly as asm_op
from indu_doc_transformer_spark.operators import extraction as ex
from indu_doc_transformer_spark.sources.corpus import corpus_df, generate_corpus

N_DOCS = 150


@pytest.fixture(scope="module")
def results(spark):
    docs = corpus_df(spark, N_DOCS, partitions=8)
    extracted = ex.extract(docs, num_partitions=8)
    rows = ex.rows_table(extracted)
    tables = asm_op.assemble(rows)
    collected = {k: v.collect() for k, v in tables.items()}
    oracle = assemble_documents(generate_corpus(N_DOCS))
    return collected, oracle


def test_xtargets_match(results):
    got, oracle = results
    g = {(r.guid, r.tag, r.target_type) for r in got["xtargets"]}
    e = {(x["guid"], x["tag"], x["target_type"]) for x in oracle.xtargets.values()}
    assert g == e
    assert len(g) > 50


def test_xtarget_aspects_match(results):
    """W3 sort_order relation vs the oracle's db.py:222-240 recast."""
    got, oracle = results
    g = {(r.xtarget_guid, r.aspect_guid, r.sort_order) for r in got["xtarget_aspects"]}
    assert g == oracle.xtarget_aspects()
    assert len(g) > 100


def test_aspects_match(results):
    got, oracle = results
    g = {(r.guid, r.separator, r.value) for r in got["aspects"]}
    e = {(a["guid"], a["separator"], a["value"]) for a in oracle.aspects.values()}
    assert g == e


def test_connections_match(results):
    got, oracle = results
    g = {(r.guid, r.src_guid, r.dst_guid, r.through_guid) for r in got["connections"]}
    e = {
        (c["guid"], c["src_guid"], c["dst_guid"], c["through_guid"])
        for c in oracle.connections.values()
    }
    assert g == e
    assert len(g) > 50


def test_links_match(results):
    got, oracle = results
    g = {
        (r.guid, r.name, r.connection_guid, r.src_pin_name, r.dest_pin_name)
        for r in got["links"]
    }
    e = {
        (l["guid"], l["name"], l["connection_guid"], l["src_pin_name"], l["dest_pin_name"])
        for l in oracle.links.values()
    }
    assert g == e


def test_pins_match(results):
    got, oracle = results
    g = {(r.guid, r.name, r.role, r.child_guid, r.link_guid) for r in got["pins"]}
    e = {
        (p["guid"], p["name"], p["role"], p["child_guid"], p["link_guid"])
        for p in oracle.pins.values()
    }
    assert g == e


def test_attributes_match(results):
    got, oracle = results
    g = {(r.guid, r.name, r.type, r.value_json) for r in got["attributes"]}
    e = {
        (a["guid"], a["name"], a["type"], a["value_json"])
        for a in oracle.attributes.values()
    }
    assert g == e


def test_object_attributes_match(results):
    got, oracle = results
    g = {(r.object_guid, r.attribute_guid) for r in got["object_attributes"]}
    assert g == oracle.object_attrs


def test_lineage_match(results):
    got, oracle = results
    g = {(r.url, r.page_no, r.object_guid, r.object_type) for r in got["lineage"]}
    assert g == oracle.lineage


def test_errors_match(results):
    got, oracle = results
    g = sorted((r.url, r.page_no, r.severity, r.message) for r in got["errors"])
    e = sorted(oracle.errors)
    assert g == e


def test_invalid_tag_path_parity(spark):
    """Docs 500-560 include garbage tags under no-tag footers: the
    'Tag is invalid' warning + unparseable-tag xtarget creation
    (god.py:288-299) must match the oracle."""
    from pyspark.sql import Row

    from indu_doc_transformer_spark.kernels.assemble import Assembly
    from indu_doc_transformer_spark.kernels.layout import extract_document
    from indu_doc_transformer_spark.sources.corpus import CORPUS_SCHEMA, generate_doc

    docs = [generate_doc(i) for i in range(500, 560)]
    sdf = spark.createDataFrame([Row(**d) for d in docs], schema=CORPUS_SCHEMA)
    tables = asm_op.assemble(ex.rows_table(ex.extract(sdf, 4)))

    oracle = Assembly()
    for d in docs:
        r = extract_document(d["html"])
        if r["rows"]:
            for row in r["rows"]:
                oracle.process_row(
                    d["url"], 1, r["page_type"], r["footer"]["tags"], row
                )

    g_err = sorted((r.url, r.severity, r.message) for r in tables["errors"].collect())
    e_err = sorted((u, s, m) for (u, p, s, m) in oracle.errors)
    assert g_err == e_err
    assert any("Tag is invalid" in m for (_, _, m) in g_err)

    g_x = {(r.guid, r.tag, r.target_type) for r in tables["xtargets"].collect()}
    e_x = {(x["guid"], x["tag"], x["target_type"]) for x in oracle.xtargets.values()}
    assert g_x == e_x
