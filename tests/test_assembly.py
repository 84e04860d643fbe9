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
