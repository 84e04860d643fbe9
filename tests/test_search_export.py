"""Search-query compiler + exporters over a small assembled corpus."""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from indu_doc_transformer_spark.operators import export as ex_op
from indu_doc_transformer_spark.operators import search as s_op
from indu_doc_transformer_spark.operators.search import Filter, run_parser


class TestParser:
    def test_tag_only(self):
        tag, fs = run_parser("=DEV")
        assert tag == "=DEV" and fs == []

    def test_tag_and_filters(self):
        tag, fs = run_parser("=F1+L1 @attributes(Color)=red @type=device")
        assert tag == "=F1+L1"
        assert fs[0].dotted_path == ["attributes"]
        assert fs[0].dotted_param == "Color" and fs[0].value == "red"
        assert fs[1].dotted_path == ["type"] and fs[1].value == "device"

    def test_dotted_path(self):
        _, fs = run_parser("@links.attributes(color)=red")
        assert fs[0].dotted_path == ["links", "attributes"]

    def test_no_value(self):
        _, fs = run_parser("@attributes(Color)")
        assert fs[0].value is None


@pytest.fixture(scope="module")
def tables(spark):
    from indu_doc_transformer_spark.operators import assembly as asm_op
    from indu_doc_transformer_spark.operators import extraction as ex
    from indu_doc_transformer_spark.sources.corpus import corpus_df

    extracted = ex.extract(corpus_df(spark, 120, partitions=4), num_partitions=4)
    return asm_op.assemble(ex.rows_table(extracted))


def test_search_targets_by_tag_substring(spark, tables):
    idx = s_op.build_target_index(tables).persist()
    all_targets = {r.guid: r for r in idx.collect()}
    got = {r.guid for r in s_op.search_targets(idx, "=F1").collect()}
    expect = {g for g, r in all_targets.items() if "=f1" in r.tag.lower()}
    assert got == expect and got


def test_search_targets_by_type_and_attribute(spark, tables):
    idx = s_op.build_target_index(tables).persist()
    rows = idx.collect()
    got = {r.guid for r in s_op.search_targets(idx, "@type=cable").collect()}
    expect = {r.guid for r in rows if "cable" in r.type}
    assert got == expect and got

    got2 = {r.guid for r in s_op.search_targets(idx, "@attributes(Manufacturer)=acme").collect()}
    expect2 = {
        r.guid
        for r in rows
        if any(a.name == "manufacturer" and a.value and "acme" in a.value for a in r.attrs)
    }
    assert got2 == expect2 and got2


def test_search_connections(spark, tables):
    idx = s_op.build_connection_index(tables).persist()
    rows = idx.collect()
    got = {r.guid for r in s_op.search_connections(idx, "@src=-x").collect()}
    expect = {r.guid for r in rows if "-x" in r.src.lower()}
    assert got == expect and got

    got2 = {
        r.guid
        for r in s_op.search_connections(idx, "@links.attributes(Color)").collect()
    }
    expect2 = {r.guid for r in rows if any(a and a.name == "color" for a in r.link_attrs)}
    assert got2 == expect2


def test_stats(spark, tables):
    st = {r.table: r.n for r in ex_op.stats(tables).collect()}
    assert st["xtargets"] == tables["xtargets"].count()
    assert set(st) == set(tables)
