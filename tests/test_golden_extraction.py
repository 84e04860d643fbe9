"""Byte-identical extraction gate (north rule / BASELINE.md):

Committed goldens (tests/goldens/extraction_120.json) pin the
extracted_text per url. Both the pure kernel and the distributed
mapInPandas operator must reproduce them exactly — any whitespace,
normalization, or ordering drift fails here.
"""

import json
import pathlib

import pytest

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / "extraction_120.json"
N = 120


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDEN_PATH.read_text())


def test_pure_kernel_matches_golden(golden):
    from indu_doc_transformer_spark.kernels.layout import extract_document
    from indu_doc_transformer_spark.sources.corpus import generate_corpus

    for d in generate_corpus(N):
        r = extract_document(d["html"])
        g = golden[d["url"]]
        assert r["extracted_text"] == g["extracted_text"], d["url"]
        assert r["page_type"] == g["page_type"], d["url"]
        assert len(r["rows"]) == g["n_rows"], d["url"]
        assert len(r["spans"]) == g["n_spans"], d["url"]
        assert [[s, m] for s, m in r["errors"]] == g["errors"], d["url"]


def test_spark_extraction_matches_golden(spark, golden):
    from indu_doc_transformer_spark.operators import extraction as ex
    from indu_doc_transformer_spark.sources.corpus import corpus_df

    extracted = ex.extract(corpus_df(spark, N, partitions=8), num_partitions=8)
    rows = extracted.select("url", "page_type", "extracted_text").collect()
    assert len(rows) == N
    for r in rows:
        g = golden[r.url]
        assert r.extracted_text == g["extracted_text"], r.url
        assert r.page_type == g["page_type"], r.url
