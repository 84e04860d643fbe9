"""Infra units: bucket registry, catalog, corpus statistics, packaging."""

import os

from pyspark.sql import functions as F


def test_bucket_registry_roundtrip(spark, tmp_path):
    from indu_doc_transformer_spark.plans.checkpoint import BucketRegistry

    reg = BucketRegistry(spark, str(tmp_path / "reg"))
    assert reg.completed() == set()
    reg.mark([0, 3])
    reg.mark([5])
    assert reg.completed() == {0, 3, 5}


def test_bucket_col_stable(spark):
    """Bucket ids are a pure function of url — stable across restarts
    (the registry contract depends on it)."""
    from indu_doc_transformer_spark.plans.checkpoint import bucket_col

    df = spark.createDataFrame([("https://a.example/1",), ("https://b.example/2",)], "url string")
    a = [r[0] for r in df.select(bucket_col(16)).collect()]
    b = [r[0] for r in df.select(bucket_col(16)).collect()]
    assert a == b
    assert all(0 <= x < 16 for x in a)


def test_catalog_roundtrip(spark, tmp_path):
    from indu_doc_transformer_spark.sources.catalog import read_table, table_exists, write_table

    p = str(tmp_path / "t")
    assert not table_exists(spark, p)
    df = spark.range(10).withColumn("k", F.col("id") % 3)
    write_table(df, p, partition_by=["k"])
    assert table_exists(spark, p)
    back = read_table(spark, p)
    assert {r.id for r in back.collect()} == set(range(10))


def test_corpus_host_skew_is_zipfish():
    """Host draw is intentionally skewed (north-rule domain skew)."""
    from collections import Counter

    from indu_doc_transformer_spark.sources.corpus import generate_doc

    hosts = Counter(generate_doc(i)["url"].split("/")[2] for i in range(500))
    top = hosts.most_common(1)[0][1]
    assert top > 500 / 50 * 3  # hottest host well above uniform share
    assert len(hosts) > 10


def test_corpus_covers_all_variants():
    from collections import Counter

    from indu_doc_transformer_spark.sources.corpus import VARIANTS, generate_doc

    variants = Counter(generate_doc(i)["url"].split("/")[3] for i in range(400))
    assert set(variants) == set(VARIANTS)


def test_package_zip_importable(tmp_path):
    import subprocess
    import sys

    from scripts.package import build

    zp = build(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from indu_doc_transformer_spark.kernels.tagparse import md5_uuid; "
        "assert md5_uuid('x')" % zp
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=str(tmp_path))
