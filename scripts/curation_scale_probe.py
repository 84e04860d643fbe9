"""Curation-operator scale probe (reproducible form of the
BENCH/BASELINE.md table): replicate the sf0.1 documents table K times
with distinct ids (near-dup structure preserved per replica), then
time the heavy curation operators single-shot cold on local[32].

    python scripts/curation_scale_probe.py [replicas=20]

Prints one JSON line and a markdown row block to paste into
BENCH/BASELINE.md. Nothing here asserts — it is a measurement tool;
run on an idle box (scaling_bench's variance note applies).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from indu_doc_transformer_spark.operators import curation as cur
    from indu_doc_transformer_spark.operators import decontam as dc
    from indu_doc_transformer_spark.operators import dedup as dd
    from indu_doc_transformer_spark.operators import sampling as sp
    from indu_doc_transformer_spark.plans.session import get_spark

    spark = get_spark(
        master="local[32]", shuffle_partitions=32, app_name="curation-probe"
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = base.count()
    reps = spark.range(k).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .drop("rep")
        .repartition(64)
    )
    docs = docs.localCheckpoint(eager=True)  # materialize untimed
    n = docs.count()

    # warm python workers once (module import + Arrow serde), untimed
    from indu_doc_transformer_spark.operators import textstats as ts

    ts.top_ngram_stats(docs.limit(64), "doc_id", "text").count()

    timings = {}

    def t(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s", flush=True)

    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    t("ngram_contamination", lambda: dc.ngram_contamination(
        train, bench, "doc_id", "text", n=4).count())
    t("line_dedup", lambda: dd.line_dedup(docs, "doc_id", "text").count())
    t("source_caps", lambda: sp.source_caps(
        docs, "doc_id", "source", 15).where(F.col("keep") == 1).count())
    t("curate_funnel", lambda: cur.curate(train, bench).count())

    print(json.dumps({"replicas": k, "base_docs": n0, "docs": n,
                      "timings_sec": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
