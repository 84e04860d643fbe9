"""spark-submit entry point: full extraction+assembly over either the
synthetic corpus or an existing documents table.

    spark-submit --py-files dist/indu_doc_transformer_spark.zip \
        scripts/run_pipeline.py --out /tmp/out --docs 10000
    spark-submit ... scripts/run_pipeline.py --out s3://... \
        --input iceberg_catalog.db.documents --buckets 4096
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python scripts/run_pipeline.py` runs (spark-submit --py-files
# makes this a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--input", default=None, help="documents table/path; default: synthetic corpus")
    ap.add_argument("--docs", type=int, default=10_000, help="synthetic corpus size")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from indu_doc_transformer_spark.pipeline import run_full
    from indu_doc_transformer_spark.plans.session import get_spark
    from indu_doc_transformer_spark.sources.catalog import read_table
    from indu_doc_transformer_spark.sources.corpus import corpus_df

    # binary-blob scans under-parallelize at the 128m default (an
    # 800 MB corpus becomes ~7 splits); 12m keeps every core fed —
    # the same load-bearing setting bench.py uses (BENCH/BASELINE.md)
    spark = get_spark(
        master=args.master,
        app_name="indu-doc-pipeline",
        extra_conf={"spark.sql.files.maxPartitionBytes": "12m"},
    )
    docs = (
        read_table(spark, args.input)
        if args.input
        else corpus_df(spark, args.docs, partitions=args.buckets)
    )
    stats = run_full(docs, args.out, num_buckets=args.buckets)
    print(stats)
    spark.stop()


if __name__ == "__main__":
    main()
