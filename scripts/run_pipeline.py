"""spark-submit entry point: full extraction+assembly over either the
synthetic corpus or an existing documents table.

    spark-submit --py-files dist/indu_doc_transformer_spark.zip \
        scripts/run_pipeline.py --out /tmp/out --docs 10000
    spark-submit ... scripts/run_pipeline.py --out s3://... \
        --input iceberg_catalog.db.documents --buckets 4096
"""

from __future__ import annotations

import argparse


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

    spark = get_spark(master=args.master, app_name="indu-doc-pipeline")
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
