"""spark-submit entry point: corpus curation funnel over a documents
table — exact dedup, Gopher quality, repetition, benchmark
decontamination — writing per-doc flags, the curated survivor corpus
(PII-scrubbed), and a one-row funnel summary.

    spark-submit --py-files dist/indu_doc_transformer_spark.zip \
        scripts/run_curation.py --input /path/documents.parquet \
        --bench /path/benchmarks.parquet --out /tmp/curated
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python scripts/run_curation.py` runs (spark-submit --py-files
# makes this a no-op)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table/path")
    ap.add_argument("--bench", required=True, help="benchmark/eval documents table/path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--contam-n", type=int, default=8)
    ap.add_argument("--contam-max", type=float, default=0.2)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from indu_doc_transformer_spark.operators import curation as cur
    from indu_doc_transformer_spark.operators import textstats as ts
    from indu_doc_transformer_spark.plans.session import get_spark
    from indu_doc_transformer_spark.sources.catalog import read_table, write_table

    spark = get_spark(master=args.master, app_name="indu-doc-curation")
    docs = read_table(spark, args.input)
    bench = read_table(spark, args.bench)
    flags = cur.curate(
        docs, bench, args.id_col, args.text_col,
        contam_n=args.contam_n, contam_max=args.contam_max,
    )
    write_table(flags, os.path.join(args.out, "flags"))
    flags_w = read_table(spark, os.path.join(args.out, "flags"))
    survivors = docs.join(
        flags_w.where(F.col("keep") == 1).select(F.col("id").alias(args.id_col)),
        args.id_col,
    ).withColumn(args.text_col, ts.pii_redact(F.col(args.text_col)))
    write_table(survivors, os.path.join(args.out, "curated"))
    write_table(cur.funnel_stats(flags_w), os.path.join(args.out, "funnel"))
    # asDict keys the summary by column NAME — a positional zip would
    # silently mislabel if funnel_stats column order ever changed
    print(read_table(spark, os.path.join(args.out, "funnel")).first().asDict())
    spark.stop()


if __name__ == "__main__":
    main()
