"""Round-7 profiling harness (guide §1): isolate each heavy bench query
at the driver's measurement scale (sf1.0) with the noop sink, print
scan partition counts, and attribute sub-stage costs. NOT part of the
frozen bench contract — evidence cited in OPTIMIZATION_r07.md.

Usage: python scripts/profile_r07.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from indu_doc_transformer_spark.plans.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        app_name="profile-r07",
        extra_conf={"spark.sql.files.maxPartitionBytes": "12m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("documents", "embeddings", "lineitem", "events", "orders"):
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        print(f"scan_partitions {t}: {df.rdd.getNumPartitions()}", flush=True)

    qs = entry.queries()

    def timed(name, fn, runs=2):
        if only and name not in only:
            return
        vals = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {vals}", flush=True)

    # --- bench queries, same action as bench.py (count) ---
    for q in (
        "q_pricing_summary",
        "q_top_orders",
        "q_region_volume",
        "q_sessionize",
        "q_minhash_lsh_pairs",
        "q_ann_bruteforce",
        "q_simhash",
        "q_decontaminate",
        "q_line_dedup",
        "q_curation_funnel",
        "q_dup_span_removal",
    ):
        timed(q, lambda q=q: qs[q](spark, sf_dir).count())

    # --- sub-attribution: decontaminate ---
    from indu_doc_transformer_spark.operators.decontam import _distinct_grams

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = d.where(F.col("doc_id") % 10 != 0)
    bench = d.where(F.col("doc_id") % 10 == 0)
    timed(
        "decon.train_grams_explode",
        lambda: noop(
            train.select(
                F.col("doc_id").alias("id"),
                _distinct_grams(F.col("text"), 4).alias("grams"),
            ).select("id", F.size("grams").alias("n"), F.explode_outer("grams"))
        ),
    )
    timed(
        "decon.bench_grams_distinct",
        lambda: noop(
            bench.select(
                F.explode(_distinct_grams(F.col("text"), 4)).alias("g")
            ).distinct()
        ),
    )

    # --- sub-attribution: minhash kernel vs joins ---
    from indu_doc_transformer_spark.operators import dedup as dd

    kernel = dd._shingle_sig_udf(16, 3)
    timed(
        "minhash.kernel_only",
        lambda: noop(
            d.select(F.col("doc_id").alias("id"), kernel(F.col("text")).alias("ss"))
        ),
    )

    # --- sub-attribution: ann cosine ---
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id"), F.col("embedding").alias("v"))
    probes = base.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    scored = base.crossJoin(F.broadcast(probes)).where(
        F.col("vec_id") != F.col("probe_id")
    )
    timed(
        "ann.cosine_only",
        lambda: noop(
            scored.withColumn(
                "cos_sim", dd.embedding_cosine(F.col("pv"), F.col("v"))
            ).select("probe_id", "vec_id", "cos_sim")
        ),
    )

    # --- line_dedup sub-attribution ---
    timed(
        "linededup.structured_text_explode",
        lambda: noop(
            d.select(
                F.col("doc_id").alias("id"),
                F.posexplode(
                    F.split(entry._structured_text(), "\n")
                ).alias("pos", "line"),
            ).where(F.trim("line") != "")
        ),
    )

    spark.stop()


if __name__ == "__main__":
    main()
