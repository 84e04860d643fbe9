"""Isolate the assemble() request-stage cost at bench scale, warmed,
N repetitions — decides whether the r7 rows-localCheckpoint and branch
memoization pay off. Usage:
  python scripts/profile_requests_r07.py [n_docs] [reps] [rows_ckpt:0|1]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = 32

    from indu_doc_transformer_spark.operators import assembly as asm
    from indu_doc_transformer_spark.operators import extraction as ex
    from indu_doc_transformer_spark.plans.session import get_spark
    from indu_doc_transformer_spark.sources.corpus import corpus_df

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        app_name="profile-requests-r07",
        extra_conf={"spark.sql.files.maxPartitionBytes": "12m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="profreq_")
    corpus_df(spark, n_docs, partitions=cpus * 2).write.mode("overwrite").parquet(
        f"{workdir}/corpus"
    )
    ex.extract(spark.read.parquet(f"{workdir}/corpus")).write.mode(
        "overwrite"
    ).parquet(f"{workdir}/extracted")

    # warm: janino + python workers + branch memo
    wt = asm.assemble(
        ex.rows_table(spark.read.parquet(f"{workdir}/extracted"))
    )
    _ = wt["xtargets"].count() + wt["connections"].count()
    spark.catalog.clearCache()

    for i in range(reps):
        rows_t = ex.rows_table(spark.read.parquet(f"{workdir}/extracted"))
        t0 = time.time()
        tables = asm.assemble(rows_t)
        t1 = time.time()
        nx = tables["xtargets"].count()
        t2 = time.time()
        nc = tables["connections"].count()
        t3 = time.time()
        print(
            f"rep{i}: assemble={t1-t0:.2f}s xtargets={t2-t1:.2f}s "
            f"connections={t3-t2:.2f}s (nx={nx}, nc={nc})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
