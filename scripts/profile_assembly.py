"""Profile the assembly stage fixed cost vs data scale.

Phases measured separately:
  - plan build (Python DataFrame construction, py4j)
  - localCheckpoint materialization of reqs (optimize + janino compile
    + execute)
  - xtargets/connections counts (finisher execution)

Usage: python scripts/profile_assembly.py [n_docs] [cpus]

Measured history (this 32-core box, 10k docs):
  - single giant CASE projection: ~5-17s build + ~41s checkpoint
    (one huge janino class; too wide for whole-stage codegen)
  - per-page-type union (current): ~7s build + ~19s checkpoint
  - interpreted floor (factoryMode=NO_CODEGEN): 16s checkpoint, which
    bounds the janino-compile share of the giant CASE at ~25s
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from indu_doc_transformer_spark.operators import assembly as asm
    from indu_doc_transformer_spark.operators import extraction as ex
    from indu_doc_transformer_spark.plans.session import get_spark
    from indu_doc_transformer_spark.sources.corpus import corpus_df

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "12m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="prof_")
    corpus_df(spark, n_docs, partitions=cpus * 2).write.mode("overwrite").parquet(
        f"{workdir}/corpus"
    )
    docs = spark.read.parquet(f"{workdir}/corpus")
    ex.extract(docs).write.mode("overwrite").parquet(f"{workdir}/extracted")

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", flush=True)

    rows = ex.rows_table(spark.read.parquet(f"{workdir}/extracted")).select(
        "url", "page_no", "page_type", "footer_tags", "row_idx", "cols", "loc_repr"
    )
    a = asm.Assembler()

    t0 = time.time()
    parts = [a._branch(rows, pt) for pt in a.HANDLED_PAGE_TYPES]
    reqs_df = parts[0]
    for p in parts[1:]:
        reqs_df = reqs_df.unionByName(p)
    mark("plan_build", t0)

    t0 = time.time()
    reqs = reqs_df.localCheckpoint(eager=True)
    mark(f"reqs_checkpoint({reqs.count()})", t0)

    t0 = time.time()
    tables = a.assemble(rows)
    mark("assemble_full_plan", t0)

    t0 = time.time()
    n = tables["xtargets"].count()
    mark(f"xtargets_count({n})", t0)
    t0 = time.time()
    n = tables["connections"].count()
    mark(f"connections_count({n})", t0)

    plan = reqs_df._jdf.queryExecution().executedPlan().toString()
    print("WholeStageCodegen spans:", plan.count("WholeStageCodegen"))
    print("CodegenFallback:", "CodegenFallback" in plan)
    print("total", round(sum(t.values()), 1))
    spark.stop()


if __name__ == "__main__":
    main()
