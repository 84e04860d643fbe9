"""Dump .explain('formatted') for named queries() entries into
plans/r07/<query>_<suffix>.txt (judge evidence for OPTIMIZATION_r07.md).

Usage: python scripts/dump_plans_r07.py <suffix> <sf_dir> <query ...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from indu_doc_transformer_spark.plans.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        app_name="plans-r07",
        extra_conf={"spark.sql.files.maxPartitionBytes": "12m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    import contextlib
    import io

    for n in names:
        df = qs[n](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {n}_{suffix}.txt ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
