"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir, compare row count, column names, and an order-insensitive
value multiset (stringified, floats normalized).

Usage: python scripts/validate_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def row_key(row, cols):
    d = dict(zip(cols, row))
    return tuple(norm_val(d[c]) for c in sorted(d))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the q_*_from_rows oracles template their staged-requests path from
    # this env var (default sf0.01 = the driver's sf); without it,
    # validating another sf dir would read a stale/missing staging
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb

    import __spark_entry__ as entrymod
    from indu_doc_transformer_spark.plans.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            # mimic the driver: the canonicalizer sorts every column; a
            # list/dict-typed cell is unhashable and crashes even the
            # rows-only check, so flag it here
            import numpy as np

            bad = [
                c
                for c in scols
                if len(spdf)
                and spdf[c].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any()
            ]
            if bad:
                print(f"FAIL  {name}: unhashable columns for driver canonicalizer: {bad}")
                failures.append(name)
                continue
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dcols = list(dpdf.columns)
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            ok = False
        if ok:
            # the driver hashes pandas values: an int64-vs-float64 dtype
            # split (e.g. DuckDB HUGEINT sums) hash-mismatches even when
            # stringified values agree — compare dtype kinds explicitly
            skinds = {c: spdf.dtypes[c].kind for c in scols}
            dkinds = {c: dpdf.dtypes[c].kind for c in dcols}
            mism = {c: (skinds[c], dkinds[c]) for c in skinds if skinds[c] != dkinds[c]}
            if mism:
                print(f"FAIL  {name}: pandas dtype mismatch {mism}")
                ok = False
        if ok and len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            ok = False
        if ok:
            sm = Counter(row_key(r, scols) for r in srows)
            dm = Counter(row_key(r, dcols) for r in drows)
            if sm != dm:
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                print(f"FAIL  {name}: value mismatch\n  spark-only: {diff_s}\n  duck-only:  {diff_d}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
