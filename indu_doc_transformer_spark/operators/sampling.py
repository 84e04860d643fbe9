"""Source-level corpus shaping: per-source document caps and
deterministic stratified sampling — the standard Common-Crawl-pipeline
steps that bound any single domain/dump's contribution to the corpus.

Scale design: the cap is one window keyed by source. A rank-based cap
cannot be salted — all rows of a source must meet in one task, so a
source owning a large fraction of the corpus serializes that task (AQE
does NOT split window-exchange partitions, only skewed joins). If the
hot source's row count exceeds a task's comfort zone, switch to the
two-phase variant: per-source counts first, then cap by a precomputed
id threshold — a plain aggregation plus a broadcast-joined filter,
both salt-able. Sampling is stateless per-row arithmetic on an md5
hash, so it is reproducible across runs, engines, and cluster sizes —
never `rand()`, which breaks retry idempotency and oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def source_caps(
    df: DataFrame, id_col: str, source_col: str, max_per_source: int
) -> DataFrame:
    """Keep at most ``max_per_source`` documents per source, preferring
    the smallest ids (deterministic). Returns (id, source, rank, keep)."""
    w = Window.partitionBy(source_col).orderBy(id_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.row_number().over(w).cast("long").alias("rank"),
    ).withColumn("keep", (F.col("rank") <= max_per_source).cast("int"))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates_pct: dict,
    default_pct: int = 100,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: a doc survives iff
    the first 4 hex digits of md5(id) fall under its source's rate
    (percent, integer 0-100). Hash-based, so the SAME docs are sampled
    on every engine, run, and cluster size. Returns
    (id, source, bucket, keep)."""
    # md5 of the id string -> uniform 16-bit bucket 0..65535
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
                    ).cast("long")
    rate = F.lit(default_pct)
    for src, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(source_col) == src, F.lit(int(pct))).otherwise(rate)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        bucket.alias("bucket"),
    ).withColumn(
        "keep", (F.col("bucket") * 100 < rate * 65536).cast("int")
    )
