"""Temporal joins Spark lacks as built-ins, expressed with one window
pass instead of a range self-join.

``as_of_join``: for every left row, the most recent right row with
``right_ts <= left_ts`` within the key — the classic backward
merge-as-of. The naive formulation is a range join (left x right per
key, quadratic in hot keys); this one UNIONs the two sides, sorts once
per key, and forward-fills the right payload — one shuffle on the key,
linear work, skew-safe (a hot key costs one sorted partition, not a
quadratic blow-up). DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lo: int,
    hi: int,
    payload_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: pairs (l, r) with the same key and
    ``l.left_ts + lo <= r.right_ts <= l.left_ts + hi``.

    Naive Spark plans an inequality join as a nested-loop product per
    key; this BINS both sides by window-sized buckets (width = hi-lo)
    and equi-joins on (key, bucket) with each left row probing the two
    buckets its window can straddle, then applies the exact range
    filter — the standard scale shape for time-window joins (shuffles
    only (key, bucket), never a per-key product)."""
    width = hi - lo
    if width <= 0:
        raise ValueError("hi must be > lo")
    # floor division (NOT cast("long"), which truncates toward zero and
    # misaligns buckets for negative timestamps); each left row probes
    # its (at most two) straddled buckets — array_distinct collapses the
    # same-bucket case without deduping genuinely duplicate left rows
    l = left.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col(left_ts) + lo) / F.lit(width)).cast("long"),
                    F.floor((F.col(left_ts) + hi) / F.lit(width)).cast("long"),
                )
            )
        ),
    )
    r = right.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.col(right_ts) / F.lit(width)).cast("long").alias("_b"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    j = l.join(r, (F.col(key) == F.col("_rk")) & (l["_b"] == r["_b"]))
    return j.where(
        (F.col("_rts") >= F.col(left_ts) + lo) & (F.col("_rts") <= F.col(left_ts) + hi)
    ).select(*left.columns, F.col("_rts").alias(f"{right_ts}{suffix}"),
             *[f"{c}{suffix}" for c in payload_cols])


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (right_ts <= left_ts, ties include the
    right row). Returns every left row plus the latest right payload
    columns (null when no prior right row exists — LEFT ASOF
    semantics)."""
    lcols = left.columns
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in r.columns:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))
    # right rows sort BEFORE left rows at equal ts, so ties are visible
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward-fill ONE struct holding all payload columns: the struct is
    # non-null exactly for right rows, so a matched right row whose
    # payload VALUE is null is still the row that wins (ASOF semantics),
    # and every returned column comes from the same right row — filling
    # each column independently with last(ignorenulls) would skip null
    # payloads in favor of older rows and could mix rows across columns
    pstruct = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in payload_cols]),
    )
    filled = F.last(pstruct, ignorenulls=True).over(w)
    out = u.select(
        *lcols,
        F.col("_side"),
        *[filled.getField(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out.where(F.col("_side") == 1).drop("_side")
