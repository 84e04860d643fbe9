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


def _asof_union(left, right, key, left_ts, right_ts, payload_cols, suffix):
    """Shared as-of machinery: the column-aligned UNION of both sides
    (right rows sort BEFORE left rows at equal ts via _side) plus the
    payload struct that is non-null exactly for right rows."""
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
    # ONE struct holding all payload columns: a matched right row whose
    # payload VALUE is null is still the row that wins (ASOF
    # semantics), and every returned column comes from the same right
    # row — filling each column independently with last(ignorenulls)
    # would skip null payloads in favor of older rows and could mix
    # rows across columns
    pstruct = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in payload_cols]),
    )
    return u, lcols, pstruct


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
    semantics).

    Scale note: ONE window partitioned by the key — linear per key,
    never a range product, but a pathologically hot key (one entity
    owning a large share of all events) still sorts in a single task.
    For that regime use ``as_of_join_bucketed``, which spreads each
    key across time buckets (identical output; equivalence-tested)."""
    u, lcols, pstruct = _asof_union(
        left, right, key, left_ts, right_ts, payload_cols, suffix
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(pstruct, ignorenulls=True).over(w)
    out = u.select(
        *lcols,
        F.col("_side"),
        *[filled.getField(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out.where(F.col("_side") == 1).drop("_side")


def as_of_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    bucket_width: int,
    suffix: str = "_asof",
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to ``as_of_join`` but
    a hot key never sorts in one task. Both sides are binned into
    ``bucket_width``-sized time buckets; the in-bucket fill is a
    window partitioned by (key, bucket) — the hot key's rows split
    across its time range — and the cross-bucket carry (the latest
    right payload from any EARLIER bucket) is a max-struct window over
    the per-(key, bucket) aggregate table, which holds one row per
    bucket, not per event. Pick ``bucket_width`` so a single (key,
    bucket) cell fits a task at the target scale.

    Right-side ties at the same timestamp: the carry picks the max by
    (ts, payload) struct order — deterministic; the plain as_of_join's
    window is order-nondeterministic there, so (like DuckDB ASOF)
    duplicate right timestamps per key should be pre-aggregated."""
    u, lcols, pstruct = _asof_union(
        left, right, key, left_ts, right_ts, payload_cols, suffix
    )
    u = u.withColumn("_b", F.floor(F.col("_ts") / F.lit(bucket_width)).cast("long"))
    w_in = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_fill", F.last(pstruct, ignorenulls=True).over(w_in))
    # per-(key, bucket) LAST right payload, then carry = max over all
    # strictly-earlier buckets (struct ordered by ts first)
    blast = (
        u.where(F.col("_side") == 0)
        .groupBy(key, "_b")
        .agg(F.max(F.struct(F.col("_ts").alias("ts"), pstruct.alias("p"))).alias("_bl"))
    )
    bkts = u.select(key, "_b").distinct()
    w_c = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        bkts.join(blast, [key, "_b"], "left")
        .withColumn("_carry", F.max("_bl").over(w_c))
        .select(key, "_b", "_carry")
    )
    # pick the winning right ROW first (struct-level coalesce), THEN
    # extract fields: a matched right row with a null payload VALUE
    # must yield null, not fall through to an older bucket's carry
    best = F.coalesce(F.col("_fill"), F.col("_carry").getField("p"))
    out = (
        u.where(F.col("_side") == 1)
        .join(carry, [key, "_b"], "left")
        .select(
            *lcols,
            *[best.getField(c).alias(f"{c}{suffix}") for c in payload_cols],
        )
    )
    return out
