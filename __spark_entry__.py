"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: full extraction+assembly over the
                     deterministic synthetic web corpus at sf0.001.
``queries()``      — one entry per implemented operator family
                     (SURVEY.md §2 + training-data-pipeline operators);
                     each callable takes (spark, sf_dir) -> DataFrame.
``oracle_sql()``   — DuckDB-equivalent SQL per query. Kernel-computed
                     VALUES (extracted text, multimodal decodes, the
                     AML byte stream) are pinned against committed
                     goldens; everything relational — including the
                     layers ABOVE the kernels (spans, metrics, search,
                     trees, lookups) — is reproduced in portable SQL
                     over staged parquet. Only x_extract_text (below
                     the cap, subsumed by q_extract_goldens) stays
                     rows-only.

The ``q_*_from_rows`` family oracles the assembly FINISHER layer
end-to-end: the Spark side stages the typed-request table to parquet
(/tmp/indu_spark_oracle/requests_<sf>, see _oracle_requests_glob)
and both engines compute the
entity tables (xtargets, connections, links, pins, lineage, attribute
registry) from that same file — pin splitting, guard filters,
completed-tag rules, and the reference's char-exploded GUID hashes are
reproduced in portable SQL.

Column aliases match between Spark and SQL exactly (the driver's
compare sorts columns by name then value-hashes). Floating-point
outputs are rounded on both sides; money sums are computed in
decimal(18,2) and cast to double at the end so both engines produce
bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from indu_doc_transformer_spark.functions.guids import md5_uuid
from indu_doc_transformer_spark.operators import dedup as dd
from indu_doc_transformer_spark.operators import similarity as sim
from indu_doc_transformer_spark.operators import textstats as ts
from indu_doc_transformer_spark.sources.corpus import corpus_df, docs_for_sf, sf_from_dir

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        # input-skew fix (optimization guide §2.5 "one huge unsplittable
        # file ... repartition immediately after the read"): the driver
        # writes these tables as ONE parquet row group, so every
        # per-row-compute-heavy query over them (gram hashing, minhash
        # signatures, cosine folds, structured-text explodes) otherwise
        # runs in a single task no matter how many cores the session
        # has (measured 28-30s single-task vs ~1s spread at sf1.0).
        # Scale-adaptive: round-robin to defaultParallelism; the tables
        # are MBs, so the one narrow exchange is microseconds. Results
        # are partition-order-invariant by construction (decimal/int
        # exact aggregates, round(6) on exact ratios, md5 min/xor).
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


_SQL_MD5_UUID = (
    "concat(substr(md5({x}),1,8),'-',substr(md5({x}),9,4),'-',"
    "substr(md5({x}),13,4),'-',substr(md5({x}),17,4),'-',substr(md5({x}),21,12))"
)


def _sql_md5_uuid(x: str) -> str:
    return _SQL_MD5_UUID.format(x=x)


_EN = "'the','and','of','to','in','is','for','with','that','are'"
_DE = "'der','die','das','und','ist','nicht','mit','ein','für','von'"

# ---------------------------------------------------------------------------
# extraction-family queries (kernel-based; rows-only correctness check)
# ---------------------------------------------------------------------------


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = min(docs_for_sf(sf_from_dir(sf_dir)), 2000)
    return corpus_df(spark, n)


# memoized per (session, sf_dir): the driver runs many x_ queries in one
# process; extraction+assembly are shared, not recomputed per query
_CACHE: dict = {}


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from indu_doc_transformer_spark.operators import extraction as ex

    key = (spark.sparkContext.applicationId, sf_dir, "extracted")
    if key not in _CACHE:
        _CACHE[key] = ex.extract(_corpus(spark, sf_dir), num_partitions=32).persist()
    return _CACHE[key]


def _entities(spark: SparkSession, sf_dir: str):
    from indu_doc_transformer_spark.operators import assembly as asm
    from indu_doc_transformer_spark.operators import extraction as ex

    key = (spark.sparkContext.applicationId, sf_dir, "entities")
    if key not in _CACHE:
        tables = asm.assemble(ex.rows_table(_extracted(spark, sf_dir)))
        # many x_ queries re-read the same entity tables (search/AML/
        # aspect-tree all join xtargets+attributes+links): persist them
        _CACHE[key] = {name: df.persist() for name, df in tables.items()}
    return _CACHE[key]


def x_extract_text(spark, sf_dir):
    return _extracted(spark, sf_dir).select("url", "page_type", "extracted_text")


def q_extract_goldens(spark, sf_dir):
    """Byte-identical extraction as a DRIVER-VISIBLE value check: the
    live kernel runs over the 120 golden documents and hashes
    extracted_text; the oracle reads the checked-in goldens file
    (captured from the reference implementation) and hashes the same
    bytes — a green hash here IS reference text parity."""
    from indu_doc_transformer_spark.operators import extraction as ex

    ext = ex.extract(corpus_df(spark, 120, partitions=8), num_partitions=8)
    return ext.select(
        "url", "page_type", F.md5("extracted_text").alias("text_md5")
    )


def _extracted_parquet(spark, sf_dir) -> str:
    """Stage the kernel extraction output once per sf dir; the span /
    metrics / error checks and their DuckDB oracles then derive from
    the SAME parquet bytes (the staged-intermediate pattern of
    _requests_parquet). The kernel VALUES themselves are pinned by
    q_extract_goldens; these oracles pin the relational layer on top."""
    import os

    name = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/indu_spark_oracle/extracted_{name}"
    key = (spark.sparkContext.applicationId, sf_dir, "extracted_pq")
    if key not in _CACHE:
        _extracted(spark, sf_dir).select(
            "url", "page_no", "page_type", "partition_id", "spans", "rows", "errors"
        ).write.mode("overwrite").parquet(path)
        _CACHE[key] = path
    return path


def x_spans(spark, sf_dir):
    """Structural spans oracled end-to-end over the staged extraction
    parquet: both engines explode the nested span array independently.
    loc is array<double>; the driver canonicalizer sorts cell values
    and cannot hash lists, so it is projected through
    floor(x*1000 + 0.5) milli-units (plain double->string rendering
    differs between the engines, and printf %.3f would too: Java
    rounds HALF_UP where DuckDB rounds half-even — floor arithmetic is
    identical IEEE on both)."""
    from indu_doc_transformer_spark.operators import extraction as ex

    ext = spark.read.parquet(_extracted_parquet(spark, sf_dir))
    return ex.spans_table(ext).withColumn(
        "loc",
        F.array_join(
            F.transform(
                "loc",
                lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long").cast("string"),
            ),
            ",",
        ),
    )


def _requests_parquet(spark, sf_dir) -> str:
    """Write the typed-request stage table once per sf dir; both the
    Spark query and the DuckDB oracle read the SAME parquet, so
    q_xtargets_from_rows oracles the finisher layer end-to-end."""
    import os

    name = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/indu_spark_oracle/requests_{name}"
    key = (spark.sparkContext.applicationId, sf_dir, "requests_pq")
    if key not in _CACHE:
        from indu_doc_transformer_spark.operators import assembly as asm
        from indu_doc_transformer_spark.operators import extraction as ex

        asm.Assembler().requests_table(
            ex.rows_table(_extracted(spark, sf_dir))
        ).write.mode("overwrite").parquet(path)
        _CACHE[key] = path
    return path


def _finisher_table(spark, sf_dir, table: str) -> DataFrame:
    """Run the God-merge finisher over the read-back staged requests —
    the same parquet the DuckDB oracle reads."""
    return _finisher_tables(spark, sf_dir)[table]


def _finisher_tables(spark, sf_dir) -> dict:
    """The full finisher table dict over the staged requests (cached:
    the search / tree / lookup checks all join several entity tables)."""
    from indu_doc_transformer_spark.operators import assembly as asm

    key = (spark.sparkContext.applicationId, sf_dir, "finisher_tables")
    if key not in _CACHE:
        reqs = spark.read.parquet(_requests_parquet(spark, sf_dir))
        _CACHE[key] = asm.Assembler().finish(reqs, persist=False)
    return _CACHE[key]


def q_connections_from_rows(spark, sf_dir):
    """A7/A8 oracled end-to-end: connection entities (guid = the
    reference's char-exploded CONN hash over role GUIDs) from the
    staged requests on BOTH engines."""
    return _finisher_table(spark, sf_dir, "connections")


def q_links_from_rows(spark, sf_dir):
    """A8/A6: link entities (LINK hash over name/pins/parent)."""
    return _finisher_table(spark, sf_dir, "links")


def q_lineage_from_rows(spark, sf_dir):
    """A10/J5: the page<->object lineage relation (xtargets,
    connections, links) distinct over pages."""
    return _finisher_table(spark, sf_dir, "lineage")


def q_attributes_from_rows(spark, sf_dir):
    """A1: the deduplicated attribute registry (SIMPLE / ROUTING_TRACKS
    / PLC_ADDRESS / PDF_LOCATION) from the staged request attr arrays."""
    return _finisher_table(spark, sf_dir, "attributes")


def q_pins_from_rows(spark, sf_dir):
    """A5: pin-chain entities with recursively defined GUIDs (child
    hashed into parent), unrolled to 4 levels in the SQL oracle (the
    corpus max depth is 2; deeper chains would fail the row-count
    check loudly rather than silently truncate)."""
    return _finisher_table(spark, sf_dir, "pins")


def q_xtargets_from_rows(spark, sf_dir):
    """A4/A9 oracled end-to-end: the xtargets finisher (pin guards,
    footer-completed tags, pin-tag prohibition, md5 GUIDs, max-priority
    merge) recomputed from the persisted requests stage table on BOTH
    engines (operators/assembly.py finish; god.py:343-396)."""
    reqs = spark.read.parquet(_requests_parquet(spark, sf_dir))

    def split_tag(col):
        pos = F.instr(col, ":")
        return F.when(pos > 0, F.substring(col, 1, pos - 1)).otherwise(col)

    def split_pin(col):
        pos = F.instr(col, ":")
        return F.when(pos > 0, F.substr(col, pos)).otherwise(F.lit(None))

    cwl = (
        reqs.where(F.col("kind") == "cwl")
        .withColumn("s_tag", split_tag(F.col("src_pin_tag")))
        .withColumn("s_pin", split_pin(F.col("src_pin_tag")))
        .withColumn("d_tag", split_tag(F.col("dst_pin_tag")))
        .withColumn("d_pin", split_pin(F.col("dst_pin_tag")))
        .withColumn("sc_tag", split_tag(F.col("src_pin_tag_c")))
        .withColumn("dc_tag", split_tag(F.col("dst_pin_tag_c")))
    )
    cwl = cwl.where(
        ~(
            F.col("s_pin").isNull() | (F.col("s_pin") == "")
            | F.col("d_pin").isNull() | (F.col("d_pin") == "")
        )
    ).where(~((F.col("s_tag") == "") | (F.col("d_tag") == "")))
    conn_all = cwl.select(
        "through_tag", "through_tag_c",
        F.col("s_tag").alias("src_tag"), F.col("sc_tag").alias("src_tag_c"),
        F.col("d_tag").alias("dst_tag"), F.col("dc_tag").alias("dst_tag_c"),
    ).unionByName(
        reqs.where(F.col("kind") == "conn").select(
            "through_tag", "through_tag_c",
            "src_tag", "src_tag_c", "dst_tag", "dst_tag_c",
        )
    )
    conn_all = conn_all.withColumn(
        "through_tag",
        F.when(F.col("through_tag") == "", None).otherwise(F.col("through_tag")),
    )

    def completed(raw, c):
        return F.when(
            F.col(raw).isNull() | F.col(raw).contains(":"), None
        ).otherwise(F.col(c))

    parts = [
        reqs.where(F.col("kind") == "xreq").select(
            completed("raw_tag", "raw_tag_c").alias("tag"),
            F.col("target_type").alias("t"),
        )
    ]
    for role, ttype in (("through", "cable"), ("src", "device"), ("dst", "device")):
        parts.append(
            conn_all.select(
                completed(f"{role}_tag", f"{role}_tag_c").alias("tag"),
                F.lit(ttype).alias("t"),
            )
        )
    xall = parts[0]
    for p in parts[1:]:
        xall = xall.unionByName(p)
    xall = xall.where(F.col("tag").isNotNull())
    pri = (
        F.when(F.col("t") == "cable", 3)
        .when(F.col("t") == "device", 2)
        .when(F.col("t") == "strip", 1)
        .otherwise(0)
    )
    name = (
        F.when(F.col("pri") == 3, "cable")
        .when(F.col("pri") == 2, "device")
        .when(F.col("pri") == 1, "strip")
        .otherwise("other")
    )
    return (
        xall.select(md5_uuid(F.col("tag")).alias("guid"), "tag", pri.alias("p"))
        .groupBy("guid")
        .agg(F.min("tag").alias("tag"), F.max("p").alias("pri"))
        .select("guid", "tag", name.alias("target_type"))
    )


def q_aspects_from_rows(spark, sf_dir):
    """A3 oracled end-to-end: the deduplicated aspect registry
    (separator, value) — tag-derived aspects (tokenizer + priority-
    slice fill, god.py:269-286) plus single-aspect requests
    (god.py:302-340) — with the full tag grammar reproduced in DuckDB
    SQL (single-char separator class, prefix rule, per-value strip,
    separator_ge empty-level fill)."""
    return _finisher_table(spark, sf_dir, "aspects")


def q_xtarget_aspects_from_rows(spark, sf_dir):
    """W3 oracled end-to-end: the xtarget<->aspect relation with
    sort_order = position in the config-ordered flattened enumeration
    (reference db_builder/db.py:222-240)."""
    return _finisher_table(spark, sf_dir, "xtarget_aspects")


def q_object_attributes_from_rows(spark, sf_dir):
    """A1 attachments oracled end-to-end: the object<->attribute
    relation over xtargets (per-role attr arrays), links, and aspects
    (god.py:237-253 attribute registry attachment)."""
    return _finisher_table(spark, sf_dir, "object_attributes")


def q_errors_from_rows(spark, sf_dir):
    """The full assembly error channel oracled end-to-end: handler row
    skips, pin/target guards, invalid-tag warnings (per distinct tag,
    min (url,page_no) attribution), and aspect parse failures
    (god.py:590-596; messages byte-identical)."""
    return _finisher_table(spark, sf_dir, "errors")


def x_metrics_errors(spark, sf_dir):
    """E1 severity rollup oracled over the staged extraction parquet
    (both engines explode + aggregate the error channel)."""
    from indu_doc_transformer_spark.operators import extraction as ex

    ext = spark.read.parquet(_extracted_parquet(spark, sf_dir))
    return ex.errors_table(ext).groupBy("severity").agg(
        F.count("*").alias("n")
    ).orderBy("severity")


def x_partition_metrics(spark, sf_dir):
    """E3 per-partition counters oracled over the staged extraction
    parquet: docs / rows / faults / unclassified per kernel partition,
    recomputed as plain aggregation on BOTH engines."""
    from indu_doc_transformer_spark.operators import extraction as ex

    ext = spark.read.parquet(_extracted_parquet(spark, sf_dir))
    return ex.partition_metrics(ext)


def x_multimodal_features(spark, sf_dir):
    """Multimodal features pinned BY VALUE: the real BMP + baseline-
    JPEG + WAV decodes (and the md5 stand-in for the stubbed codecs)
    over the deterministic synthetic media table are exact, so the
    oracle reads the committed golden (tests/goldens/
    multimodal_features.json, regenerate with scripts/
    capture_aux_goldens.py). f0 pins dimensions, f3 pins decoded PIXEL
    content (mean red — a JPEG Huffman/IDCT/color regression moves
    it). sf-independent: the media table is seeded by id, not by the
    corpus."""
    from indu_doc_transformer_spark.operators import multimodal as mm

    media = mm.synth_media_df(spark, 64)
    return mm.extract_features(media, fake=True).select(
        "media_id",
        "kind",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 3), 6).alias("f3"),
        "decode_ok",
    )


def x_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return sim.ann_lsh_topk(emb, "vec_id", "embedding", [0, 1, 2], k=5, dim=64)


def q_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN: each probe also searches every bucket at
    hamming distance 1 (bit flips), raising recall without extra hash
    tables."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.ann_lsh_topk(
        emb, "vec_id", "embedding", [0, 1, 2], k=5, dim=64, multiprobe=6
    )


def x_search_targets(spark, sf_dir):
    """F10/§3.2 oracled end-to-end: the parsed query '=F1 @type=device'
    compiles to (normalized-substring tag match AND type match) over
    the target index built from the STAGED finisher tables; the DuckDB
    oracle reproduces the xtargets entity SQL plus the same two
    predicates, so both the entity derivation and the compiled
    predicate semantics are value-checked."""
    from indu_doc_transformer_spark.operators import search as s_op

    idx = s_op.build_target_index(_finisher_tables(spark, sf_dir))
    return s_op.search_targets(idx, "=F1 @type=device")


def x_search_connections(spark, sf_dir):
    """F10 path-walk oracled end-to-end: '@links.attributes(Color)'
    compiles to EXISTS(link, map_contains_key(link.attributes,
    'color')) over the connection index; the oracle reproduces the
    link-attribute key space (SIMPLE normalized names / 'tracks' /
    PLC meta keys) from the staged requests and applies the same
    existence predicate."""
    from indu_doc_transformer_spark.operators import search as s_op

    idx = s_op.build_connection_index(_finisher_tables(spark, sf_dir))
    return s_op.search_connections(idx, "@links.attributes(Color)")


def x_aml_export(spark, sf_dir):
    """S9/A15 pinned BY VALUE: the distributed fragment write
    (write_aml_fragments: partitioned parquet + stitch-order index,
    no driver collect) runs end-to-end over the full-path entities,
    then stitch_aml_file streams the complete CAEX document and its
    md5 is compared — together with the per-(hierarchy, section)
    index rows — against the committed golden
    (tests/goldens/aml_export.json, regenerate with
    scripts/capture_aux_goldens.py when serialization intentionally
    changes). The fragment serialization itself is reference-pinned
    by tests/test_aml.py; timestamp is a parameter so the bytes are
    deterministic."""
    import hashlib
    import os

    from indu_doc_transformer_spark.operators import aml

    name = os.path.basename(sf_dir.rstrip("/"))
    out_dir = f"/tmp/indu_spark_oracle/aml_{name}"
    frags = aml.aml_fragments(_entities(spark, sf_dir))
    aml.write_aml_fragments(frags, out_dir)
    file_md5 = hashlib.md5(
        aml.stitch_aml_file(spark, out_dir).encode()
    ).hexdigest()
    idx = spark.read.parquet(os.path.join(out_dir, "aml_index"))
    return idx.select(
        "hierarchy",
        "section",
        F.col("n_fragments").cast("long").alias("n_fragments"),
        "n_targets",
        "n_aspects",
        "n_connections",
        "n_pins",
        "n_links",
        "xml_chars",
        F.col("h_order").cast("long").alias("h_order"),
        F.lit(file_md5).alias("file_md5"),
    )


def x_aspect_tree(spark, sf_dir):
    """A14 oracled end-to-end: the aspect prefix tree (manager.py
    get_tree) over the staged-requests xtargets; the DuckDB oracle
    re-derives the level columns from the tag grammar SQL (separator
    class + first-value-per-separator + empty fill collapse) and
    aggregates the same way."""
    from indu_doc_transformer_spark.operators import export as ex_op

    t = _finisher_tables(spark, sf_dir)
    return ex_op.aspect_tree(t["xtargets"]).select(
        "level1", "level2", "level3", "n", F.size("tags").alias("n_tags")
    )


def x_lineage_lookup(spark, sf_dir):
    """J5 oracled end-to-end: object -> pages reverse lookup over the
    lineage relation, both engines recomputing it from the staged
    requests (the lineage SQL of q_lineage_from_rows + the same
    count-distinct rollup)."""
    lin = _finisher_table(spark, sf_dir, "lineage")
    return (
        lin.groupBy("object_guid", "object_type")
        .agg(F.countDistinct("url").alias("n_pages"))
        .where(F.col("n_pages") > 1)
    )


# ---------------------------------------------------------------------------
# oracled queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style aggregation (A-layer baseline): decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(d("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(d("l_extendedprice")).cast("double"), 2).alias("sum_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_orders(spark, sf_dir):
    """TPC-H Q3-style 3-way join + top-k.

    Join order optimized (guide §3.1/§3.2): orders meets the BUILDING
    customer broadcast FIRST, so the relation broadcast into the
    lineitem probe is the ~5x smaller filtered order-key set and every
    lineitem row pays ONE hash probe instead of two. Decimal sum —
    result identical under any join order/partitioning. The broadcast
    is stats-GATED, not forced (the decontam rule: read Catalyst's
    estimate, never run a job at plan-build): an orders side too big
    to broadcast falls back to the original shuffle-join shape."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    try:
        est = int(
            o.select("o_orderkey", "o_custkey")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .sizeInBytes()
        )
    except Exception:  # no estimate -> fail closed to the shuffle join
        est = 1 << 62
    if est <= (512 << 20):
        of = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey).select(
            "o_orderkey"
        )
        joined = li.join(
            of.hint("broadcast"), li.l_orderkey == F.col("o_orderkey")
        )
    else:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
            c.hint("broadcast"), o.o_custkey == c.c_custkey
        )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_region_volume(spark, sf_dir):
    """TPC-H Q5-style multi-way join through the dimension chain."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(s.hint("broadcast"), li.l_suppkey == s.s_suppkey)
        .join(n.hint("broadcast"), s.s_nationkey == n.n_nationkey)
        .join(r.hint("broadcast"), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy("r_name")
    )


def q_forward_fill(spark, sf_dir):
    """T6/W1: forward fill over an ordered per-user window — 'error'
    rows inherit the previous non-error value."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(good, ignorenulls=True).over(w), 6).alias("filled_value"),
    )


def q_sessionize(spark, sf_dir):
    """T7/W2: segment detection — session id = running sum of gap>5min
    flags per user (the cable-diagram block-segmentation pattern)."""
    # events.ts is TIMESTAMP_NTZ in parquet; session tz is UTC so the
    # cast matches DuckDB's epoch_us over the naive timestamp
    ev = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flag = F.when(
        (F.col("us") - F.lag("us").over(w)) > 300_000_000, 1
    ).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # explicit bigint on BOTH engines: DuckDB sum(int) yields HUGEINT,
    # which hash-mismatches Spark's bigint in the driver's canonicalizer
    return ev.withColumn("flag", flag).select(
        "event_id",
        "user_id",
        F.sum("flag").over(wsum).cast("long").alias("session_id"),
    )


def q_asof_join(spark, sf_dir):
    """Backward as-of join (an operator Spark lacks natively): for each
    click, the most recent prior-or-simultaneous view's value per user.
    One union + one window pass — no range self-join (skew-safe at
    100 TB). DuckDB's native ASOF LEFT JOIN is the oracle."""
    from indu_doc_transformer_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "us"
    )
    # dedupe right timestamps so the as-of pick is well-defined on both
    # engines (ASOF is ambiguous across duplicate right keys)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.round(F.max("value"), 6).alias("view_value"))
    )
    out = as_of_join(clicks, views, "user_id", "us", "us", ["view_value"])
    return out.select("event_id", "user_id", F.col("view_value_asof"))


def q_asof_join_bucketed(spark, sf_dir):
    """The skew-safe bucketed as-of variant (temporal.as_of_join_
    bucketed: hot key spread across 1-hour time buckets, carry via a
    per-bucket aggregate) — IDENTICAL output to q_asof_join, checked
    against the SAME DuckDB ASOF LEFT JOIN oracle."""
    from indu_doc_transformer_spark.operators.temporal import as_of_join_bucketed

    ev = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "us"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "us")
        .agg(F.round(F.max("value"), 6).alias("view_value"))
    )
    out = as_of_join_bucketed(
        clicks, views, "user_id", "us", "us", ["view_value"],
        bucket_width=3_600_000_000,
    )
    return out.select("event_id", "user_id", F.col("view_value_asof"))


def q_range_join(spark, sf_dir):
    """Interval join (purchases within one hour after a click) via the
    binned equi-join — the scale shape for time-window joins (Spark
    would otherwise plan a nested-loop per key)."""
    from indu_doc_transformer_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "us"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "us", F.round("value", 6).alias("value")
    )
    out = range_join(
        clicks, purchases, "user_id", "us", "us", 0, 3_600_000_000, ["value"]
    )
    return out.select("event_id", "user_id", "us", "us_r", "value_r")


def q_top_customers_per_nation(spark, sf_dir):
    """W3: row_number ordering (persisted sort_order analog)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "rn")
    )


def q_rollup(spark, sf_dir):
    """A14: grouping-sets rollup over the region/nation hierarchy."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = s.join(n.hint("broadcast"), s.s_nationkey == n.n_nationkey).join(
        r.hint("broadcast"), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_suppliers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_suppliers",
        )
    )


def q_link_graph(spark, sf_dir):
    """A12: edge weights + degree sums."""
    ev = _t(spark, sf_dir, "events")
    edges = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("weight"))
    # bigint cast: same HUGEINT-vs-bigint hasher note as q_sessionize
    return edges.groupBy("user_id").agg(
        F.sum("weight").cast("long").alias("degree"), F.count("*").alias("n_types")
    )


def q_explode_product(spark, sf_dir):
    """J6: cartesian of two per-row exploded lists (';'-product analog)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_size") < 10)
    return (
        p.withColumn("w1", F.explode(F.split("p_name", " ")))
        .withColumn("w2", F.explode(F.split("p_type", " ")))
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_combos"))
    )


def q_pin_chain(spark, sf_dir):
    """F2-F4: pin strip/split + chain explosion with positions."""
    s = _t(spark, sf_dir, "supplier").withColumn(
        "pin_tag",
        F.concat(
            F.lit("-X"), F.col("s_suppkey"), F.lit(":"), F.col("s_nationkey"), F.lit(":2")
        ),
    )
    return s.select(
        "s_suppkey",
        F.substring_index("pin_tag", ":", 1).alias("base_tag"),
        F.posexplode(F.slice(F.split("pin_tag", ":"), 2, 100)).alias("pos", "pin_name"),
    )


def q_guid_hash(spark, sf_dir):
    """F8: md5-uuid content hashing (byte-identical GUID scheme)."""
    s = _t(spark, sf_dir, "supplier")
    return s.select("s_suppkey", md5_uuid(F.col("s_name")).alias("guid"))


def q_normalize(spark, sf_dir):
    """P7: normalize_string as columns."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.norm_text(F.col("text")).alias("norm_text"))


def q_word_sweep(spark, sf_dir):
    """F12: regex sweep -> explode -> distinct -> sort."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit("[a-z]{5,}"), F.lit(0))
            ).alias("word")
        )
        .distinct()
        .orderBy("word")
    )


def q_priority_merge(spark, sf_dir):
    """A4: dedup-by-guid with max-priority type upgrade."""
    li = _t(spark, sf_dir, "lineitem")
    pri = (
        F.when(F.col("l_returnflag") == "R", 3)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(1)
    )
    name = (
        F.when(F.col("pri") == 3, "R").when(F.col("pri") == 2, "A").otherwise("N")
    )
    return (
        li.select(
            md5_uuid(F.col("l_partkey").cast("string")).alias("guid"),
            pri.alias("p"),
        )
        .groupBy("guid")
        .agg(F.max("p").alias("pri"), F.count("*").alias("merged"))
        .select("guid", name.alias("merged_flag"), "merged")
    )


def q_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.ws_token_count(F.col("text")).alias("ws_tokens"),
        ts.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ts.punct_ratio(F.col("text")).alias("punct_ratio"),
        ts.stopword_ratio(F.col("text"), ts.EN_STOPWORDS).alias("stop_ratio"),
        ts.quality_score(F.col("text")).alias("quality"),
    )


def q_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.lang_id(F.col("text")).alias("pred_lang"))


def _structured_text() -> "F.Column":
    """The synthetic corpus is single-line, symbol-free prose, which
    would make the structural Gopher rules vacuously 0; derive a
    deterministic structured rendition — 3-token lines, 2-line
    (6-token) paragraphs, 'hash' -> '#' — identically on both engines
    so duplicate-line/paragraph and symbol rules carry real signal."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)

    def j3(start: "F.Column") -> "F.Column":
        return F.array_join(F.slice(toks, start, 3), " ")

    paras = F.transform(
        F.sequence(F.lit(1), F.floor((n + 5) / 6).cast("int")),
        lambda i: F.concat(j3((i - 1) * 6 + 1), F.lit("\n"), j3((i - 1) * 6 + 4)),
    )
    return F.regexp_replace(F.array_join(paras, "\n\n"), "hash", "#")


def q_gopher_rules(spark, sf_dir):
    """Full Gopher quality rule set over the structured rendition: word
    count, mean word length (x100, integer-exact), alpha-word and
    digit-word fractions, duplicate-line and duplicate-paragraph
    fractions, symbol-to-word ratio, and the folded keep decision — all
    native columns, codegen'd."""
    d = _t(spark, sf_dir, "documents").withColumn("s", _structured_text())
    t = F.col("s")
    return d.select(
        "doc_id",
        ts.ws_token_count(t).alias("n_words"),
        ts.mean_word_len_x100(t).alias("mwl_x100"),
        ts.alpha_word_ratio(t).alias("alpha_ratio"),
        ts.digit_word_ratio(t).alias("digit_ratio"),
        ts.dup_line_fraction(t).alias("dup_line_frac"),
        ts.dup_paragraph_fraction(t).alias("dup_para_frac"),
        ts.symbol_word_ratio(t).alias("symbol_ratio"),
        ts.gopher_keep(t).cast("int").alias("keep"),
    )


def q_repetition_full(spark, sf_dir):
    """The COMPLETE Gopher repetition table: top n-gram fraction for
    n in {2,3,4} plus duplicate n-gram char-coverage fraction for n in
    {5..10} (each family one zero-shuffle Arrow gram-stats kernel —
    integer numerators per doc, division/round in SQL; the pure-SQL
    explode form remains the parity oracle), folded into one
    rep_keep flag with the paper's thresholds. The corpus never repeats
    a 5-gram, so every 7th document gets a deterministic doubled
    12-token clause appended — identically on both engines — giving the
    dup rules real signal."""
    d = _t(spark, sf_dir, "documents")
    clause = F.array_join(
        F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 12), " "
    )
    d = d.withColumn(
        "s",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" "), clause, F.lit(" "), clause),
        ).otherwise(F.col("text")),
    )
    top = ts.top_ngram_stats(d, "doc_id", "s")
    dup = ts.dup_ngram_char_stats(d, "doc_id", "s")
    out = top.join(dup, "id", "left")
    for n in range(5, 11):
        out = out.withColumn(f"dup{n}_frac", F.coalesce(f"dup{n}_frac", F.lit(0.0)))
    keep = ts.repetition_keep(
        F.col("top2_frac"), F.col("top3_frac"), F.col("top4_frac")
    ) & ts.dup_ngram_keep({n: F.col(f"dup{n}_frac") for n in range(5, 11)})
    return out.withColumn("rep_keep", keep.cast("int")).withColumnRenamed(
        "id", "doc_id"
    )


def q_c4_rules(spark, sf_dir):
    """C4-style line-level filtering over the structured rendition with
    deterministic terminal punctuation ('.' appended to lines whose
    md5 starts 0-7, so the line rule carries real signal): kept-line
    count/fraction, bad-token flag, folded keep decision — all native
    higher-order expressions, no explode."""
    d = _t(spark, sf_dir, "documents").withColumn("s0", _structured_text())
    lines = F.split(F.col("s0"), "\n")
    dotted = F.transform(
        lines,
        lambda l: F.when(
            (l != "") & F.substring(F.md5(l), 1, 1).isin(*"01234567"),
            F.concat(l, F.lit(".")),
        ).otherwise(l),
    )
    d = d.withColumn("s", F.array_join(dotted, "\n"))
    t = F.col("s")
    n_lines = F.size(ts.c4_lines(t))
    n_kept = F.size(ts.c4_kept_lines(t))
    return d.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        F.when(n_lines <= 0, F.lit(0.0))
        .otherwise(F.round(n_kept / n_lines.cast("double"), 6))
        .alias("kept_frac"),
        ts.c4_bad_token(t).cast("int").alias("bad_token"),
        ts.c4_keep(t).cast("int").alias("keep"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction: deterministic synthetic PII (emails,
    IPv4, international phones derived from doc_id) is injected, then
    counted and redacted to <KIND> placeholders; the scrubbed text is
    md5'd so the oracle pins the exact redaction output."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" from 10.1."), (did % 200).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" call +4930"), F.lpad((did % 10000).cast("string"), 5, "0")),
        ).otherwise(F.lit("")),
    )
    d = d.withColumn("s", injected)
    t = F.col("s")
    return d.select(
        "doc_id",
        ts.pii_count(t, "EMAIL").alias("n_emails"),
        ts.pii_count(t, "IPV4").alias("n_ips"),
        ts.pii_count(t, "PHONE").alias("n_phones"),
        F.md5(ts.pii_redact(t)).alias("scrub_md5"),
    )


def q_token_shards(spark, sf_dir):
    """Training-shard packing via the SCALABLE two-pass prefix sum
    (parallel per-partition windows + broadcast subtotal offsets,
    textstats.token_shards_scalable) — value-identical to the
    single-window SQL oracle for any partition bounds."""
    d = _t(spark, sf_dir, "documents")
    return ts.token_shards_scalable(d, "doc_id", "text", 2000).withColumnRenamed(
        "id", "doc_id"
    )


def q_shard_manifest(spark, sf_dir):
    """Per-shard release manifest (textstats.shard_manifest): doc and
    token counts, id range, and the order-insensitive bit_xor content
    hash (60-bit md5 prefix) per 2000-token shard — the checksum file
    a training-data drop ships. Integer-exact everywhere."""
    d = _t(spark, sf_dir, "documents")
    return ts.shard_manifest(d, "doc_id", "text", 2000)


def q_temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture weights (sampling.temperature_weights
    — the T5/mT5/PaLM tau-sampling rule): per-source w ∝ n^0.7 plus
    the integer percent that feeds the deterministic md5-bucket
    sampler for a 300-doc budget."""
    from indu_doc_transformer_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    return sp.temperature_weights(d, "source", tau=0.7, budget_docs=300)


def q_corpus_report(spark, sf_dir):
    """Per-source data-card panel (textstats.corpus_report): doc/token
    counts, mean length, distinct fingerprints, exact-dup fraction —
    one map-side-combined aggregation."""
    d = _t(spark, sf_dir, "documents")
    return ts.corpus_report(d, "source", "text")


def q_dup_span_removal(spark, sf_dir):
    """ExactSubstr-style duplicated-span removal
    (dedup.duplicate_span_removal): every token covered by a 5-token
    window whose hash repeats anywhere in the corpus is cut from every
    occurrence; docs rebuilt from survivors (text_md5 pins the rebuilt
    bytes). k=5 so the synthetic boilerplate yields real spans."""
    d = _t(spark, sf_dir, "documents")
    return dd.duplicate_span_removal(d, "doc_id", "text", k=5).withColumnRenamed(
        "id", "doc_id"
    )


def q_semantic_decontam(spark, sf_dir):
    """Embedding-space decontamination (decontam.semantic_contamination
    — the paraphrase-leakage companion to q_decontaminate): embeddings
    with vec_id < 25 are the 'benchmark' set; each training embedding
    is flagged by its max cosine against any benchmark vector (0.3
    threshold tuned to the synthetic random embeddings for signal).
    Bench broadcast, map-side cross product, partial-aggregated before
    the one train-id shuffle."""
    from indu_doc_transformer_spark.operators import decontam as dc

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") < 25)
    train = emb.where(F.col("vec_id") >= 25)
    return dc.semantic_contamination(
        train, bench, "vec_id", "embedding", threshold=0.3
    ).withColumnRenamed("id", "vec_id")


def q_sequence_pack(spark, sf_dir):
    """GPT-style sequence packing (textstats.sequence_pack): docs
    concatenated in id order, chunked into 512-token sequences, docs
    splitting across boundaries — one row per (doc, sequence) slice.
    Distributed prefix sum (parallel per-partition windows + broadcast
    subtotals), native sequence() explode; the oracle is the direct
    single-window cumsum + generate_series unnest."""
    d = _t(spark, sf_dir, "documents")
    return ts.sequence_pack(d, "doc_id", "text", 512).withColumnRenamed(
        "id", "doc_id"
    )


def q_unigram_rarity(spark, sf_dir):
    """LM-style rarity scoring (textstats.unigram_rarity): corpus-wide
    unigram counts as the 'model', integer-exact per-token rarity
    floor(total*1000/count), per-doc sum + floored average."""
    d = _t(spark, sf_dir, "documents")
    return ts.unigram_rarity(d, "doc_id", "text").withColumnRenamed("id", "doc_id")


def q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ts.fingerprint(F.col("text")).alias("fp"))


def q_exact_dedup(spark, sf_dir):
    # dedup key = first 30 chars so the synthetic corpus has real groups
    d = _t(spark, sf_dir, "documents").withColumn(
        "head", F.substring("text", 1, 30)
    )
    return dd.exact_duplicates(d, "doc_id", "head")


def q_dedup_keep_list(spark, sf_dir):
    """The actual dedup filter: every doc survives except non-keeper
    members of exact-duplicate groups."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "fp", F.md5(ts.norm_text(F.substring("text", 1, 30)))
    )
    w = Window.partitionBy("fp")
    return (
        d.withColumn("keep_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id")
    )


def q_connection_guid(spark, sf_dir):
    """F8/J4 relationally: the reference's recursive connection GUID
    (char-explosion quirk) computed for synthetic supplier pairs —
    join elimination by hashing both sides."""
    from indu_doc_transformer_spark.functions.guids import connection_guid

    s = _t(spark, sf_dir, "supplier")
    pairs = s.select(
        F.col("s_suppkey").alias("a"),
        md5_uuid(F.col("s_name")).alias("src_guid"),
        md5_uuid(F.concat(F.col("s_name"), F.lit("#peer"))).alias("dst_guid"),
    )
    return pairs.select(
        "a",
        connection_guid(
            F.col("src_guid"), F.col("dst_guid"), F.lit(None).cast("string")
        ).alias("conn_guid"),
    )


def q_tumbling_counts(spark, sf_dir):
    """Event-time tumbling-window aggregation (streaming semantics in
    batch): per-hour per-type counts keyed by epoch seconds."""
    ev = _t(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "sum_value"
            ),
        )
        .select(
            F.unix_seconds(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_stream_sessionize(spark, sf_dir):
    """2.9 stateful streaming sessionizer oracled by batch equivalence:
    the applyInPandasWithState operator (streaming/stream.py:52) runs
    with Trigger.AvailableNow over the events table staged as ONE file
    (one data micro-batch). Sessions closed by a later in-stream event
    are emitted in-batch; each user's trailing session stays in the
    state store unless the post-batch watermark (max event time − 10
    min) passes its event-time timeout (last event + gap). The DuckDB
    oracle reproduces exactly that: gaps-and-islands sessions minus
    trailing sessions the watermark has not yet flushed."""
    import os
    import shutil
    import tempfile
    import uuid

    from indu_doc_transformer_spark.streaming.stream import stream_sessionize

    # one stream run per (app, sf_dir): the memory sink lives in driver
    # memory, so repeated invocations reuse the first sink instead of
    # accumulating uuid-named tables and checkpoint tempdirs
    rkey = (spark.sparkContext.applicationId, sf_dir, "stream_sess_result")
    if rkey in _CACHE:
        return spark.table(_CACHE[rkey])
    name = os.path.basename(sf_dir.rstrip("/"))
    src = f"/tmp/indu_spark_oracle/events_stream_{name}"
    key = (spark.sparkContext.applicationId, sf_dir, "events_stream")
    if key not in _CACHE:
        _t(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(src)
        _CACHE[key] = src
    qn = "stream_sess_" + uuid.uuid4().hex[:8]
    cp = tempfile.mkdtemp(prefix="stream_sess_cp_")
    q = (
        stream_sessionize(spark, src, gap_seconds=300)
        .writeStream.format("memory")
        .queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one-shot availableNow run: the checkpoint has no further use
    shutil.rmtree(cp, ignore_errors=True)
    _CACHE[rkey] = qn
    return spark.table(qn)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (n-gram overlap): every 10th document
    is the deterministic 'benchmark' set; training docs are flagged by
    the fraction of their distinct n-gram hashes that appear in it.
    n=4 here so the short synthetic docs produce partial overlaps (75
    nonzero fractions, 6 drops at sf0.01) — production uses 8-13.
    Bench grams broadcast; the 100-TB side never shuffles its gram
    explosion (operators/decontam.py)."""
    from indu_doc_transformer_spark.operators import decontam as dc

    d = _t(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 10 != 0)
    bench = d.where(F.col("doc_id") % 10 == 0)
    return dc.ngram_contamination(
        train, bench, "doc_id", "text", n=4, max_frac=0.2
    ).withColumnRenamed("id", "doc_id")


def q_line_dedup(spark, sf_dir):
    """C4-style GLOBAL line dedup over the structured rendition: each
    distinct line survives only at its first corpus-wide occurrence
    (groupBy(line) min-struct aggregate — map-side combine, no window
    on the skew-prone line key), documents rebuilt from surviving
    lines (dedup.line_dedup). Near-dup documents lose their repeated
    lines, so the check carries heavy signal."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _structured_text().alias("s")
    )
    return dd.line_dedup(d, "doc_id", "s").withColumnRenamed("id", "doc_id")


def q_url_dedup(spark, sf_dir):
    """URL canonicalization + exact URL dedup (dedup.canonical_url /
    url_dedup): deterministic messy URLs are synthesized from
    (source, doc_id) — mixed-case scheme/host, default ports,
    tracking params, fragments, trailing slashes — identically on
    both engines; docs collapsing to the same canonical URL keep the
    smallest id. doc_id%300 paths force real duplicate groups."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP://WWW."))
        .when(F.col("doc_id") % 3 == 1, F.lit("https://www."))
        .otherwise(F.lit("http://www.")),
        F.col("source"),
        F.lit(".Example.COM"),
        # %4==0 puts :80 on BOTH schemes: stripped on http (default
        # port), KEPT on https (distinct origin — the scheme-
        # conditional rule carries real signal here)
        F.when(F.col("doc_id") % 4 == 0, F.lit(":80"))
        .when(F.col("doc_id") % 12 == 1, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/p/"),
        (F.col("doc_id") % 300).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=feed&ref=1"))
        .when(F.col("doc_id") % 5 == 1, F.lit("?ref=1&utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return (
        dd.url_dedup(d.select("doc_id", url.alias("url")), "doc_id", "url")
        .withColumnRenamed("id", "doc_id")
    )


def q_url_filter(spark, sf_dir):
    """URL quality gate (dedup.url_quality): C4/RefinedWeb-style
    pre-fetch filter — bad extension, blocklist word, digit-heavy
    host, deep path, overlong url, too many query params. Messy urls
    are synthesized deterministically from (source, doc_id) with each
    modulus branch firing one rule, identically on both engines; all
    flags integer-exact 0/1. Pure codegen, zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("casino-")).otherwise(
            F.lit("www.")
        ),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                (F.col("doc_id") % 997).cast("string"),
                F.lit("9999999999999999"),
            ),
        ).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com"),
        F.when(F.col("doc_id") % 17 == 0, F.expr("repeat('/seg', 12)")).otherwise(
            F.lit("")
        ),
        F.lit("/p/"),
        (F.col("doc_id") % 300).cast("string"),
        F.when(F.col("doc_id") % 19 == 0, F.lit(".jpg")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 29 == 0, F.expr("repeat('z', 600)")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 23 == 0,
            F.lit("?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"),
        ).otherwise(F.lit("")),
    )
    return (
        dd.url_quality(d.select("doc_id", url.alias("url")), "doc_id", "url")
        .withColumnRenamed("id", "doc_id")
    )


def q_incremental_dedup(spark, sf_dir):
    """Incremental ingest dedup (dedup.incremental_exact_dedup): docs
    with id < 100 are the accumulated history (their fingerprints form
    the store); ids >= 100 are the new batch. A batch doc survives iff
    its fp is unseen in history AND it is the smallest id of its
    in-batch fp group — anti join against the store, no distinct over
    history, no reprocessing of historical text. The raw corpus has no
    exact duplicates, so content is a deterministic boilerplate page
    keyed by doc_id % 150 (identically on both engines): residues
    0..99 are history-seen, 100..149 form fresh in-batch groups —
    both drop channels carry signal, and the messy casing/whitespace
    exercises the normalization inside the fingerprint."""
    d = _t(spark, sf_dir, "documents")
    boiler = F.concat(
        F.lit("  Boilerplate\tPage "), (F.col("doc_id") % 150).cast("string")
    )
    d = d.select("doc_id", boiler.alias("s"))
    hist = d.where(F.col("doc_id") < 100)
    batch = d.where(F.col("doc_id") >= 100)
    seen = hist.select(F.md5(ts.norm_text(F.col("s"))).alias("fp"))
    return dd.incremental_exact_dedup(batch, seen, "doc_id", "s").withColumnRenamed(
        "id", "doc_id"
    )


def q_curation_funnel(spark, sf_dir):
    """The full curation composition in one job (operators/curation.py):
    exact-dedup survivor, Gopher quality, n-gram repetition, benchmark
    decontamination — per-document flag vector + folded keep. Every
    stage keeps its scale shape (fp groupBy + skew-splittable join /
    per-row expressions / zero-shuffle Arrow gram-stats kernel /
    broadcast bench join)."""
    from indu_doc_transformer_spark.operators import curation as cur

    d = _t(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 10 != 0)
    bench = d.where(F.col("doc_id") % 10 == 0)
    return cur.curate(train, bench).withColumnRenamed("id", "doc_id")


def q_minhash_signature(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sig = dd.minhash_signature(dd.word_shingles(F.col("text"), 3), 16)
    return d.select("doc_id", F.array_join(sig, ",").alias("sig"))


def q_minhash_lsh_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5
    )


def q_ngram_jaccard(spark, sf_dir):
    """Adjacent-doc 3-gram Jaccard (bounded pairwise check)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", dd.word_shingles(F.col("text"), 3).alias("sh")
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_next")
    )
    return (
        d.join(b, "doc_id")
        .select(
            "doc_id", dd.jaccard(F.col("sh"), F.col("sh_next")).alias("jaccard_next")
        )
    )


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select("doc_id", dd.simhash64(F.col("text")).alias("simhash"))


def q_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs: 16-bit prefix buckets -> self-equi-join
    -> exact hamming verify (the fingerprint-side near-dup path)."""
    d = _t(spark, sf_dir, "documents")
    return dd.simhash_near_dup_pairs(d, "doc_id", "text", 4, 6)


def q_ann_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return sim.ann_bruteforce_topk(emb, "vec_id", "embedding", [0, 1, 2], k=5)


def q_ann_ivf(spark, sf_dir):
    """IVF ANN: coarse-quantize to the nearest of 8 deterministic
    centroid cells, probe the 2 nearest cells, exact cosine re-rank.
    At 100 TB the table partitions by cell -> partition-pruned probes."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.ann_ivf_topk(
        emb, "vec_id", "embedding", [0, 1, 2], k=5, num_cells=8, nprobe=2
    )


def q_neardup_keep_list(spark, sf_dir):
    """The standard 100-TB dedup ending oracled end-to-end: MinHash-LSH
    pairs -> connected components (iterative min-label propagation, no
    driver state) -> one survivor per cluster. DuckDB oracle: the same
    pairs SQL + a recursive reachability CTE."""
    d = _t(spark, sf_dir, "documents")
    return dd.near_dup_keep_list(
        d, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5
    )


def q_source_caps(spark, sf_dir):
    """Per-source document cap (operators/sampling.py): at most 15 docs
    per source, smallest ids first — bounds any one domain/dump's
    contribution (every source has 25 docs here, so 200 of 500 flip).
    Two-phase K-smallest (salted pre-agg + broadcast top-K arrays), no
    window on the skewed source key; rank is NULL for capped-out rows
    (the oracle window reproduces exactly that)."""
    from indu_doc_transformer_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    return sp.source_caps(d, "doc_id", "source", 15).withColumnRenamed(
        "id", "doc_id"
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-source Bernoulli sampling: md5-hash buckets —
    the same docs survive on every engine/run/cluster size (never
    rand())."""
    from indu_doc_transformer_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    return sp.stratified_sample(
        d, "doc_id", "source", {"src0": 25, "src1": 50}, default_pct=75
    ).withColumnRenamed("id", "doc_id")


def q_training_mixture(spark, sf_dir):
    """The training-mixture manifest (sampling.training_mixture):
    deterministic per-source sampling at mixture weights (src0 25% /
    src1 50% / rest 75%) composed with distributed-prefix-sum shard
    packing at a 500-token budget — the final artifact a training
    pipeline ships. Oracle: the same md5-bucket predicate + cumulative
    window in DuckDB."""
    from indu_doc_transformer_spark.operators import sampling as sp

    d = _t(spark, sf_dir, "documents")
    return sp.training_mixture(
        d, "doc_id", "text", "source", {"src0": 25, "src1": 50},
        tokens_per_shard=500, default_pct=75,
    ).withColumnRenamed("id", "doc_id")


def q_multisignal_keep_list(spark, sf_dir):
    """Multi-signal dedup: LEXICAL near-dup edges (MinHash-LSH pairs)
    unioned with SEMANTIC edges (embedding hyperplane-LSH pairs over
    the aligned vec_id space) feed one connected-components pass —
    a doc is dropped if EITHER signal links it to a smaller-id doc
    (dedup.keep_list_from_edges)."""
    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = dd.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5).select(
        "id_a", "id_b"
    )
    sem = dd.embedding_near_dup_lsh(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=6, dim=64
    ).select("id_a", "id_b")
    # no dedup of the edge union: connected components is invariant
    # under duplicate edges, and a distinct would shuffle the whole
    # edge set for nothing
    edges = lex.unionByName(sem)
    return dd.keep_list_from_edges(d.select("doc_id"), edges)


def q_simhash_neardup_banded(spark, sf_dir):
    """Banded SimHash near-dup: 4 x 16-bit band buckets (vs the single
    16-bit prefix of q_simhash_neardup) — any pair within hamming 3
    shares an untouched band (pigeonhole), so recall strictly dominates
    the single-band query on the same corpus."""
    d = _t(spark, sf_dir, "documents")
    return dd.simhash_near_dup_pairs_banded(d, "doc_id", "text", bands=4, max_hamming=6)


def q_neardup_recall(spark, sf_dir):
    """Recall gate for the production embedding near-dup path: exact
    cosine pairs over a bounded id range vs the pairs the LSH bucket
    join recovers, WITHOUT and WITH hamming-1 multi-probe at the same
    plane count — one row (n_exact, n_lsh_base, n_lsh_found,
    recall_base, recall). n_lsh_found >= n_lsh_base by construction
    (the probe list contains the own bucket); the recorded delta is
    the measured recall gain of multi-probing. Breaks if
    embedding_cosine, the hyperplane bucket join, or the bit-flip
    probe expansion breaks."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    exact = dd.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, max_ids=150
    )
    lsh0 = dd.embedding_near_dup_lsh(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=6, dim=64
    ).select("id_a", "id_b", F.lit(1).alias("hit0"))
    lsh1 = dd.embedding_near_dup_lsh(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=6, dim=64,
        multiprobe=6,
    ).select("id_a", "id_b", F.lit(1).alias("hit1"))
    j = exact.join(lsh0, ["id_a", "id_b"], "left").join(
        lsh1, ["id_a", "id_b"], "left"
    )
    base = F.sum(F.coalesce(F.col("hit0"), F.lit(0)))
    found = F.sum(F.coalesce(F.col("hit1"), F.lit(0)))
    return j.agg(
        F.count("*").cast("long").alias("n_exact"),
        base.cast("long").alias("n_lsh_base"),
        found.cast("long").alias("n_lsh_found"),
        F.round(base / F.count("*"), 6).alias("recall_base"),
        F.round(found / F.count("*"), 6).alias("recall"),
    )


def q_embedding_neardup_lsh(spark, sf_dir):
    """The production near-dup path: hyperplane-LSH buckets -> bucket
    equi-join -> exact cosine verify (no all-pairs product). The 0.3
    threshold is tuned to the synthetic random embeddings so the check
    carries signal (~53 pairs at sf0.01)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dd.embedding_near_dup_lsh(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=6, dim=64
    )


def q_ann_ivf_recall(spark, sf_dir):
    """Recall@k gate for the IVF path — the q_neardup_recall pattern
    applied to ann_ivf_topk (similarity.py:203): exact brute-force
    cosine top-5 per probe vs the nprobe=2/8-cell IVF top-5, one row
    (n_probes, n_exact, n_found, recall). A quantizer regression (cell
    assignment order, probe-cell list, the nearest-cell tie-break)
    moves recall and fails the value hash loudly — the same regression
    alarm the LSH path has had since r3."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 9, 17]
    exact = sim.ann_bruteforce_topk(emb, "vec_id", "embedding", probes, k=5)
    ivf = sim.ann_ivf_topk(
        emb, "vec_id", "embedding", probes, k=5, num_cells=8, nprobe=2
    )
    hit = ivf.select("probe_id", "vec_id", F.lit(1).alias("hit"))
    j = exact.select("probe_id", "vec_id").join(
        hit, ["probe_id", "vec_id"], "left"
    )
    found = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return j.agg(
        F.countDistinct("probe_id").cast("long").alias("n_probes"),
        F.count("*").cast("long").alias("n_exact"),
        found.cast("long").alias("n_found"),
        F.round(found / F.count("*"), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extract+assemble at sf0.001, returns xtargets."""
    from indu_doc_transformer_spark.operators import assembly as asm
    from indu_doc_transformer_spark.operators import extraction as ex

    docs = corpus_df(spark, 100)
    extracted = ex.extract(docs, num_partitions=8)
    tables = asm.assemble(ex.rows_table(extracted))
    return tables["xtargets"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver records the FIRST 50 entries (its record cap); order
    is therefore deliberate. Positions 1-50 carry one check per unique
    operator family: the golden-text parity check, the 10 end-to-end
    finisher oracles, streaming, the relational/temporal layer, text
    quality, the bucketed dedup/ANN production paths (via the recall
    gates, which execute BOTH the exact and approximate sides), the
    round-5 LLM-pipeline operators (span removal, sequence packing,
    semantic decontam, temperature mixture, corpus report), and the
    formerly-rows-only x-checks — ALL of which now carry full value
    oracles (staged-parquet SQL reproductions for spans / metrics /
    search / tree / lookup, committed goldens for the AML byte stream
    and multimodal features). Entries BELOW the cap marker are green
    oracled demonstrators whose operators are already pinned by a
    stronger recorded entry (noted inline); they still run under
    ``scripts/validate_entry.py`` (no name args = all queries), which
    is executed each round — nothing here is silently unvalidated."""
    return {
        # reference text parity (oracled against the checked-in goldens)
        "q_extract_goldens": q_extract_goldens,
        # assembly finishers oracled end-to-end over the staged requests
        "q_xtargets_from_rows": q_xtargets_from_rows,
        "q_connections_from_rows": q_connections_from_rows,
        "q_links_from_rows": q_links_from_rows,
        "q_pins_from_rows": q_pins_from_rows,
        "q_attributes_from_rows": q_attributes_from_rows,
        "q_lineage_from_rows": q_lineage_from_rows,
        "q_aspects_from_rows": q_aspects_from_rows,
        "q_xtarget_aspects_from_rows": q_xtarget_aspects_from_rows,
        "q_object_attributes_from_rows": q_object_attributes_from_rows,
        "q_errors_from_rows": q_errors_from_rows,
        # streaming (oracled)
        "q_stream_sessionize": q_stream_sessionize,
        # relational / temporal operator layer (oracled)
        "q_top_orders": q_top_orders,
        "q_forward_fill": q_forward_fill,
        "q_sessionize": q_sessionize,
        "q_asof_join": q_asof_join,
        "q_range_join": q_range_join,
        "q_top_customers_per_nation": q_top_customers_per_nation,
        "q_rollup": q_rollup,
        "q_link_graph": q_link_graph,
        # text analysis (oracled)
        "q_quality": q_quality,
        "q_gopher_rules": q_gopher_rules,
        "q_repetition_full": q_repetition_full,
        "q_c4_rules": q_c4_rules,
        "q_pii_scrub": q_pii_scrub,
        "q_token_shards": q_token_shards,
        # dedup / decontamination family (oracled)
        "q_dedup_keep_list": q_dedup_keep_list,
        "q_line_dedup": q_line_dedup,
        "q_decontaminate": q_decontaminate,
        "q_curation_funnel": q_curation_funnel,
        "q_minhash_lsh_pairs": q_minhash_lsh_pairs,
        "q_simhash_neardup_banded": q_simhash_neardup_banded,
        "q_neardup_keep_list": q_neardup_keep_list,
        "q_neardup_recall": q_neardup_recall,
        # similarity search (oracled); q_ann_ivf_recall executes BOTH
        # the brute-force and the IVF paths and value-pins recall@5
        "q_ann_ivf_recall": q_ann_ivf_recall,
        "q_ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        # round-5 LLM-pipeline operators (oracled at 2 scales)
        "q_dup_span_removal": q_dup_span_removal,
        "q_sequence_pack": q_sequence_pack,
        "q_semantic_decontam": q_semantic_decontam,
        "q_temperature_mixture": q_temperature_mixture,
        "q_corpus_report": q_corpus_report,
        # historic x_ names — every one now carries a full value oracle
        # (round-4 sweep: staged-parquet SQL or committed golden)
        "x_spans": x_spans,
        "x_metrics_errors": x_metrics_errors,
        "x_partition_metrics": x_partition_metrics,
        "x_multimodal_features": x_multimodal_features,
        "x_search_targets": x_search_targets,
        "x_search_connections": x_search_connections,
        "x_aml_export": x_aml_export,
        "x_aspect_tree": x_aspect_tree,
        "x_lineage_lookup": x_lineage_lookup,
        # ---- driver record cap (50) reached: entries below are green
        # oracled queries either superseded by a stronger recorded check
        # (noted inline) or late additions that no longer fit the cap;
        # ALL of them run under scripts/validate_entry.py each round ----
        "q_pricing_summary": q_pricing_summary,  # decimal-exact agg ⊂ q_top_orders (r6 demotion)
        "q_token_counts": q_token_counts,  # ⊂ q_token_shards (r6 demotion)
        "q_embedding_neardup_lsh": q_embedding_neardup_lsh,  # ⊂ q_neardup_recall, which runs the LSH path twice (r6 demotion)
        "q_ann_bruteforce": q_ann_bruteforce,  # ⊂ q_ann_ivf_recall (computes the exact side) (r6 demotion)
        "q_ann_ivf": q_ann_ivf,  # ⊂ q_ann_ivf_recall (computes the IVF side) (r6 demotion)
        "x_ann_lsh": x_ann_lsh,  # ⊂ q_ann_lsh_multiprobe (r6 demotion)
        "q_source_caps": q_source_caps,  # per-source quota (late addition)
        "q_url_dedup": q_url_dedup,  # URL canonicalization + dedup (late addition)
        "q_url_filter": q_url_filter,  # C4/RefinedWeb URL quality gate (r6 late addition; the pure-codegen rule-flag SHAPE is recorded via q_gopher_rules/q_c4_rules — the url-specific regex content is pinned by validate_entry at 2 scales each round)
        "q_shard_manifest": q_shard_manifest,  # per-shard release manifest (r6 late addition; packing ⊂ recorded q_token_shards, manifest agg pinned by validate_entry at 2 scales)
        "q_incremental_dedup": q_incremental_dedup,  # ingest-vs-history dedup (late addition)
        "q_asof_join_bucketed": q_asof_join_bucketed,  # skew-safe as-of ⊂ q_asof_join oracle
        "q_training_mixture": q_training_mixture,  # sampling∘sharding composition (late addition)
        "q_stratified_sample": q_stratified_sample,  # deterministic sampling (late addition)
        "q_langid": q_langid,  # stopword machinery ⊂ q_quality
        "q_unigram_rarity": q_unigram_rarity,  # quality-family extension of q_quality
        "q_tumbling_counts": q_tumbling_counts,  # event-time windowing ⊂ q_stream_sessionize
        "q_connection_guid": q_connection_guid,  # char-exploded hash ⊂ q_connections_from_rows
        "q_multisignal_keep_list": q_multisignal_keep_list,  # lex ∪ sem edges ⊂ recorded pair families
        "q_fingerprint": q_fingerprint,  # md5-uuid ⊂ every from_rows hash
        "q_simhash": q_simhash,  # signature SQL ⊂ q_simhash_neardup_banded
        "q_region_volume": q_region_volume,  # broadcast-chain ⊂ q_top_orders + plan test
        "q_exact_dedup": q_exact_dedup,  # ⊂ q_dedup_keep_list
        "q_minhash_signature": q_minhash_signature,  # pinned inside q_minhash_lsh_pairs
        "q_ngram_jaccard": q_ngram_jaccard,  # verify stage of q_minhash_lsh_pairs
        "q_simhash_neardup": q_simhash_neardup,  # single band ⊂ banded
        "q_explode_product": q_explode_product,  # ⊂ q_connections_from_rows
        "q_pin_chain": q_pin_chain,  # ⊂ q_pins_from_rows
        "q_guid_hash": q_guid_hash,  # ⊂ every from_rows hash
        "q_normalize": q_normalize,  # ⊂ q_fingerprint
        "q_word_sweep": q_word_sweep,  # regex sweep ⊂ q_gopher_rules tokens
        "q_priority_merge": q_priority_merge,  # ⊂ q_xtargets_from_rows
        "x_extract_text": x_extract_text,  # ⊂ q_extract_goldens (value-hashed)
    }


# DuckDB oracle SQL. Shared fragments:
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
# DuckDB mirror of _structured_text() (3-token lines, 6-token
# paragraphs, hash->#) — ONE definition shared by every oracle that
# needs the rendition, so a change can't silently diverge per-oracle.
# Expects a `toks` column in scope.
_RENDITION = """replace(
                       array_to_string(
                         list_transform(
                           generate_series(1, cast(floor((len(toks) + 5) / 6.0) as int)),
                           i -> coalesce(array_to_string(list_slice(toks, (i-1)*6+1, (i-1)*6+3), ' '), '')
                                || chr(10) ||
                                coalesce(array_to_string(list_slice(toks, (i-1)*6+4, (i-1)*6+6), ' '), '')),
                         chr(10) || chr(10)),
                       'hash', '#')"""
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len({t}) - 2, 1)),"
    " i -> array_to_string(list_slice({t}, i, i + 2), ' ')))"
).format(t="regexp_split_to_array(" + _NORM + ", ' ')")
_SIG = (
    "list_transform(generate_series(1,16), seed ->"
    " list_min(list_transform(sh, s -> md5(cast(seed as varchar) || ':' || s))))"
)
_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> cast({a}[i] as double) * cast({b}[i] as double)))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})), 6)"
    )


def _charjoin(x: str) -> str:
    """':'.join(characters) — RE2 has no lookbehind, so char-split via
    regexp_extract_all (the reference's list += str GUID quirk)."""
    return f"array_to_string(regexp_extract_all({x}, '.'), ':')"


def _guarded_md5(x: str) -> str:
    """NULL-propagating md5-uuid: DuckDB concat() SKIPS null arguments
    (unlike Spark's), so a bare _sql_md5_uuid(NULL) would yield '----'."""
    return f"CASE WHEN {x} IS NULL THEN NULL ELSE {_sql_md5_uuid(x)} END"


def _oracle_requests_glob() -> str:
    """The staged-requests parquet the DuckDB oracles read. Templated
    from SPARK_GRAFT_ORACLE_SF_DIR (set by scripts/validate_entry.py to
    its sf dir) so validating a non-default sf never reads a stale
    sf0.01 staging; the driver calls oracle_sql() without the env var
    and gets the sf0.01 default it runs at. The Spark side re-stages
    (mode=overwrite) once per process, so within any one run both
    engines always see the same bytes."""
    return f"/tmp/indu_spark_oracle/requests_{_oracle_sf_name()}/*.parquet"


def _oracle_sf_name() -> str:
    """sf directory basename the oracles are being validated at (see
    _oracle_requests_glob for the env-var contract)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "sf0.01")
    return os.path.basename(sf_dir.rstrip("/"))


def _oracle_extracted_glob() -> str:
    """The staged extraction parquet (see _extracted_parquet) the
    span/metrics/error oracles read — same templating contract as
    _oracle_requests_glob."""
    return f"/tmp/indu_spark_oracle/extracted_{_oracle_sf_name()}/*.parquet"


# shared finisher CTE over the staged requests parquet (see
# q_xtargets_from_rows): reproduces pin splitting, guards, completed
# tags, and the reference's char-exploded CONN/LINK hashes in SQL
def _split(col: str, part: str) -> str:
    if part == "tag":
        return (
            f"CASE WHEN strpos({col}, ':') > 0 "
            f"THEN substr({col}, 1, strpos({col}, ':') - 1) ELSE {col} END"
        )
    return (
        f"CASE WHEN strpos({col}, ':') > 0 "
        f"THEN substr({col}, strpos({col}, ':')) ELSE NULL END"
    )


def _pin_guid_sql(name: str, child: str) -> str:
    """connection.py:93-106 pin GUID: PIN:name:chars(role):chars(child
    or CHILD:None):chars(link)."""
    child_part = (
        "'CHILD:None'"
        if child == "NULL"
        else f"coalesce({_charjoin(child)}, 'CHILD:None')"
    )
    return _sql_md5_uuid(
        f"concat('PIN:', {name}, ':', {_charjoin('role')}, ':', "
        f"{child_part}, ':', {_charjoin('link_guid')})"
    )


_FINISHER_CTE_TEMPLATE = f"""
    WITH reqs AS (
      SELECT * FROM read_parquet('{{glob}}')
    ),
    cwl0 AS (
      SELECT url, page_no, through_tag, through_tag_c,
             {_split('src_pin_tag', 'tag')} AS src_tag,
             {_split('src_pin_tag', 'pin')} AS src_pin,
             {_split('dst_pin_tag', 'tag')} AS dst_tag,
             {_split('dst_pin_tag', 'pin')} AS dst_pin,
             {_split('src_pin_tag_c', 'tag')} AS src_tag_c,
             {_split('dst_pin_tag_c', 'tag')} AS dst_tag_c,
             loc_attrs, link_attrs
      FROM reqs WHERE kind = 'cwl'
    ),
    conn_all AS (
      SELECT url, page_no,
             CASE WHEN through_tag = '' THEN NULL ELSE through_tag END AS through_tag,
             through_tag_c, src_tag, src_tag_c, dst_tag, dst_tag_c,
             src_pin, dst_pin, TRUE AS with_link,
             -- cwl connections attribute loc_attrs to the through role
             -- (assembly.py cwl_conn: loc_attrs AS through_attrs)
             loc_attrs AS through_attrs_x, loc_attrs, link_attrs
      FROM cwl0
      WHERE NOT (src_pin IS NULL OR src_pin = '' OR dst_pin IS NULL OR dst_pin = '')
        AND NOT (src_tag = '' OR dst_tag = '')
      UNION ALL
      SELECT url, page_no,
             CASE WHEN through_tag = '' THEN NULL ELSE through_tag END,
             through_tag_c, src_tag, src_tag_c, dst_tag, dst_tag_c,
             NULL, NULL, FALSE,
             through_attrs, loc_attrs, link_attrs
      FROM reqs WHERE kind = 'conn'
    ),
    compl AS (
      SELECT *,
        CASE WHEN through_tag IS NULL OR strpos(through_tag, ':') > 0
             THEN NULL ELSE through_tag_c END AS through_completed,
        CASE WHEN src_tag IS NULL OR strpos(src_tag, ':') > 0
             THEN NULL ELSE src_tag_c END AS src_completed,
        CASE WHEN dst_tag IS NULL OR strpos(dst_tag, ':') > 0
             THEN NULL ELSE dst_tag_c END AS dst_completed
      FROM conn_all
    ),
    role_guids AS (
      SELECT *,
        {_guarded_md5('through_completed')} AS through_guid,
        {_guarded_md5('src_completed')} AS src_guid,
        {_guarded_md5('dst_completed')} AS dst_guid
      FROM compl
    ),
    conn AS (
      SELECT *,
        {_sql_md5_uuid(
            "concat('CONN:', "
            "CASE WHEN src_guid IS NULL THEN 'SRC:None' ELSE " + _charjoin('src_guid') + " END, ':', "
            "CASE WHEN dst_guid IS NULL THEN 'DEST:None' ELSE " + _charjoin('dst_guid') + " END, ':', "
            "CASE WHEN through_guid IS NULL THEN 'THROUGH:None' ELSE " + _charjoin('through_guid') + " END)"
        )} AS conn_guid
      FROM role_guids
    ),
    linked AS (
      SELECT *, coalesce(through_tag, 'virtual_link') AS link_name
      FROM conn WHERE with_link
    ),
    link_g AS (
      SELECT *,
        {_sql_md5_uuid(
            "concat('LINK:', link_name, ':', "
            "CASE WHEN src_pin IS NULL OR src_pin = '' THEN 'SRC:None' ELSE "
            + _charjoin("concat('SRC:', src_pin)") + " END, ':', "
            "CASE WHEN dst_pin IS NULL OR dst_pin = '' THEN 'DEST:None' ELSE "
            + _charjoin("concat('DEST:', dst_pin)") + " END, ':', "
            + _charjoin('conn_guid') + ")"
        )} AS link_guid
      FROM linked
    )
"""


def _finisher_cte() -> str:
    """The finisher CTE bound to the CURRENT oracle staging glob (env-
    templated; .replace not .format — the SQL body contains braces)."""
    return _FINISHER_CTE_TEMPLATE.replace("{glob}", _oracle_requests_glob())


# --- the tag grammar in SQL (kernels/tagparse.py try_parse_tag /
# tag_parts with DEFAULT_ASPECTS): all six separators are single chars,
# so tokenization = a char-class regex; a tag parses iff it has >=1
# separator match AND no text before the first one; values are the
# trimmed slices between matches; tag_parts extends the parsed map with
# empty levels for every separator of higher priority than the lowest
# one present (separator_ge), and the EMPTY string parses to all-empty
# levels (try_parse('') == {} -> separator_ge over no keys == all).
_SEPC = "[-=+:/&]"
_SEPL = "['=','+','-',':','/','&']"
_SEP_IDX = (
    "CASE {s} WHEN '=' THEN 0 WHEN '+' THEN 1 WHEN '-' THEN 2 "
    "WHEN ':' THEN 3 WHEN '/' THEN 4 WHEN '&' THEN 5 END"
)

_PARSE_CTE = f"""
    , xrows AS (
      SELECT url, page_no,
             CASE WHEN raw_tag IS NULL OR strpos(raw_tag, ':') > 0
                  THEN NULL ELSE raw_tag_c END AS tag
      FROM reqs WHERE kind = 'xreq'
      UNION ALL SELECT url, page_no, through_completed FROM compl
      UNION ALL SELECT url, page_no, src_completed FROM compl
      UNION ALL SELECT url, page_no, dst_completed FROM compl
    ),
    dtags AS (
      SELECT tag, url AS at_url, page_no AS at_page FROM (
        SELECT tag, url, page_no,
               row_number() OVER (PARTITION BY tag ORDER BY url, page_no) AS rn
        FROM xrows WHERE tag IS NOT NULL
      ) WHERE rn = 1
    ),
    tparse AS (
      SELECT tag, at_url, at_page, t2,
             regexp_extract_all(t2, '{_SEPC}') AS seps,
             list_transform(
               list_slice(regexp_split_to_array(t2, '{_SEPC}'), 2, 100000),
               x -> trim(x)) AS vals,
             (len(regexp_extract_all(t2, '{_SEPC}')) > 0
              AND regexp_split_to_array(t2, '{_SEPC}')[1] = '') AS matched
      FROM (
        SELECT tag, at_url, at_page,
               trim(CASE WHEN strpos(tag, ':') > 0
                         THEN substr(tag, 1, strpos(tag, ':') - 1)
                         ELSE tag END) AS t2
        FROM dtags)
    ),
    tvalid AS (
      SELECT *,
             CASE WHEN t2 = '' THEN 5
                  ELSE list_max(list_transform(seps, s -> {_SEP_IDX.format(s='s')}))
             END AS lowest
      FROM tparse WHERE matched OR t2 = ''
    ),
    areq AS (
      SELECT url, page_no, raw_tag, attrs,
             trim(coalesce(raw_tag, '')) AS t2a
      FROM reqs WHERE kind = 'aspect'
    ),
    aclass AS (
      SELECT url, page_no, raw_tag, attrs,
             CASE WHEN NOT (len(aseps) > 0 AND asplit[1] = '') THEN 1
                  WHEN len(aseps) != 1 THEN 2 ELSE 0 END AS status,
             CASE WHEN len(aseps) = 1 AND asplit[1] = '' THEN aseps[1] END AS asep,
             CASE WHEN len(aseps) = 1 AND asplit[1] = '' THEN trim(asplit[2]) END AS avalue
      FROM (
        SELECT *, regexp_extract_all(t2a, '{_SEPC}') AS aseps,
               regexp_split_to_array(t2a, '{_SEPC}') AS asplit
        FROM areq)
    )
"""


# the lineage relation (q_lineage_from_rows) as a reusable CTE so the
# reverse-lookup check derives from the same SQL
_LINEAGE_CTE = f"""
    , xreq_x AS (
      SELECT url, page_no,
             CASE WHEN raw_tag IS NULL OR strpos(raw_tag, ':') > 0
                  THEN NULL ELSE raw_tag_c END AS completed
      FROM reqs WHERE kind = 'xreq'
    ),
    lin AS (
      SELECT DISTINCT url, page_no, object_guid, object_type FROM (
        SELECT url, page_no, {_sql_md5_uuid('completed')} AS object_guid,
               'xtarget' AS object_type
        FROM xreq_x WHERE completed IS NOT NULL
        UNION ALL
        SELECT url, page_no, through_guid, 'xtarget' FROM role_guids
        WHERE through_guid IS NOT NULL
        UNION ALL
        SELECT url, page_no, src_guid, 'xtarget' FROM role_guids
        WHERE src_guid IS NOT NULL
        UNION ALL
        SELECT url, page_no, dst_guid, 'xtarget' FROM role_guids
        WHERE dst_guid IS NOT NULL
        UNION ALL
        SELECT url, page_no, conn_guid, 'connection' FROM conn
        UNION ALL
        SELECT url, page_no, link_guid, 'link' FROM link_g
      )
    )
"""


def oracle_sql() -> dict[str, str]:
    d = {
        # the goldens file pins extracted_text captured from the
        # reference; hashing it on the DuckDB side makes byte-identical
        # extraction a value-level driver check
        "q_extract_goldens": """
            WITH j AS (
              SELECT json(content) AS doc
              FROM read_text('/root/repo/tests/goldens/extraction_120.json')
            ),
            k AS (SELECT unnest(json_keys(doc)) AS url, doc FROM j)
            SELECT url,
                   json_extract_string(doc, '$."' || url || '".page_type') AS page_type,
                   md5(json_extract_string(doc, '$."' || url || '".extracted_text')) AS text_md5
            FROM k
        """,
        "q_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(cast(sum(cast(l_quantity as decimal(18,2))) as double), 2) AS sum_qty,
                   round(cast(sum(cast(l_extendedprice as decimal(18,2))) as double), 2) AS sum_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_top_orders": """
            SELECT o_orderkey,
                   round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "q_region_volume": """
            SELECT r_name,
                   round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double), 4) AS revenue
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q_forward_fill": """
            SELECT event_id, user_id,
                   round(last_value(CASE WHEN event_type != 'error' THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value
            FROM events
        """,
        "q_sessionize": """
            WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS us FROM events
            ), f AS (
              SELECT event_id, user_id, us,
                     CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 300000000
                          THEN 1 ELSE 0 END AS flag
              FROM e
            )
            SELECT event_id, user_id,
                   cast(sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
            FROM f
        """,
        "q_asof_join": """
            WITH clicks AS (
              SELECT event_id, user_id, epoch_us(ts) AS us
              FROM events WHERE event_type = 'click'
            ),
            views AS (
              SELECT user_id, epoch_us(ts) AS us, round(max(value), 6) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY 1, 2
            )
            SELECT c.event_id, c.user_id, v.view_value AS view_value_asof
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.us >= v.us
        """,
        "q_range_join": """
            WITH e AS (
              SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value
              FROM events
            )
            SELECT c.event_id, c.user_id, c.us AS us,
                   p.us AS us_r, round(p.value, 6) AS value_r
            FROM (SELECT * FROM e WHERE event_type = 'click') c
            JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id
             AND p.us BETWEEN c.us AND c.us + 3600000000
        """,
        "q_top_customers_per_nation": """
            SELECT c_nationkey, c_custkey, rn FROM (
              SELECT c_nationkey, c_custkey,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer) WHERE rn <= 3
        """,
        "q_rollup": """
            SELECT coalesce(r_name, 'ALL') AS region,
                   coalesce(n_name, 'ALL') AS nation,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "q_link_graph": """
            WITH edges AS (
              SELECT user_id, event_type, count(*) AS weight
              FROM events GROUP BY user_id, event_type
            )
            SELECT user_id, cast(sum(weight) as bigint) AS degree, count(*) AS n_types
            FROM edges GROUP BY user_id
        """,
        "q_explode_product": """
            SELECT p_partkey, count(*) AS n_combos
            FROM (
              SELECT p_partkey
              FROM part,
                   unnest(regexp_split_to_array(p_name, ' ')) AS t1(w1),
                   unnest(regexp_split_to_array(p_type, ' ')) AS t2(w2)
              WHERE p_size < 10
            ) GROUP BY p_partkey
        """,
        "q_pin_chain": """
            WITH s AS (
              SELECT s_suppkey,
                     '-X' || s_suppkey || ':' || s_nationkey || ':2' AS pin_tag
              FROM supplier
            ), parts AS (
              SELECT s_suppkey,
                     split_part(pin_tag, ':', 1) AS base_tag,
                     list_slice(regexp_split_to_array(pin_tag, ':'), 2, 100000) AS pins
              FROM s
            )
            SELECT s_suppkey, base_tag, i - 1 AS pos, pins[i] AS pin_name
            FROM parts, unnest(generate_series(1, len(pins))) AS g(i)
        """,
        "q_guid_hash": f"""
            SELECT s_suppkey, {_sql_md5_uuid("s_name")} AS guid FROM supplier
        """,
        "q_normalize": f"""
            SELECT doc_id, {_NORM} AS norm_text FROM documents
        """,
        "q_word_sweep": """
            SELECT DISTINCT unnest(regexp_extract_all(text, '[a-z]{5,}')) AS word
            FROM documents ORDER BY word
        """,
        "q_priority_merge": f"""
            WITH g AS (
              SELECT {_sql_md5_uuid("cast(l_partkey as varchar)")} AS guid,
                     CASE l_returnflag WHEN 'R' THEN 3 WHEN 'A' THEN 2 ELSE 1 END AS p
              FROM lineitem
            )
            SELECT guid,
                   CASE max(p) WHEN 3 THEN 'R' WHEN 2 THEN 'A' ELSE 'N' END AS merged_flag,
                   count(*) AS merged
            FROM g GROUP BY guid
        """,
        "q_token_counts": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
            FROM documents
        """,
        "q_quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                     len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS np,
                     {_TOKS} AS toks
              FROM documents
            )
            SELECT doc_id,
                   round(np / cast(length(text) as double), 6) AS punct_ratio,
                   round(len(list_filter(toks, x -> x in ({_EN}))) / cast(len(toks) as double), 6) AS stop_ratio,
                   cast(least(length(text), 500) * 2 * 4
                        + (1000 - least(cast(floor(np * 4000.0 / length(text)) as bigint), 1000)) * 3
                        + least(cast(floor(len(list_filter(toks, x -> x in ({_EN}))) * 5000.0 / len(toks)) as bigint), 1000) * 3
                        as bigint) AS quality
            FROM t
        """,
        "q_langid": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CASE WHEN len(list_filter(toks, x -> x in ({_DE})))
                             > len(list_filter(toks, x -> x in ({_EN})))
                        THEN 'de' ELSE 'en' END AS pred_lang
            FROM t
        """,
        "q_gopher_rules": f"""
            WITH t0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s0 AS (
              SELECT doc_id,
                     {_RENDITION} AS s
              FROM t0
            ),
            m AS (
              SELECT doc_id, s,
                     regexp_split_to_array(lower(trim(s)), '\\s+') AS stoks,
                     list_filter(list_transform(regexp_split_to_array(s, '\\n'), x -> trim(x)), x -> x != '') AS lines,
                     list_filter(list_transform(regexp_split_to_array(s, '\\n{{2,}}'), x -> trim(x)), x -> x != '') AS paras
              FROM s0
            ),
            r AS (
              SELECT doc_id,
                     len(stoks) AS n_words,
                     cast(floor(list_sum(list_transform(stoks, x -> length(x))) * 100.0 / len(stoks)) as bigint) AS mwl_x100,
                     round(len(list_filter(stoks, x -> regexp_matches(x, '[a-z]'))) / cast(len(stoks) as double), 6) AS alpha_ratio,
                     round(len(list_filter(stoks, x -> regexp_matches(x, '^[0-9]+$'))) / cast(len(stoks) as double), 6) AS digit_ratio,
                     CASE WHEN len(lines) <= 0 THEN 0.0
                          ELSE round((len(lines) - len(list_distinct(lines))) / cast(len(lines) as double), 6) END AS dup_line_frac,
                     CASE WHEN len(paras) <= 0 THEN 0.0
                          ELSE round((len(paras) - len(list_distinct(paras))) / cast(len(paras) as double), 6) END AS dup_para_frac,
                     round(len(regexp_extract_all(s, '\\.{{3}}|[#…]')) / cast(len(stoks) as double), 6) AS symbol_ratio
              FROM m
            )
            SELECT doc_id, n_words, mwl_x100, alpha_ratio, digit_ratio,
                   dup_line_frac, dup_para_frac, symbol_ratio,
                   CASE WHEN n_words >= 5 AND mwl_x100 <= 1000 AND alpha_ratio >= 0.6
                             AND dup_line_frac <= 0.3 AND dup_para_frac <= 0.3
                             AND symbol_ratio <= 0.1
                        THEN 1 ELSE 0 END AS keep
            FROM r
        """,
        "q_repetition_full": f"""
            WITH s0 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' ' || clause || ' ' || clause
                          ELSE text END AS s
              FROM (
                SELECT doc_id, text,
                       array_to_string(list_slice({_TOKS}, 1, 12), ' ') AS clause
                FROM documents
              )
            ),
            t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(s)), '\\s+') AS toks
              FROM s0
            ),
            base AS (
              SELECT doc_id, cast(len(toks) as bigint) AS ntok, toks
              FROM t WHERE len(toks) >= 2
            ),
            g AS (
              SELECT doc_id, ntok, n,
                     unnest(list_transform(generate_series(1, ntok - (n - 1)),
                                           i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))) AS gram
              FROM base, (SELECT unnest([2, 3, 4]) AS n) ns
              WHERE ntok >= n
            ),
            c AS (
              SELECT doc_id, ntok, n, gram, count(*) AS cnt
              FROM g GROUP BY doc_id, ntok, n, gram
            ),
            top AS (
              SELECT doc_id, ntok, n, max(cnt) AS top_cnt
              FROM c GROUP BY doc_id, ntok, n
            ),
            p AS (
              SELECT doc_id,
                     round(coalesce(max(CASE WHEN n = 2 THEN top_cnt / cast(ntok - 1 as double) END), 0.0), 6) AS top2_frac,
                     round(coalesce(max(CASE WHEN n = 3 THEN top_cnt / cast(ntok - 2 as double) END), 0.0), 6) AS top3_frac,
                     round(coalesce(max(CASE WHEN n = 4 THEN top_cnt / cast(ntok - 3 as double) END), 0.0), 6) AS top4_frac
              FROM top GROUP BY doc_id
            ),
            db AS (
              SELECT doc_id,
                     cast(length(array_to_string(toks, ' ')) as bigint) AS chars, n,
                     unnest(list_transform(generate_series(1, len(toks) - (n - 1)),
                                           i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))) AS gram
              FROM t, (SELECT unnest([5, 6, 7, 8, 9, 10]) AS n) ns2
              WHERE len(toks) >= 5 AND len(toks) >= n
            ),
            dc AS (SELECT doc_id, chars, n, gram, count(*) AS cnt FROM db GROUP BY ALL),
            dd AS (
              SELECT doc_id, chars, n,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dup_chars
              FROM dc GROUP BY ALL
            ),
            dp AS (
              SELECT doc_id,
                     round(coalesce(max(CASE WHEN n = 5 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup5_frac,
                     round(coalesce(max(CASE WHEN n = 6 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup6_frac,
                     round(coalesce(max(CASE WHEN n = 7 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup7_frac,
                     round(coalesce(max(CASE WHEN n = 8 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup8_frac,
                     round(coalesce(max(CASE WHEN n = 9 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup9_frac,
                     round(coalesce(max(CASE WHEN n = 10 THEN least(1.0, dup_chars / cast(chars as double)) END), 0.0), 6) AS dup10_frac
              FROM dd GROUP BY doc_id
            )
            SELECT p.doc_id, top2_frac, top3_frac, top4_frac,
                   coalesce(dup5_frac, 0.0) AS dup5_frac,
                   coalesce(dup6_frac, 0.0) AS dup6_frac,
                   coalesce(dup7_frac, 0.0) AS dup7_frac,
                   coalesce(dup8_frac, 0.0) AS dup8_frac,
                   coalesce(dup9_frac, 0.0) AS dup9_frac,
                   coalesce(dup10_frac, 0.0) AS dup10_frac,
                   CASE WHEN top2_frac <= 0.2 AND top3_frac <= 0.18 AND top4_frac <= 0.16
                             AND coalesce(dup5_frac, 0.0) <= 0.15
                             AND coalesce(dup6_frac, 0.0) <= 0.14
                             AND coalesce(dup7_frac, 0.0) <= 0.13
                             AND coalesce(dup8_frac, 0.0) <= 0.12
                             AND coalesce(dup9_frac, 0.0) <= 0.11
                             AND coalesce(dup10_frac, 0.0) <= 0.10
                        THEN 1 ELSE 0 END AS rep_keep
            FROM p LEFT JOIN dp ON p.doc_id = dp.doc_id
        """,
        "q_fingerprint": f"""
            SELECT doc_id, {_sql_md5_uuid(_NORM)} AS fp FROM documents
        """,
        "q_unigram_rarity": f"""
            WITH e AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
            ),
            c AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
            tot AS (SELECT cast(sum(cnt) as bigint) AS total FROM c),
            r AS (
              SELECT e.doc_id,
                     cast(floor(tot.total * 1000 / c.cnt) as bigint) AS rarity
              FROM e JOIN c USING (tok), tot
            )
            SELECT doc_id,
                   cast(count(*) as bigint) AS n_toks,
                   cast(sum(rarity) as bigint) AS rarity_sum,
                   cast(floor(sum(rarity) / count(*)) as bigint) AS rarity_avg
            FROM r GROUP BY doc_id
        """,
        "q_token_shards": """
            WITH t AS (
              SELECT doc_id,
                     cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   cast(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000.0) as bigint) AS shard_id
            FROM t
        """,
        "q_shard_manifest": """
            WITH t AS (
              SELECT doc_id,
                     cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS n_tokens,
                     cast('0x' || substr(md5(cast(doc_id as varchar) || ':' || text), 1, 15) as bigint) AS h
              FROM documents
            ),
            s AS (
              SELECT doc_id, n_tokens, h,
                     cast(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000.0) as bigint) AS shard_id
              FROM t
            )
            SELECT shard_id,
                   cast(count(*) as bigint) AS n_docs,
                   cast(sum(n_tokens) as bigint) AS n_tokens,
                   min(doc_id) AS first_id,
                   max(doc_id) AS last_id,
                   cast(bit_xor(h) as bigint) AS content_hash
            FROM s GROUP BY shard_id
        """,
        "q_temperature_mixture": """
            WITH a AS (SELECT source, cast(count(*) as bigint) AS n_docs
                       FROM documents GROUP BY source),
            p AS (SELECT source, n_docs,
                         pow(cast(n_docs as double), 0.7) AS pp FROM a),
            t AS (SELECT sum(pp) AS tot FROM p)
            SELECT source, n_docs, round(pp / tot, 6) AS weight,
                   cast(least(100, round(100.0 * 300 * pp / tot / n_docs))
                        as int) AS rate_pct
            FROM p CROSS JOIN t
        """,
        "q_corpus_report": f"""
            WITH b AS (
              SELECT source,
                     cast(len(regexp_split_to_array(trim(text), '\\s+'))
                          as bigint) AS n,
                     md5({_NORM}) AS fp
              FROM documents
            )
            SELECT source, cast(count(*) as bigint) AS n_docs,
                   cast(sum(n) as bigint) AS total_tokens,
                   round(avg(n), 6) AS mean_tokens,
                   cast(count(DISTINCT fp) as bigint) AS n_distinct,
                   round(1.0 - count(DISTINCT fp) / count(*), 6)
                     AS exact_dup_frac
            FROM b GROUP BY source
        """,
        "q_dup_span_removal": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ),
            w AS (
              SELECT doc_id, i AS start,
                     md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h
              FROM t, unnest(generate_series(1, len(toks) - 4)) AS g(i)
              WHERE len(toks) >= 5
            ),
            duph AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
            fl AS (
              SELECT doc_id, list(start) AS starts
              FROM w WHERE h IN (SELECT h FROM duph) GROUP BY doc_id
            ),
            j AS (
              SELECT t.doc_id, toks,
                     coalesce(fl.starts, []) AS starts
              FROM t LEFT JOIN fl ON t.doc_id = fl.doc_id
            ),
            kept AS (
              SELECT doc_id, toks, starts,
                     list_filter(
                       list_transform(generate_series(1, len(toks)),
                                      i -> {'pos': i, 't': toks[i]}),
                       s -> len(list_filter(starts,
                              st -> st <= s.pos AND s.pos < st + 5)) = 0
                     ) AS kt
              FROM j
            )
            SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
                   cast(len(toks) - len(kt) as bigint) AS n_removed,
                   md5(coalesce(
                     array_to_string(list_transform(kt, s -> s.t), ' '), ''))
                     AS text_md5
            FROM kept
        """,
        "q_semantic_decontam": f"""
            WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
            b AS (SELECT v AS bv FROM e WHERE vec_id < 25),
            t AS (SELECT vec_id, v AS tv FROM e WHERE vec_id >= 25),
            m AS (
              SELECT vec_id, max({_cos("tv", "bv")}) AS mx
              FROM t CROSS JOIN b GROUP BY vec_id
            )
            SELECT vec_id, round(mx, 6) AS max_cos_sim,
                   CASE WHEN mx >= 0.3 THEN 0 ELSE 1 END AS keep
            FROM m
        """,
        "q_sequence_pack": """
            WITH t AS (
              SELECT doc_id,
                     cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     cast(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                          as bigint) - n_tokens AS s
              FROM t WHERE n_tokens > 0
            ),
            e AS (
              SELECT doc_id, n_tokens, s, s + n_tokens AS e,
                     unnest(generate_series(
                       cast(floor(s / 512.0) as bigint),
                       cast(floor((s + n_tokens - 1) / 512.0) as bigint))) AS seq_id
              FROM c
            )
            SELECT doc_id, n_tokens, cast(seq_id as bigint) AS seq_id,
                   cast(greatest(s, seq_id * 512) - seq_id * 512 as bigint) AS seq_offset,
                   cast(greatest(s, seq_id * 512) - s as bigint) AS doc_offset,
                   cast(least(e, (seq_id + 1) * 512) - greatest(s, seq_id * 512)
                        as bigint) AS slice_len
            FROM e
        """,
        "q_c4_rules": f"""
            WITH t0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s0 AS (
              SELECT doc_id,
                     {_RENDITION} AS s0
              FROM t0
            ),
            d AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(regexp_split_to_array(s0, '\\n'),
                         l -> CASE WHEN l != '' AND substr(md5(l), 1, 1)
                                        IN ('0','1','2','3','4','5','6','7')
                                   THEN l || '.' ELSE l END),
                       chr(10)) AS s
              FROM s0
            ),
            m AS (
              SELECT doc_id, s,
                     list_filter(list_transform(regexp_split_to_array(s, '\\n'), x -> trim(x)), x -> x != '') AS lines
              FROM d
            ),
            r AS (
              SELECT doc_id,
                     cast(len(lines) as int) AS n_lines,
                     cast(len(list_filter(lines,
                         l -> regexp_matches(l, '[.!?\"]$')
                              AND len(regexp_split_to_array(l, '\\s+')) >= 3)) as int) AS n_kept,
                     CASE WHEN contains(lower(s), '{{') OR contains(lower(s), 'lorem ipsum')
                               OR contains(lower(s), 'javascript') THEN 1 ELSE 0 END AS bad_token
              FROM m
            )
            SELECT doc_id, n_lines, n_kept,
                   CASE WHEN n_lines <= 0 THEN 0.0
                        ELSE round(n_kept / cast(n_lines as double), 6) END AS kept_frac,
                   bad_token,
                   CASE WHEN n_kept >= 3
                             AND (CASE WHEN n_lines <= 0 THEN 0.0
                                       ELSE n_kept / cast(n_lines as double) END) >= 0.5
                             AND bad_token = 0
                        THEN 1 ELSE 0 END AS keep
            FROM r
        """,
        "q_pii_scrub": """
            WITH d AS (
              SELECT doc_id,
                     text ||
                     CASE WHEN doc_id % 3 = 0 THEN ' contact user' || cast(doc_id as varchar) || '@example.com' ELSE '' END ||
                     CASE WHEN doc_id % 5 = 0 THEN ' from 10.1.' || cast(doc_id % 200 as varchar) || '.7' ELSE '' END ||
                     CASE WHEN doc_id % 7 = 0 THEN ' call +4930' || lpad(cast(doc_id % 10000 as varchar), 5, '0') ELSE '' END AS s
              FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                   len(regexp_extract_all(s, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
                   len(regexp_extract_all(s, '\\+\\d{7,15}')) AS n_phones,
                   md5(regexp_replace(regexp_replace(regexp_replace(s,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'),
                       '\\+\\d{7,15}', '<PHONE>', 'g')) AS scrub_md5
            FROM d
        """,
        "q_line_dedup": f"""
            WITH t0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s0 AS (
              SELECT doc_id,
                     {_RENDITION} AS s
              FROM t0
            ),
            l AS (
              SELECT doc_id, u.pos - 1 AS pos, u.line
              FROM s0,
                   unnest(list_transform(regexp_split_to_array(s, '\\n'),
                                         (x, i) -> struct_pack(line := x, pos := i))) AS t(u)
              WHERE trim(u.line) != ''
            ),
            f AS (
              SELECT doc_id, pos, line,
                     row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM l
            )
            SELECT doc_id, cast(count(*) as bigint) AS n_lines,
                   md5(array_to_string(list(line ORDER BY pos), chr(10))) AS text_md5
            FROM f WHERE rn = 1 GROUP BY doc_id
        """,
        "q_curation_funnel": f"""
            WITH tr AS (
              SELECT doc_id, text, {_TOKS} AS toks
              FROM documents WHERE doc_id % 10 != 0
            ),
            ded AS (
              SELECT doc_id,
                     CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY {_sql_md5_uuid(_NORM)})
                          THEN 1 ELSE 0 END AS dedup_keep
              FROM tr
            ),
            gop AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 5
                          AND cast(floor(list_sum(list_transform(toks, x -> length(x))) * 100.0 / len(toks)) as bigint) <= 1000
                          AND round(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / cast(len(toks) as double), 6) >= 0.6
                          AND (CASE WHEN len(lines) <= 0 THEN 0.0
                                    ELSE round((len(lines) - len(list_distinct(lines))) / cast(len(lines) as double), 6) END) <= 0.3
                          AND (CASE WHEN len(paras) <= 0 THEN 0.0
                                    ELSE round((len(paras) - len(list_distinct(paras))) / cast(len(paras) as double), 6) END) <= 0.3
                          AND round(len(regexp_extract_all(text, '\\.{{3}}|[#…]')) / cast(len(toks) as double), 6) <= 0.1
                          THEN 1 ELSE 0 END AS gopher_keep
              FROM (
                SELECT doc_id, text, toks,
                       list_filter(list_transform(regexp_split_to_array(text, '\\n'), x -> trim(x)), x -> x != '') AS lines,
                       list_filter(list_transform(regexp_split_to_array(text, '\\n{{2,}}'), x -> trim(x)), x -> x != '') AS paras
                FROM tr
              )
            ),
            rg AS (
              SELECT doc_id, cast(len(toks) as bigint) AS ntok, n,
                     unnest(list_transform(generate_series(1, len(toks) - (n - 1)),
                                           i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))) AS gram
              FROM tr, (SELECT unnest([2, 3, 4]) AS n) ns
              WHERE len(toks) >= n
            ),
            rc AS (SELECT doc_id, ntok, n, gram, count(*) AS cnt FROM rg GROUP BY ALL),
            rt AS (SELECT doc_id, ntok, n, max(cnt) AS top_cnt FROM rc GROUP BY ALL),
            rep AS (
              SELECT doc_id,
                     CASE WHEN round(coalesce(max(CASE WHEN n = 2 THEN top_cnt / cast(ntok - 1 as double) END), 0.0), 6) <= 0.2
                           AND round(coalesce(max(CASE WHEN n = 3 THEN top_cnt / cast(ntok - 2 as double) END), 0.0), 6) <= 0.18
                           AND round(coalesce(max(CASE WHEN n = 4 THEN top_cnt / cast(ntok - 3 as double) END), 0.0), 6) <= 0.16
                          THEN 1 ELSE 0 END AS rep_keep
              FROM rt GROUP BY doc_id
            ),
            ag AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(toks) >= 4 THEN
                       list_transform(generate_series(1, len(toks) - 3),
                         i -> md5(array_to_string(list_slice(toks, i, i + 3), ' ')))
                       ELSE CAST([] AS VARCHAR[]) END) AS grams
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            ),
            bgr AS (SELECT DISTINCT unnest(grams) AS gram FROM ag WHERE doc_id % 10 = 0),
            hits AS (
              SELECT e.doc_id, count(*) AS nc
              FROM (SELECT doc_id, unnest(grams) AS gram FROM ag WHERE doc_id % 10 != 0) e
              JOIN bgr USING (gram) GROUP BY e.doc_id
            ),
            dec AS (
              SELECT ag.doc_id,
                     CASE WHEN (CASE WHEN len(ag.grams) <= 0 THEN 0.0
                                     ELSE round(coalesce(hits.nc, 0) / cast(len(ag.grams) as double), 6) END) <= 0.2
                          THEN 1 ELSE 0 END AS decon_keep
              FROM ag LEFT JOIN hits ON ag.doc_id = hits.doc_id
              WHERE ag.doc_id % 10 != 0
            )
            SELECT ded.doc_id, ded.dedup_keep, gop.gopher_keep,
                   coalesce(rep.rep_keep, 1) AS rep_keep,
                   coalesce(dec.decon_keep, 1) AS decon_keep,
                   CASE WHEN ded.dedup_keep = 1 AND gop.gopher_keep = 1
                             AND coalesce(rep.rep_keep, 1) = 1
                             AND coalesce(dec.decon_keep, 1) = 1
                        THEN 1 ELSE 0 END AS keep
            FROM ded
            JOIN gop ON ded.doc_id = gop.doc_id
            LEFT JOIN rep ON ded.doc_id = rep.doc_id
            LEFT JOIN dec ON ded.doc_id = dec.doc_id
        """,
        "q_decontaminate": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(toks) >= 4 THEN
                       list_transform(generate_series(1, len(toks) - 3),
                         i -> md5(array_to_string(list_slice(toks, i, i + 3), ' ')))
                       ELSE CAST([] AS VARCHAR[]) END) AS grams
              FROM t
            ),
            train AS (SELECT doc_id, grams FROM g WHERE doc_id % 10 != 0),
            bench AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 10 = 0
            ),
            hits AS (
              SELECT e.doc_id, count(*) AS n_contaminated
              FROM (SELECT doc_id, unnest(grams) AS gram FROM train) e
              JOIN bench USING (gram)
              GROUP BY e.doc_id
            ),
            m AS (
              SELECT train.doc_id,
                     cast(len(train.grams) as int) AS n_grams,
                     cast(coalesce(hits.n_contaminated, 0) as bigint) AS n_contaminated,
                     CASE WHEN len(train.grams) <= 0 THEN 0.0
                          ELSE round(coalesce(hits.n_contaminated, 0)
                                     / cast(len(train.grams) as double), 6) END AS contam_frac
              FROM train LEFT JOIN hits ON train.doc_id = hits.doc_id
            )
            SELECT doc_id, n_grams, n_contaminated, contam_frac,
                   CASE WHEN contam_frac <= 0.2 THEN 1 ELSE 0 END AS keep
            FROM m
        """,
        "q_dedup_keep_list": """
            WITH d AS (
              SELECT doc_id,
                     md5(lower(trim(regexp_replace(substr(text,1,30), '\\s+', ' ', 'g')))) AS fp
              FROM documents
            )
            SELECT doc_id FROM (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM d
            ) WHERE doc_id = keep_id
        """,
        "q_connection_guid": f"""
            WITH pairs AS (
              SELECT s_suppkey AS a,
                     {_sql_md5_uuid("s_name")} AS src_guid,
                     {_sql_md5_uuid("s_name || '#peer'")} AS dst_guid
              FROM supplier
            )
            SELECT a,
                   {_sql_md5_uuid(
                       "concat('CONN:', "
                       "array_to_string(regexp_extract_all(src_guid, '.'), ':'), ':', "
                       "array_to_string(regexp_extract_all(dst_guid, '.'), ':'), ':', "
                       "'THROUGH:None')"
                   )} AS conn_guid
            FROM pairs
        """,
        "q_tumbling_counts": """
            SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS bucket_start,
                   event_type, count(*) AS n,
                   round(cast(sum(cast(value as decimal(18,4))) as double), 4) AS sum_value
            FROM events GROUP BY bucket_start, event_type
        """,
        # batch-equivalence oracle for the stateful streaming operator:
        # in-batch-closed sessions plus trailing sessions whose
        # event-time timeout (last event + 300s) precedes the post-batch
        # watermark (global max event time - 10 min). Integer // floor
        # is safe here (bigint // int, all values positive).
        "q_stream_sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
            f AS (
              SELECT user_id, us,
                     CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 300000000
                          THEN 1 ELSE 0 END AS flag
              FROM e
            ),
            s AS (
              SELECT user_id, us,
                     sum(flag) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
              FROM f
            ),
            sess AS (
              SELECT user_id, sid,
                     min(us) AS session_start_us, max(us) AS session_end_us,
                     cast(count(*) as int) AS n_events,
                     max(sid) OVER (PARTITION BY user_id) AS msid
              FROM s GROUP BY user_id, sid
            )
            SELECT user_id, session_start_us, session_end_us, n_events
            FROM sess
            WHERE sid < msid
               OR (session_end_us // 1000 + 300000)
                  < (SELECT max(epoch_us(ts)) // 1000 - 600000 FROM events)
        """,
        "q_exact_dedup": """
            SELECT md5(lower(trim(regexp_replace(substr(text,1,30), '\\s+', ' ', 'g')))) AS fp,
                   count(*) AS dup_count, min(doc_id) AS keep_id
            FROM documents GROUP BY fp HAVING count(*) > 1
        """,
        "q_minhash_signature": f"""
            WITH t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents)
            SELECT doc_id, array_to_string({_SIG}, ',') AS sig FROM t
        """,
        "q_minhash_lsh_pairs": f"""
            WITH t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
            sigs AS (SELECT doc_id, sh, {_SIG} AS sig FROM t),
            buckets AS (
              SELECT doc_id, sh, j AS band,
                     md5(cast(j as varchar) || '|' ||
                         array_to_string(list_slice(sig, j*4+1, j*4+4), ',')) AS bucket
              FROM sigs, unnest(generate_series(0,3)) AS g(j)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.sh AS sh_a, b.sh AS sh_b
              FROM buckets a JOIN buckets b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b,
                   round(len(list_intersect(sh_a, sh_b)) /
                         cast(len(list_distinct(list_concat(sh_a, sh_b))) as double), 6) AS jaccard_sim
            FROM cand
            WHERE len(list_intersect(sh_a, sh_b)) /
                  cast(len(list_distinct(list_concat(sh_a, sh_b))) as double) >= 0.5
        """,
        "q_ngram_jaccard": f"""
            WITH t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents)
            SELECT a.doc_id AS doc_id,
                   round(len(list_intersect(a.sh, b.sh)) /
                         cast(len(list_distinct(list_concat(a.sh, b.sh))) as double), 6) AS jaccard_next
            FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        """,
        "q_simhash": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform(list_distinct(regexp_split_to_array({_NORM}, ' ')), x -> md5(x)) AS hx
              FROM documents WHERE doc_id < 100
            ), bits AS (
              SELECT doc_id,
                     list_transform(generate_series(0,63), p ->
                       CASE WHEN list_sum(list_transform(hx, h ->
                         CASE WHEN cast(floor((strpos('0123456789abcdef', substr(h, cast(floor(p/4) as int) + 1, 1)) - 1)
                                    / power(2, 3 - (p % 4))) as int) % 2 = 1
                              THEN 1 ELSE -1 END)) > 0
                       THEN 1 ELSE 0 END) AS b
              FROM t
            )
            SELECT doc_id,
                   array_to_string(list_transform(generate_series(0,15), g ->
                     substr('0123456789abcdef',
                            cast(b[g*4+1]*8 + b[g*4+2]*4 + b[g*4+3]*2 + b[g*4+4] + 1 as int), 1)), '') AS simhash
            FROM bits
        """,
        "q_simhash_neardup": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform(list_distinct(regexp_split_to_array({_NORM}, ' ')), x -> md5(x)) AS hx
              FROM documents
            ), bits AS (
              SELECT doc_id,
                     list_transform(generate_series(0,63), p ->
                       CASE WHEN list_sum(list_transform(hx, h ->
                         CASE WHEN cast(floor((strpos('0123456789abcdef', substr(h, cast(floor(p/4) as int) + 1, 1)) - 1)
                                    / power(2, 3 - (p % 4))) as int) % 2 = 1
                              THEN 1 ELSE -1 END)) > 0
                       THEN 1 ELSE 0 END) AS b
              FROM t
            ), sh AS (
              SELECT doc_id,
                     array_to_string(list_transform(generate_series(0,15), g ->
                       substr('0123456789abcdef',
                              cast(b[g*4+1]*8 + b[g*4+2]*4 + b[g*4+3]*2 + b[g*4+4] + 1 as int), 1)), '') AS simhash
              FROM bits
            ),
            cand AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.simhash AS sa, b.simhash AS sb
              FROM sh a JOIN sh b
                ON substr(a.simhash,1,4) = substr(b.simhash,1,4)
               AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, hamming FROM (
              SELECT id_a, id_b,
                cast(list_sum(list_transform(generate_series(1,16), i ->
                  bit_count(xor(strpos('0123456789abcdef', substr(sa,i,1)) - 1,
                                strpos('0123456789abcdef', substr(sb,i,1)) - 1)))) as bigint) AS hamming
              FROM cand
            ) WHERE hamming <= 6
        """,
        "q_simhash_neardup_banded": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform(list_distinct(regexp_split_to_array({_NORM}, ' ')), x -> md5(x)) AS hx
              FROM documents
            ), bits AS (
              SELECT doc_id,
                     list_transform(generate_series(0,63), p ->
                       CASE WHEN list_sum(list_transform(hx, h ->
                         CASE WHEN cast(floor((strpos('0123456789abcdef', substr(h, cast(floor(p/4) as int) + 1, 1)) - 1)
                                    / power(2, 3 - (p % 4))) as int) % 2 = 1
                              THEN 1 ELSE -1 END)) > 0
                       THEN 1 ELSE 0 END) AS b
              FROM t
            ), sh AS (
              SELECT doc_id,
                     array_to_string(list_transform(generate_series(0,15), g ->
                       substr('0123456789abcdef',
                              cast(b[g*4+1]*8 + b[g*4+2]*4 + b[g*4+3]*2 + b[g*4+4] + 1 as int), 1)), '') AS simhash
              FROM bits
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.simhash AS sa, b.simhash AS sb
              FROM sh a JOIN sh b
                ON a.doc_id < b.doc_id
               AND (substr(a.simhash,1,4)  = substr(b.simhash,1,4)
                 OR substr(a.simhash,5,4)  = substr(b.simhash,5,4)
                 OR substr(a.simhash,9,4)  = substr(b.simhash,9,4)
                 OR substr(a.simhash,13,4) = substr(b.simhash,13,4))
            )
            SELECT id_a, id_b, hamming FROM (
              SELECT id_a, id_b,
                cast(list_sum(list_transform(generate_series(1,16), i ->
                  bit_count(xor(strpos('0123456789abcdef', substr(sa,i,1)) - 1,
                                strpos('0123456789abcdef', substr(sb,i,1)) - 1)))) as bigint) AS hamming
              FROM cand
            ) WHERE hamming <= 6
        """,
        "q_ann_bruteforce": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            probes AS (SELECT vec_id AS probe_id, v AS pv FROM base WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT probe_id, vec_id, {_cos("pv", "v")} AS cos_sim
              FROM base, probes WHERE vec_id != probe_id
            )
            SELECT probe_id, vec_id, cos_sim, rank FROM (
              SELECT probe_id, vec_id, cos_sim,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 5
        """,
        "q_neardup_keep_list": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
            sigs AS (SELECT doc_id, sh, {_SIG} AS sig FROM t),
            buckets AS (
              SELECT doc_id, sh, j AS band,
                     md5(cast(j as varchar) || '|' ||
                         array_to_string(list_slice(sig, j*4+1, j*4+4), ',')) AS bucket
              FROM sigs, unnest(generate_series(0,3)) AS g(j)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.sh AS sh_a, b.sh AS sh_b
              FROM buckets a JOIN buckets b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            ),
            pairs AS (
              SELECT id_a, id_b FROM cand
              WHERE len(list_intersect(sh_a, sh_b)) /
                    cast(len(list_distinct(list_concat(sh_a, sh_b))) as double) >= 0.5
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT a, a AS lbl FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.a
            ),
            comp AS (SELECT a AS id, min(lbl) AS comp FROM reach GROUP BY a)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != comp)
        """,
        "q_source_caps": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents
            )
            SELECT doc_id, source,
                   CASE WHEN rn <= 15 THEN cast(rn as bigint) END AS rank,
                   CASE WHEN rn <= 15 THEN 1 ELSE 0 END AS keep
            FROM r
        """,
        "q_stratified_sample": """
            WITH b AS (
              SELECT doc_id, source,
                     cast(list_sum(list_transform(generate_series(1, 4), i ->
                       (strpos('0123456789abcdef',
                               substr(md5(cast(doc_id as varchar)), i, 1)) - 1)
                       * (CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256 WHEN 3 THEN 16 ELSE 1 END)))
                       as bigint) AS bucket
              FROM documents
            )
            SELECT doc_id, source, bucket,
                   CASE WHEN bucket * 100 <
                             (CASE source WHEN 'src0' THEN 25 WHEN 'src1' THEN 50 ELSE 75 END) * 65536
                        THEN 1 ELSE 0 END AS keep
            FROM b
        """,
        "q_multisignal_keep_list": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
            sigs AS (SELECT doc_id, sh, {_SIG} AS sig FROM t),
            buckets AS (
              SELECT doc_id, sh, j AS band,
                     md5(cast(j as varchar) || '|' ||
                         array_to_string(list_slice(sig, j*4+1, j*4+4), ',')) AS bucket
              FROM sigs, unnest(generate_series(0,3)) AS g(j)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                              a.sh AS sh_a, b.sh AS sh_b
              FROM buckets a JOIN buckets b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
            ),
            lex AS (
              SELECT id_a, id_b FROM cand
              WHERE len(list_intersect(sh_a, sh_b)) /
                    cast(len(list_distinct(list_concat(sh_a, sh_b))) as double) >= 0.5
            ),
            ebase AS (SELECT vec_id, embedding AS v FROM embeddings),
            eb AS (
              SELECT vec_id, v,
                     array_to_string(list_transform(generate_series(0,5), p ->
                       CASE WHEN list_sum(list_transform(generate_series(1,64), i ->
                              cast(v[i] as double) *
                              (CASE WHEN substr(md5(cast(p as varchar) || ':' || cast(i as varchar)), 1, 1)
                                         IN ('0','1','2','3','4','5','6','7')
                                    THEN 1.0 ELSE -1.0 END)))
                            >= 0 THEN '1' ELSE '0' END), '') AS bucket
              FROM ebase
            ),
            sem AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              WHERE {_cos("a.v", "b.v")} >= 0.3
            ),
            pairs AS (SELECT id_a, id_b FROM lex UNION SELECT id_a, id_b FROM sem),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT a, a AS lbl FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.a
            ),
            comp AS (SELECT a AS id, min(lbl) AS comp FROM reach GROUP BY a)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != comp)
        """,
        "q_neardup_recall": f"""
            WITH e AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 150),
            exact AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM e a JOIN e b ON a.vec_id < b.vec_id
              WHERE {_cos("a.v", "b.v")} >= 0.3
            ),
            bk AS (
              SELECT vec_id, v,
                     array_to_string(list_transform(generate_series(0,5), p ->
                       CASE WHEN list_sum(list_transform(generate_series(1,64), i ->
                              cast(v[i] as double) *
                              (CASE WHEN substr(md5(cast(p as varchar) || ':' || cast(i as varchar)), 1, 1)
                                         IN ('0','1','2','3','4','5','6','7')
                                    THEN 1.0 ELSE -1.0 END)))
                            >= 0 THEN '1' ELSE '0' END), '') AS bucket
              FROM e
            ),
            lsh AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
              WHERE {_cos("a.v", "b.v")} >= 0.3
            ),
            pb AS (
              SELECT vec_id, v,
                     unnest(list_prepend(bucket,
                       list_transform(generate_series(1, 6), p ->
                         substr(bucket, 1, p - 1)
                         || (CASE WHEN substr(bucket, p, 1) = '1' THEN '0' ELSE '1' END)
                         || substr(bucket, p + 1)))) AS pbucket
              FROM bk
            ),
            mp AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM pb a JOIN bk b ON a.pbucket = b.bucket AND a.vec_id < b.vec_id
              WHERE {_cos("a.v", "b.v")} >= 0.3
            )
            SELECT cast(count(*) as bigint) AS n_exact,
                   cast(sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END) as bigint)
                     AS n_lsh_base,
                   cast(sum(CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END) as bigint)
                     AS n_lsh_found,
                   round(cast(sum(CASE WHEN l.id_a IS NOT NULL THEN 1 ELSE 0 END) as double)
                         / count(*), 6) AS recall_base,
                   round(cast(sum(CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END) as double)
                         / count(*), 6) AS recall
            FROM exact x
            LEFT JOIN lsh l ON x.id_a = l.id_a AND x.id_b = l.id_b
            LEFT JOIN mp m ON x.id_a = m.id_a AND x.id_b = m.id_b
        """,
        "q_connections_from_rows": _finisher_cte()
        + """
            SELECT DISTINCT conn_guid AS guid, src_guid, dst_guid, through_guid
            FROM conn
        """,
        "q_links_from_rows": _finisher_cte()
        + """
            SELECT DISTINCT link_guid AS guid, link_name AS name,
                   conn_guid AS connection_guid,
                   src_pin AS src_pin_name, dst_pin AS dest_pin_name
            FROM link_g
        """,
        "q_attributes_from_rows": _finisher_cte()
        + """
            SELECT DISTINCT a.guid AS guid, a.name AS name,
                   a.type AS type, a.value_json AS value_json
            FROM (
              SELECT unnest(attrs) AS a FROM reqs
              UNION ALL SELECT unnest(link_attrs) FROM reqs
              UNION ALL SELECT unnest(through_attrs) FROM reqs
              UNION ALL SELECT unnest(loc_attrs) FROM reqs
            )
        """,
        "q_pins_from_rows": _finisher_cte()
        + f"""
            , sides AS (
              SELECT link_guid, 'src' AS role,
                     list_slice(regexp_split_to_array(src_pin, ':'), 2, 100000) AS names
              FROM link_g
              UNION ALL
              SELECT link_guid, 'dst',
                     list_slice(regexp_split_to_array(dst_pin, ':'), 2, 100000)
              FROM link_g
            ),
            lv1 AS (
              SELECT link_guid, role, names, len(names) AS k,
                     {_pin_guid_sql('names[len(names)]', 'NULL')} AS g1
              FROM sides WHERE len(names) >= 1
            ),
            lv2 AS (SELECT *, CASE WHEN k >= 2 THEN {_pin_guid_sql('names[k-1]', 'g1')} END AS g2 FROM lv1),
            lv3 AS (SELECT *, CASE WHEN k >= 3 THEN {_pin_guid_sql('names[k-2]', 'g2')} END AS g3 FROM lv2),
            lv4 AS (SELECT *, CASE WHEN k >= 4 THEN {_pin_guid_sql('names[k-3]', 'g3')} END AS g4 FROM lv3)
            SELECT DISTINCT guid, name, role, child_guid, link_guid FROM (
              SELECT g1 AS guid, names[k] AS name, role, CAST(NULL AS VARCHAR) AS child_guid, link_guid FROM lv4 WHERE k >= 1
              UNION ALL
              SELECT g2, names[k-1], role, g1, link_guid FROM lv4 WHERE k >= 2
              UNION ALL
              SELECT g3, names[k-2], role, g2, link_guid FROM lv4 WHERE k >= 3
              UNION ALL
              SELECT g4, names[k-3], role, g3, link_guid FROM lv4 WHERE k >= 4
            )
        """,
        "q_lineage_from_rows": _finisher_cte()
        + _LINEAGE_CTE
        + """
            SELECT url, page_no, object_guid, object_type FROM lin
        """,
        "x_lineage_lookup": _finisher_cte()
        + _LINEAGE_CTE
        + """
            SELECT object_guid, object_type,
                   cast(count(DISTINCT url) as bigint) AS n_pages
            FROM lin GROUP BY object_guid, object_type
            HAVING count(DISTINCT url) > 1
        """,
        "q_aspects_from_rows": _finisher_cte()
        + _PARSE_CTE
        + f"""
            , tag_pairs AS (
              SELECT seps[i] AS sep, vals[i] AS value
              FROM tvalid, unnest(generate_series(1, len(seps))) AS g(i)
              UNION ALL
              SELECT s AS sep, '' AS value
              FROM tvalid,
                   unnest(list_filter(list_slice({_SEPL}, 1, lowest + 1),
                                      s -> NOT list_contains(seps, s))) AS f(s)
            )
            SELECT DISTINCT {_sql_md5_uuid("sep || value")} AS guid,
                   sep AS separator, value
            FROM (SELECT sep, value FROM tag_pairs
                  UNION ALL SELECT asep, avalue FROM aclass WHERE status = 0)
        """,
        "q_xtarget_aspects_from_rows": _finisher_cte()
        + _PARSE_CTE
        + f"""
            , tlev AS (
              SELECT tag,
                flatten(list_transform(generate_series(1,6), li ->
                  list_transform(
                    CASE WHEN li - 1 > lowest THEN []
                         WHEN len(list_filter(generate_series(1, len(seps)),
                                              i -> seps[i] = ({_SEPL})[li])) > 0
                         THEN list_transform(
                                list_filter(generate_series(1, len(seps)),
                                            i -> seps[i] = ({_SEPL})[li]),
                                i -> vals[i])
                         ELSE [''] END,
                    v -> struct_pack(s := ({_SEPL})[li], v := v)))) AS flat
              FROM tvalid
            )
            SELECT {_sql_md5_uuid("tag")} AS xtarget_guid,
                   {_sql_md5_uuid("flat[i].s || flat[i].v")} AS aspect_guid,
                   i - 1 AS sort_order
            FROM tlev, unnest(generate_series(1, len(flat))) AS g(i)
        """,
        "q_object_attributes_from_rows": _finisher_cte()
        + _PARSE_CTE
        + f"""
            SELECT DISTINCT object_guid, attribute_guid FROM (
              SELECT {_sql_md5_uuid("tag")} AS object_guid, a.guid AS attribute_guid
              FROM (SELECT CASE WHEN raw_tag IS NULL OR strpos(raw_tag, ':') > 0
                                THEN NULL ELSE raw_tag_c END AS tag,
                           unnest(attrs) AS a
                    FROM reqs WHERE kind = 'xreq')
              WHERE tag IS NOT NULL
              UNION ALL
              SELECT through_guid, a.guid FROM (
                SELECT through_guid, unnest(through_attrs_x) AS a
                FROM role_guids WHERE through_completed IS NOT NULL)
              UNION ALL
              SELECT src_guid, a.guid FROM (
                SELECT src_guid, unnest(loc_attrs) AS a
                FROM role_guids WHERE src_completed IS NOT NULL)
              UNION ALL
              SELECT dst_guid, a.guid FROM (
                SELECT dst_guid, unnest(loc_attrs) AS a
                FROM role_guids WHERE dst_completed IS NOT NULL)
              UNION ALL
              SELECT link_guid, a.guid FROM (
                SELECT link_guid, unnest(link_attrs) AS a FROM link_g)
              UNION ALL
              SELECT {_sql_md5_uuid("asep || avalue")}, a.guid FROM (
                SELECT asep, avalue, unnest(attrs) AS a
                FROM aclass WHERE status = 0)
            )
        """,
        "q_errors_from_rows": _finisher_cte()
        + _PARSE_CTE
        + """
            SELECT url, page_no, 'WARNING' AS severity, message
            FROM reqs WHERE kind = 'error'
            UNION ALL
            SELECT url, page_no, 'WARNING',
                   'Linked connection where one/no pins specified: `'
                   || coalesce(src_pin, 'None') || '` `'
                   || coalesce(dst_pin, 'None') || '`'
            FROM cwl0
            WHERE src_pin IS NULL OR src_pin = '' OR dst_pin IS NULL OR dst_pin = ''
            UNION ALL
            SELECT url, page_no, 'WARNING',
                   'Linked connection where one/no targets specified: `'
                   || src_tag || '` `' || dst_tag || '`'
            FROM cwl0
            WHERE NOT (src_pin IS NULL OR src_pin = ''
                       OR dst_pin IS NULL OR dst_pin = '')
              AND (src_tag = '' OR dst_tag = '')
            UNION ALL
            SELECT at_url, at_page, 'WARNING', 'Tag is invalid: ' || tag
            FROM tparse WHERE NOT (matched OR t2 = '')
            UNION ALL
            SELECT url, page_no, 'WARNING',
                   CASE WHEN status = 1
                        THEN 'Failed to create aspect with tag: ''' || raw_tag || ''''
                        ELSE 'Failed to create aspect with tag: ''' || raw_tag
                             || ''' - has composite structure' END
            FROM aclass WHERE status != 0
        """,
        # IVF ANN: centroids = first 8 vectors (deterministic codebook
        # stand-in); assignment + probe-cell ranking by (cos DESC, cell
        # DESC) exactly matches Spark's reverse(array_sort) tie-break
        "q_ann_ivf": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            cents AS (
              SELECT cast(vec_id as int) AS cell, v AS cv FROM base WHERE vec_id < 8
            ),
            sims AS (
              SELECT b.vec_id, b.v, c.cell, {_cos("c.cv", "b.v")} AS sim
              FROM base b CROSS JOIN cents c
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY sim DESC, cell DESC) AS rn
              FROM sims
            ),
            assigned AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
            pcells AS (
              SELECT vec_id AS probe_id, v AS pv, cell AS pcell
              FROM ranked WHERE rn <= 2 AND vec_id IN (0,1,2)
            ),
            scored AS (
              SELECT probe_id, a.vec_id AS vec_id, {_cos("pv", "a.v")} AS cos_sim
              FROM assigned a JOIN pcells p
                ON a.cell = p.pcell AND a.vec_id != p.probe_id
            )
            SELECT probe_id, vec_id, cos_sim, rank FROM (
              SELECT probe_id, vec_id, cos_sim,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 5
        """,
        # IVF recall gate: exact top-5 (brute force SQL) left-joined
        # with the IVF top-5 (same quantizer SQL as q_ann_ivf, wider
        # probe list) — recall = fraction of exact neighbors recovered
        "q_ann_ivf_recall": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            xprobes AS (SELECT vec_id AS probe_id, v AS pv FROM base
                        WHERE vec_id IN (0,1,2,9,17)),
            xscored AS (
              SELECT probe_id, vec_id, {_cos("pv", "v")} AS cos_sim
              FROM base, xprobes WHERE vec_id != probe_id
            ),
            exact AS (
              SELECT probe_id, vec_id FROM (
                SELECT probe_id, vec_id,
                       row_number() OVER (PARTITION BY probe_id
                                          ORDER BY cos_sim DESC, vec_id) AS rank
                FROM xscored) WHERE rank <= 5
            ),
            cents AS (
              SELECT cast(vec_id as int) AS cell, v AS cv FROM base WHERE vec_id < 8
            ),
            sims AS (
              SELECT b.vec_id, b.v, c.cell, {_cos("c.cv", "b.v")} AS sim
              FROM base b CROSS JOIN cents c
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY sim DESC, cell DESC) AS rn
              FROM sims
            ),
            assigned AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
            pcells AS (
              SELECT vec_id AS probe_id, v AS pv, cell AS pcell
              FROM ranked WHERE rn <= 2 AND vec_id IN (0,1,2,9,17)
            ),
            iscored AS (
              SELECT probe_id, a.vec_id AS vec_id, {_cos("pv", "a.v")} AS cos_sim
              FROM assigned a JOIN pcells p
                ON a.cell = p.pcell AND a.vec_id != p.probe_id
            ),
            ivf AS (
              SELECT probe_id, vec_id FROM (
                SELECT probe_id, vec_id,
                       row_number() OVER (PARTITION BY probe_id
                                          ORDER BY cos_sim DESC, vec_id) AS rank
                FROM iscored) WHERE rank <= 5
            )
            SELECT cast(count(DISTINCT e.probe_id) as bigint) AS n_probes,
                   cast(count(*) as bigint) AS n_exact,
                   cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                        as bigint) AS n_found,
                   round(cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                              as double) / count(*), 6) AS recall
            FROM exact e LEFT JOIN ivf i
              ON e.probe_id = i.probe_id AND e.vec_id = i.vec_id
        """,
        # production embedding near-dup: same hyperplane bucket formula
        # as x_ann_lsh, bucket self-join, exact cosine verify
        "q_embedding_neardup_lsh": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            b AS (
              SELECT vec_id, v,
                     array_to_string(list_transform(generate_series(0,5), p ->
                       CASE WHEN list_sum(list_transform(generate_series(1,64), i ->
                              cast(v[i] as double) *
                              (CASE WHEN substr(md5(cast(p as varchar) || ':' || cast(i as varchar)), 1, 1)
                                         IN ('0','1','2','3','4','5','6','7')
                                    THEN 1.0 ELSE -1.0 END)))
                            >= 0 THEN '1' ELSE '0' END), '') AS bucket
              FROM base
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos("a.v", "b.v")} AS cos_sim
            FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE {_cos("a.v", "b.v")} >= 0.3
        """,
        # the xtargets finisher over the staged requests parquet: the
        # Spark query writes the staged requests parquet from the same
        # extraction pass, so both engines see identical input
        "q_xtargets_from_rows": f"""
            WITH reqs AS (
              SELECT * FROM read_parquet('{_oracle_requests_glob()}')
            ),
            cwl AS (
              SELECT through_tag, through_tag_c,
                     CASE WHEN strpos(src_pin_tag, ':') > 0
                          THEN substr(src_pin_tag, 1, strpos(src_pin_tag, ':') - 1)
                          ELSE src_pin_tag END AS src_tag,
                     CASE WHEN strpos(src_pin_tag, ':') > 0
                          THEN substr(src_pin_tag, strpos(src_pin_tag, ':'))
                          ELSE NULL END AS src_pin,
                     CASE WHEN strpos(dst_pin_tag, ':') > 0
                          THEN substr(dst_pin_tag, 1, strpos(dst_pin_tag, ':') - 1)
                          ELSE dst_pin_tag END AS dst_tag,
                     CASE WHEN strpos(dst_pin_tag, ':') > 0
                          THEN substr(dst_pin_tag, strpos(dst_pin_tag, ':'))
                          ELSE NULL END AS dst_pin,
                     CASE WHEN strpos(src_pin_tag_c, ':') > 0
                          THEN substr(src_pin_tag_c, 1, strpos(src_pin_tag_c, ':') - 1)
                          ELSE src_pin_tag_c END AS src_tag_c,
                     CASE WHEN strpos(dst_pin_tag_c, ':') > 0
                          THEN substr(dst_pin_tag_c, 1, strpos(dst_pin_tag_c, ':') - 1)
                          ELSE dst_pin_tag_c END AS dst_tag_c
              FROM reqs WHERE kind = 'cwl'
            ),
            conn_all AS (
              SELECT CASE WHEN through_tag = '' THEN NULL ELSE through_tag END AS through_tag,
                     through_tag_c, src_tag, src_tag_c, dst_tag, dst_tag_c
              FROM cwl
              WHERE NOT (src_pin IS NULL OR src_pin = '' OR dst_pin IS NULL OR dst_pin = '')
                AND NOT (src_tag = '' OR dst_tag = '')
              UNION ALL
              SELECT CASE WHEN through_tag = '' THEN NULL ELSE through_tag END,
                     through_tag_c, src_tag, src_tag_c, dst_tag, dst_tag_c
              FROM reqs WHERE kind = 'conn'
            ),
            xall AS (
              SELECT CASE WHEN raw_tag IS NULL OR strpos(raw_tag, ':') > 0
                          THEN NULL ELSE raw_tag_c END AS tag,
                     target_type AS t
              FROM reqs WHERE kind = 'xreq'
              UNION ALL
              SELECT CASE WHEN through_tag IS NULL OR strpos(through_tag, ':') > 0
                          THEN NULL ELSE through_tag_c END, 'cable' FROM conn_all
              UNION ALL
              SELECT CASE WHEN src_tag IS NULL OR strpos(src_tag, ':') > 0
                          THEN NULL ELSE src_tag_c END, 'device' FROM conn_all
              UNION ALL
              SELECT CASE WHEN dst_tag IS NULL OR strpos(dst_tag, ':') > 0
                          THEN NULL ELSE dst_tag_c END, 'device' FROM conn_all
            ),
            scored AS (
              SELECT {_sql_md5_uuid("tag")} AS guid, tag,
                     CASE t WHEN 'cable' THEN 3 WHEN 'device' THEN 2
                            WHEN 'strip' THEN 1 ELSE 0 END AS p
              FROM xall WHERE tag IS NOT NULL
            )
            SELECT guid, min(tag) AS tag,
                   CASE max(p) WHEN 3 THEN 'cable' WHEN 2 THEN 'device'
                               WHEN 1 THEN 'strip' ELSE 'other' END AS target_type
            FROM scored GROUP BY guid
        """,
        # hyperplane-LSH ANN: deterministic md5-derived +-1 hyperplanes,
        # bucket equi-join, exact cosine re-rank — same formula both
        # engines (similarity.py hyperplane_sign)
        # multi-probe LSH: probe bucket + all hamming-1 flips; same
        # hyperplane formula as x_ann_lsh
        "q_ann_lsh_multiprobe": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            b AS (
              SELECT vec_id, v,
                     array_to_string(list_transform(generate_series(0,5), p ->
                       CASE WHEN list_sum(list_transform(generate_series(1,64), i ->
                              cast(v[i] as double) *
                              (CASE WHEN substr(md5(cast(p as varchar) || ':' || cast(i as varchar)), 1, 1)
                                         IN ('0','1','2','3','4','5','6','7')
                                    THEN 1.0 ELSE -1.0 END)))
                            >= 0 THEN '1' ELSE '0' END), '') AS bucket
              FROM base
            ),
            probes AS (
              SELECT vec_id AS probe_id, v AS pv, bucket AS pb
              FROM b WHERE vec_id IN (0,1,2)
            ),
            pbuckets AS (
              SELECT probe_id, pv,
                     unnest(list_prepend(pb, list_transform(generate_series(1,6), p ->
                       substr(pb, 1, p-1)
                       || (CASE WHEN substr(pb, p, 1) = '1' THEN '0' ELSE '1' END)
                       || substr(pb, p+1)))) AS pbucket
              FROM probes
            ),
            scored AS (
              SELECT DISTINCT probe_id, b.vec_id AS vec_id, {_cos("pv", "b.v")} AS cos_sim
              FROM b JOIN pbuckets ON b.bucket = pbuckets.pbucket
              WHERE b.vec_id != probe_id
            )
            SELECT probe_id, vec_id, cos_sim, rank FROM (
              SELECT probe_id, vec_id, cos_sim,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 5
        """,
        "x_ann_lsh": f"""
            WITH base AS (SELECT vec_id, embedding AS v FROM embeddings),
            b AS (
              SELECT vec_id, v,
                     array_to_string(list_transform(generate_series(0,5), p ->
                       CASE WHEN list_sum(list_transform(generate_series(1,64), i ->
                              cast(v[i] as double) *
                              (CASE WHEN substr(md5(cast(p as varchar) || ':' || cast(i as varchar)), 1, 1)
                                         IN ('0','1','2','3','4','5','6','7')
                                    THEN 1.0 ELSE -1.0 END)))
                            >= 0 THEN '1' ELSE '0' END), '') AS bucket
              FROM base
            ),
            probes AS (
              SELECT vec_id AS probe_id, v AS pv, bucket AS pbucket
              FROM b WHERE vec_id IN (0,1,2)
            ),
            scored AS (
              SELECT probe_id, b.vec_id AS vec_id, {_cos("pv", "b.v")} AS cos_sim
              FROM b, probes WHERE b.bucket = probes.pbucket AND b.vec_id != probe_id
            )
            SELECT probe_id, vec_id, cos_sim, rank FROM (
              SELECT probe_id, vec_id, cos_sim,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM scored) WHERE rank <= 5
        """,
    }
    d["q_asof_join_bucketed"] = d["q_asof_join"]  # identical semantics
    d["q_training_mixture"] = """
        WITH b AS (
          SELECT doc_id, source, text,
                 cast(list_sum(list_transform(generate_series(1, 4), i ->
                   (strpos('0123456789abcdef',
                           substr(md5(cast(doc_id as varchar)), i, 1)) - 1)
                   * (CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256 WHEN 3 THEN 16 ELSE 1 END)))
                   as bigint) AS bucket
          FROM documents
        ),
        keep AS (
          SELECT doc_id, source, text FROM b
          WHERE bucket * 100 <
                (CASE source WHEN 'src0' THEN 25 WHEN 'src1' THEN 50 ELSE 75 END) * 65536
        ),
        t AS (
          SELECT doc_id, source,
                 cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS n_tokens
          FROM keep
        )
        SELECT doc_id, source, n_tokens,
               cast(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / 500.0) as bigint) AS shard_id
        FROM t
    """
    d["q_incremental_dedup"] = f"""
        WITH b AS (SELECT doc_id,
                          '  Boilerplate' || chr(9) || 'Page '
                          || cast(doc_id % 150 as varchar) AS text
                   FROM documents),
        f AS (SELECT doc_id, md5({_NORM}) AS fp FROM b),
        hist AS (SELECT fp FROM f WHERE doc_id < 100),
        batch AS (SELECT doc_id, fp FROM f WHERE doc_id >= 100),
        w AS (SELECT fp, min(doc_id) AS kid FROM batch GROUP BY fp),
        wu AS (SELECT kid FROM w WHERE fp NOT IN (SELECT fp FROM hist))
        SELECT doc_id, fp,
               CASE WHEN doc_id IN (SELECT kid FROM wu) THEN 1 ELSE 0 END AS keep
        FROM batch
    """
    d["q_url_dedup"] = """
        WITH u AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.'
                       WHEN doc_id % 3 = 1 THEN 'https://www.'
                       ELSE 'http://www.' END)
                 || source || '.Example.COM'
                 || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                          WHEN doc_id % 12 = 1 THEN ':443' ELSE '' END)
                 || '/p/' || cast(doc_id % 300 as varchar)
                 || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
                 || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=1'
                          WHEN doc_id % 5 = 1 THEN '?ref=1&utm_campaign=x'
                          ELSE '' END)
                 || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
          FROM documents
        ),
        c AS (
          SELECT doc_id,
                 regexp_replace(url, '#.*$', '') AS no_frag,
                 regexp_extract(regexp_replace(url, '#.*$', ''),
                                '^[^:/?#]+://[^/?#]*') AS sh_raw
          FROM u
        ),
        c2 AS (
          SELECT doc_id,
                 CASE WHEN lower(sh_raw) LIKE 'http://%'
                        THEN regexp_replace(lower(sh_raw), ':80$', '')
                      WHEN lower(sh_raw) LIKE 'https://%'
                        THEN regexp_replace(lower(sh_raw), ':443$', '')
                      ELSE lower(sh_raw) END AS sh,
                 substr(no_frag, length(sh_raw) + 1) AS rest
          FROM c
        ),
        c3 AS (
          SELECT doc_id, sh,
                 regexp_replace(regexp_extract(rest, '^[^?]*'), '/$', '') AS path,
                 CASE WHEN strpos(rest, '?') > 0
                      THEN regexp_replace(rest, '^[^?]*\\?', '') END AS qstr
          FROM c2
        ),
        c4 AS (
          SELECT doc_id, sh, path,
                 CASE WHEN qstr IS NULL THEN CAST(NULL AS VARCHAR[])
                      ELSE list_filter(string_split(qstr, '&'),
                             p -> p != '' AND NOT regexp_matches(
                                    p, '^(utm_[^=]*|gclid|fbclid)='))
                 END AS params
          FROM c3
        ),
        canon AS (
          SELECT doc_id,
                 sh || path ||
                 (CASE WHEN params IS NOT NULL AND len(params) > 0
                       THEN '?' || array_to_string(params, '&')
                       ELSE '' END) AS canon_url
          FROM c4
        ),
        g AS (SELECT canon_url, min(doc_id) AS k,
                     cast(count(*) as bigint) AS dup_count
              FROM canon GROUP BY canon_url)
        SELECT canon.doc_id, canon.canon_url, g.dup_count,
               CASE WHEN canon.doc_id = g.k THEN 1 ELSE 0 END AS keep
        FROM canon JOIN g USING (canon_url)
    """
    d["q_url_filter"] = """
        WITH u AS (
          SELECT doc_id,
                 'https://'
                 || (CASE WHEN doc_id % 13 = 0 THEN 'casino-' ELSE 'www.' END)
                 || (CASE WHEN doc_id % 11 = 0
                          THEN cast(doc_id % 997 as varchar) || '9999999999999999'
                          ELSE '' END)
                 || source || '.example.com'
                 || (CASE WHEN doc_id % 17 = 0 THEN repeat('/seg', 12) ELSE '' END)
                 || '/p/' || cast(doc_id % 300 as varchar)
                 || (CASE WHEN doc_id % 19 = 0 THEN '.jpg' ELSE '' END)
                 || (CASE WHEN doc_id % 29 = 0 THEN repeat('z', 600) ELSE '' END)
                 || (CASE WHEN doc_id % 23 = 0
                          THEN '?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9'
                          ELSE '' END) AS url
          FROM documents
        ),
        nf AS (
          SELECT doc_id, url,
                 regexp_replace(url, '(?s)#.*', '') AS no_frag
          FROM u
        ),
        parts AS (
          SELECT doc_id, url,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(no_frag, '^[^:/?#]+://([^/?#]*)', 1)),
                   '^[^@]*@', ''), ':[0-9]+\\z', '') AS host,
                 regexp_extract(no_frag, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(no_frag, '(?s)\\?(.*)', 1) AS query
          FROM nf
        ),
        flags AS (
          SELECT doc_id, url, host,
                 CASE WHEN regexp_matches(lower(path),
                   '\\.(jpg|jpeg|png|gif|bmp|webp|css|js|ico|svg|woff2?|ttf|zip|gz|tar|exe|dmg|mp3|mp4|avi|mov|pdf)\\z')
                      THEN 1 ELSE 0 END AS bad_ext,
                 CASE WHEN regexp_matches(host || lower(path),
                   '(porn|xxx|casino|gambl|viagra|escort)')
                      THEN 1 ELSE 0 END AS blocked_word,
                 CASE WHEN length(host) > 0 AND
                   (length(host) - length(regexp_replace(host, '[0-9]', '', 'g')))::DOUBLE
                     / length(host) > 0.4
                      THEN 1 ELSE 0 END AS digit_host,
                 CASE WHEN (length(path) - length(replace(path, '/', ''))) > 10
                      THEN 1 ELSE 0 END AS deep_path,
                 CASE WHEN length(url) > 512 THEN 1 ELSE 0 END AS long_url,
                 CASE WHEN (CASE WHEN length(query) > 0
                                 THEN length(query) - length(replace(query, '&', '')) + 1
                                 ELSE 0 END) > 8
                      THEN 1 ELSE 0 END AS many_params
          FROM parts
        )
        SELECT doc_id, url, host, bad_ext, blocked_word, digit_host,
               deep_path, long_url, many_params,
               cast(bad_ext + blocked_word + digit_host + deep_path
                    + long_url + many_params as bigint) AS n_flags,
               CASE WHEN url IS NULL OR length(host) = 0 THEN 0
                    WHEN bad_ext + blocked_word + digit_host + deep_path
                         + long_url + many_params = 0 THEN 1
                    ELSE 0 END AS keep
        FROM flags
    """
    # -- derived oracles (built from the entries above so the entity
    # SQL cannot silently diverge between the base check and the
    # search/tree/lookup checks) --------------------------------------
    # '=F1 @type=device': normalized-substring tag match AND type match
    # over the xtargets entity SQL (search.py run_parser/_partial)
    d["x_search_targets"] = f"""
        SELECT guid FROM ({d["q_xtargets_from_rows"]})
        WHERE contains(lower(trim(regexp_replace(tag, '\\s+', ' ', 'g'))), '=f1')
          AND contains(lower(trim(regexp_replace(target_type, '\\s+', ' ', 'g'))),
                       'device')
    """
    # '@links.attributes(Color)': connections having >=1 link whose
    # search-attribute map contains the key 'color' (attr_search_map:
    # SIMPLE -> normalized name, ROUTING_TRACKS -> 'tracks',
    # PLC_ADDRESS -> raw meta keys)
    d["x_search_connections"] = _finisher_cte() + """
        , la AS (
          SELECT conn_guid, unnest(link_attrs) AS a FROM link_g
        )
        SELECT DISTINCT conn_guid AS guid FROM la
        WHERE (a.type = 'SIMPLE'
               AND lower(trim(regexp_replace(a.name, '\\s+', ' ', 'g'))) = 'color')
           OR (a.type = 'ROUTING_TRACKS' AND 'tracks' = 'color')
           OR (a.type = 'PLC_ADDRESS'
               AND list_contains(json_keys(a.value_json, '$.meta'), 'color'))
    """
    # aspect prefix tree: level_i = separator + FIRST value for that
    # separator (tag grammar; absent/filled/unparseable all collapse to
    # the bare separator, exactly like the coalesce in export.aspect_tree)
    d["x_aspect_tree"] = f"""
        WITH xt AS ({d["q_xtargets_from_rows"]}),
        p AS (
          SELECT tag,
                 regexp_extract_all(t2, '{_SEPC}') AS seps,
                 list_transform(
                   list_slice(regexp_split_to_array(t2, '{_SEPC}'), 2, 100000),
                   x -> trim(x)) AS vals,
                 (len(regexp_extract_all(t2, '{_SEPC}')) > 0
                  AND regexp_split_to_array(t2, '{_SEPC}')[1] = '') AS matched
          FROM (SELECT tag,
                       trim(CASE WHEN strpos(tag, ':') > 0
                                 THEN substr(tag, 1, strpos(tag, ':') - 1)
                                 ELSE tag END) AS t2
                FROM xt)
        ),
        lv AS (
          SELECT tag,
            '=' || (CASE WHEN matched
                         THEN coalesce(vals[list_position(seps, '=')], '')
                         ELSE '' END) AS level1,
            '+' || (CASE WHEN matched
                         THEN coalesce(vals[list_position(seps, '+')], '')
                         ELSE '' END) AS level2,
            '-' || (CASE WHEN matched
                         THEN coalesce(vals[list_position(seps, '-')], '')
                         ELSE '' END) AS level3
          FROM p
        )
        SELECT level1, level2, level3,
               cast(count(*) as bigint) AS n,
               cast(count(DISTINCT tag) as bigint) AS n_tags
        FROM lv GROUP BY level1, level2, level3
    """
    d["x_spans"] = f"""
        WITH e AS (SELECT * FROM read_parquet('{_oracle_extracted_glob()}')),
        sp AS (SELECT url, page_type, unnest(spans) AS u
               FROM e WHERE len(spans) > 0)
        SELECT url, page_type, u.region AS region, u.kind AS kind,
               u.row_idx AS row_idx,
               array_to_string(list_transform(u.loc,
                 x -> cast(cast(floor(x * 1000 + 0.5) as bigint) as varchar)), ',')
                 AS loc,
               u.text AS text
        FROM sp
    """
    d["x_metrics_errors"] = f"""
        WITH e AS (SELECT * FROM read_parquet('{_oracle_extracted_glob()}')),
        x AS (SELECT unnest(errors) AS u FROM e)
        SELECT u.severity AS severity, cast(count(*) as bigint) AS n
        FROM x GROUP BY u.severity ORDER BY severity
    """
    d["x_partition_metrics"] = f"""
        SELECT partition_id,
               cast(count(*) as bigint) AS docs,
               cast(sum(len("rows")) as bigint) AS "rows",
               cast(sum(len(list_filter(errors, e -> e.severity = 'FAULT')))
                    as bigint) AS faults,
               cast(sum(CASE WHEN page_type IS NULL THEN 1 ELSE 0 END)
                    as bigint) AS unclassified
        FROM read_parquet('{_oracle_extracted_glob()}')
        GROUP BY partition_id
    """
    # golden-pinned value checks (the committed goldens are captured
    # from the pinned decoders/serializers by scripts/
    # capture_aux_goldens.py — same philosophy as q_extract_goldens)
    # explicit column types (same rule as the AML golden below): auto
    # inference would re-render any UUID/date-shaped value
    d["x_multimodal_features"] = """
        SELECT media_id, kind, f0, f3, decode_ok
        FROM read_json('/root/repo/tests/goldens/multimodal_features.json',
                       columns={'media_id': 'BIGINT', 'kind': 'VARCHAR',
                                'f0': 'DOUBLE', 'f3': 'DOUBLE',
                                'decode_ok': 'BOOLEAN'})
    """
    # explicit column types: auto-inference parses the 32-hex md5 as a
    # UUID and re-renders it with dashes
    d["x_aml_export"] = f"""
        SELECT hierarchy, section, n_fragments, n_targets, n_aspects,
               n_connections, n_pins, n_links, xml_chars, h_order, file_md5
        FROM read_json('/root/repo/tests/goldens/aml_export.json',
                       columns={{'sf': 'VARCHAR', 'hierarchy': 'VARCHAR',
                                 'section': 'BIGINT', 'n_fragments': 'BIGINT',
                                 'n_targets': 'BIGINT', 'n_aspects': 'BIGINT',
                                 'n_connections': 'BIGINT', 'n_pins': 'BIGINT',
                                 'n_links': 'BIGINT', 'xml_chars': 'BIGINT',
                                 'h_order': 'BIGINT', 'file_md5': 'VARCHAR'}})
        WHERE sf = '{_oracle_sf_name()}'
    """
    return d
