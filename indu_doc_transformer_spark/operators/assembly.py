"""Relational entity assembly: normalized extraction rows -> deduplicated
entity tables, entirely in DataFrame algebra, in a SINGLE pass over the
rows table.

This is the Spark-first re-expression of the reference's God factory
layer (god.py:237-565) and per-type page handlers
(page_processor.py:107-521). Where the reference upserts into
in-memory dicts row by row, we:

- project every row into an array of typed *requests* (xtarget /
  connection / connection-with-link / aspect / error / attribute-pool)
  with one CASE over page_type — ';'-products (J6) and the terminal
  _1/_2 side split (T9) are built inside array transforms, so the whole
  handler layer is ONE scan + ONE explode (the previous design scanned
  the rows table once per handler branch — 8 passes at 10^12-row scale),
- complete tags against footers in the extraction kernel (the '_c:'
  columns — no per-row Python here at all),
- compute every GUID as a native md5 expression (F8 — join
  elimination: FK assignment never joins, both sides hash),
- finalize with groupBy(guid) merges: max type priority (A4),
  first-wins entities (A1,A5-A8), set-union attachments (A3,A6).

Dedup-by-GUID replaces dedup-on-create; Catalyst plans partial/final
hash aggregation (the reference's sub_god merge, A9) automatically.

The pure-Python oracle (kernels/assemble.py) defines expected results;
tests/test_assembly.py verifies set-equality of every output table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_ASPECTS, AspectsConfig
from ..functions import guids as G
from ..functions.tags import make_single_aspect_udf, make_tag_parts_udf

ATTR_TYPE = "array<struct<guid:string,name:string,type:string,value_json:string>>"
EMPTY_ATTRS = f"cast(array() as {ATTR_TYPE})"

# unified request struct: one array element per factory call
_REQ_FIELDS = [
    ("kind", "string"),        # xreq | conn | cwl | aspect | error
    ("raw_tag", "string"),     # xreq/aspect
    ("raw_tag_c", "string"),
    ("target_type", "string"),
    ("through_tag", "string"),  # conn/cwl
    ("through_tag_c", "string"),
    ("src_tag", "string"),      # conn (pre-split); cwl uses *_pin_tag
    ("src_tag_c", "string"),
    ("dst_tag", "string"),
    ("dst_tag_c", "string"),
    ("src_pin_tag", "string"),  # cwl
    ("src_pin_tag_c", "string"),
    ("dst_pin_tag", "string"),
    ("dst_pin_tag_c", "string"),
    ("message", "string"),      # error
]
REQ_TYPE = (
    "struct<"
    + ",".join(f"{n}:{t}" for n, t in _REQ_FIELDS)
    + f",attrs:{ATTR_TYPE},link_attrs:{ATTR_TYPE},"
    + f"through_attrs:{ATTR_TYPE},loc_attrs:{ATTR_TYPE}>"
)

TYPE_PRIORITY = {"cable": 3, "device": 2, "strip": 1, "other": 0}

# (applicationId, page_type) -> (pre, req) unresolved expression trees;
# see Assembler._branch_exprs. Config-independent by construction (the
# branch builders use only class-level constants; AspectsConfig feeds
# the finisher UDFs, never the request projections). The lock guards
# mutation only — requests_table builds the nine branches from a
# thread pool, and an unguarded evict-while-insert raced.
import threading as _threading

_BRANCH_EXPR_CACHE: dict = {}
_BRANCH_EXPR_LOCK = _threading.Lock()


def _pri(type_col: Column) -> Column:
    c = F.when(type_col == "cable", 3).when(type_col == "device", 2)
    return c.when(type_col == "strip", 1).otherwise(0)


def _pri_name(pri_col: Column) -> Column:
    c = F.when(pri_col == 3, "cable").when(pri_col == 2, "device")
    return c.when(pri_col == 1, "strip").otherwise("other")


def _g(cols: Column, name: str) -> Column:
    """str(row[name]).strip() with missing-key -> '' (handler accessor)."""
    return F.trim(F.coalesce(F.try_element_at(cols, F.lit(name)), F.lit("")))


def _simple_attrs(cols: Column, exclude: list[str]) -> Column:
    """SIMPLE attributes from every non-excluded, non-meta, non-empty
    column (page_processor.py:122-130 pattern)."""
    entries = F.filter(
        F.map_entries(cols),
        lambda e: (~e["key"].isin(exclude))
        & (~e["key"].startswith("_"))
        & (e["key"] != "")
        & (F.trim(e["value"]) != ""),
    )
    return F.transform(
        entries,
        lambda e: F.struct(
            G.simple_attribute_guid(e["key"], F.trim(e["value"])).alias("guid"),
            e["key"].alias("name"),
            F.lit("SIMPLE").alias("type"),
            F.to_json(F.struct(F.trim(e["value"]).alias("value"))).alias("value_json"),
        ),
    )


def _loc_attrs() -> Column:
    """0/1-element array with the PDF_LOCATION attribute."""
    attr = F.struct(
        G.pdf_location_attribute_guid(F.col("page_no"), F.col("loc_repr")).alias("guid"),
        F.lit("location").alias("name"),
        F.lit("PDF_LOCATION").alias("type"),
        F.to_json(
            F.struct(F.col("loc_repr").alias("bbox"), F.col("page_no").alias("page_no"))
        ).alias("value_json"),
    )
    return F.when(F.col("loc_repr").isNotNull(), F.array(attr)).otherwise(
        F.expr(EMPTY_ATTRS)
    )


def _routing_attr(route_col: Column) -> Column:
    tracks = F.split(route_col, ";")
    # value_json uses the sorted tracks: the guid is order-insensitive
    # (attributes.py:373-381) so first-wins dedup over differently-
    # ordered track lists would otherwise be nondeterministic
    return F.struct(
        G.routing_tracks_attribute_guid(F.lit("route"), tracks).alias("guid"),
        F.lit("route").alias("name"),
        F.lit("ROUTING_TRACKS").alias("type"),
        F.to_json(F.struct(F.array_sort(tracks).alias("tracks"))).alias("value_json"),
    )


def _plc_attr(cols: Column) -> Column:
    """PLC_ADDRESS attribute: address + sorted k=v metadata
    (attributes.py:492-500)."""
    entries = F.array_sort(
        F.transform(
            F.filter(
                F.map_entries(cols),
                lambda e: (~e["key"].isin(["tag", "plc_addr"]))
                & (~e["key"].startswith("_"))
                & (e["key"] != "")
                & (F.trim(e["value"]) != ""),
            ),
            lambda e: F.struct(e["key"].alias("key"), F.trim(e["value"]).alias("value")),
        )
    )
    addr = _g(cols, "plc_addr")
    return F.struct(
        G.plc_address_attribute_guid(addr, F.map_from_entries(entries)).alias("guid"),
        addr.alias("name"),
        F.lit("PLC_ADDRESS").alias("type"),
        F.to_json(F.struct(F.map_from_entries(entries).alias("meta"))).alias("value_json"),
    )


def _req(**fields) -> Column:
    """Build one request struct, nulling unset fields."""
    parts = []
    for name, _t in _REQ_FIELDS:
        parts.append(
            (fields[name] if name in fields else F.lit(None).cast("string")).alias(name)
        )
    for name in ("attrs", "link_attrs", "through_attrs", "loc_attrs"):
        parts.append(
            (fields[name] if name in fields else F.expr(EMPTY_ATTRS)).alias(name)
        )
    return F.struct(*parts)


def _err_req(msg: Column) -> Column:
    return _req(kind=F.lit("error"), message=msg)


def _one(req: Column) -> Column:
    return F.array(req)


def _concat_str(*parts) -> Column:
    return F.concat(*[p if isinstance(p, Column) else F.lit(p) for p in parts])


class Assembler:
    """Builds the entity tables from a normalized rows DataFrame
    (operators/extraction.rows_table output)."""

    def __init__(self, config: AspectsConfig = DEFAULT_ASPECTS):
        self.config = config
        self.tag_parts = make_tag_parts_udf(config)
        self.single_aspect = make_single_aspect_udf(config)

    # -- per-type request builders (each returns array<request>) -------

    def _connection_list(self, cols: Column, attrs: Column, loc: Column) -> Column:
        tag_from, tag_to = _g(cols, "src_pin_tag"), _g(cols, "dst_pin_tag")
        bad = (tag_from == "") | (tag_to == "")
        ok = _one(
            _req(
                kind=F.lit("cwl"),
                src_pin_tag=tag_from,
                src_pin_tag_c=_g(cols, "_c:src_pin_tag"),
                dst_pin_tag=tag_to,
                dst_pin_tag_c=_g(cols, "_c:dst_pin_tag"),
                link_attrs=attrs,
                attrs=attrs,
                loc_attrs=loc,
            )
        )
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: one/both of the connection targets are empty "
                    "(is that intended?): `", tag_from, "` `", tag_to, "`",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    def _device_tag_list(self, cols: Column, attrs: Column) -> Column:
        tag = _g(cols, "tag")
        ok = _one(
            _req(
                kind=F.lit("xreq"),
                raw_tag=tag,
                raw_tag_c=_g(cols, "_c:tag"),
                target_type=F.lit("device"),
                attrs=attrs,
            )
        )
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty device tag (is that intended?): `", tag, "`",
                )
            )
        )
        return F.when(tag == "", err).otherwise(ok)

    def _cable_overview(self, cols: Column, attrs: Column, loc: Column) -> Column:
        tag = _g(cols, "cable_tag")
        tag_from, tag_to = _g(cols, "src_tag"), _g(cols, "dst_tag")
        bad = (tag == "") | ((tag_from == "") & (tag_to == ""))
        conn = _req(
            kind=F.lit("conn"),
            through_tag=tag,
            through_tag_c=_g(cols, "_c:cable_tag"),
            src_tag=tag_from,
            src_tag_c=_g(cols, "_c:src_tag"),
            dst_tag=tag_to,
            dst_tag_c=_g(cols, "_c:dst_tag"),
            through_attrs=attrs,
            attrs=attrs,
            loc_attrs=loc,
        )
        # one-sided rows register attributes but create nothing
        # (page_processor.py:193-213): emit a pool-only request
        pool = _req(kind=F.lit("pool"), attrs=attrs)
        ok = F.when((tag_from != "") & (tag_to != ""), _one(conn)).otherwise(_one(pool))
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty cable tag (is that intended?): `", tag,
                    "` from=`", tag_from, "` to=`", tag_to, "`",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    def _topology(self, cols: Column, attrs: Column, loc: Column) -> Column:
        tag = _g(cols, "designation")
        tags_src, tags_dst = _g(cols, "src_tags"), _g(cols, "dst_tags")
        tags_route = _g(cols, "route")
        bad = (tag == "") | (tags_src == "") | (tags_dst == "") | (tags_route == "")
        # J6: cartesian of ';'-split src x dst (page_processor.py:299-304)
        # as nested transforms over pre-zipped arrays (each split is
        # evaluated once as a transform input, not per element)
        src_zip = F.arrays_zip(
            F.split(tags_src, ";").alias("r"),
            F.split(_g(cols, "_c:src_tags"), ";").alias("c"),
        )
        dst_zip = F.arrays_zip(
            F.split(tags_dst, ";").alias("r"),
            F.split(_g(cols, "_c:dst_tags"), ";").alias("c"),
        )
        pairs = F.flatten(
            F.transform(
                src_zip,
                lambda s: F.transform(
                    dst_zip,
                    lambda d: _req(
                        kind=F.lit("conn"),
                        through_tag=tag,
                        through_tag_c=_g(cols, "_c:designation"),
                        src_tag=s["r"],
                        src_tag_c=s["c"],
                        dst_tag=d["r"],
                        dst_tag_c=d["c"],
                        through_attrs=attrs,
                        loc_attrs=loc,
                    ),
                ),
            )
        )
        ok = F.concat(pairs, _one(_req(kind=F.lit("pool"), attrs=attrs)))
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty topology tag (is that intended?): `", tag,
                    "` from=`", tags_src, "` to=`", tags_dst,
                    "` route=`", tags_route, "`",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    def _wires(self, cols: Column, attrs: Column, loc: Column) -> Column:
        tag_src, tag_dst = _g(cols, "src_pin_tag"), _g(cols, "dst_pin_tag")
        bad = (tag_src == "") | (tag_dst == "")
        ok = _one(
            _req(
                kind=F.lit("cwl"),
                src_pin_tag=tag_src,
                src_pin_tag_c=_g(cols, "_c:src_pin_tag"),
                dst_pin_tag=tag_dst,
                dst_pin_tag_c=_g(cols, "_c:dst_pin_tag"),
                link_attrs=attrs,
                attrs=attrs,
                loc_attrs=loc,
            )
        )
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty wire connection info (is that intended?): from=`",
                    tag_src, "` to=`", tag_dst, "`",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    def _cable_diagram(self, cols: Column, attrs: Column, loc: Column) -> Column:
        """Also reused for each terminal-diagram side (T9)."""
        tag = _g(cols, "cable_tag")
        tag_src, tag_dst = _g(cols, "src_tag"), _g(cols, "dst_tag")
        pin_src, pin_dst = _g(cols, "src_pin"), _g(cols, "dst_pin")
        bad = (tag_src == "") & (tag_dst == "") & (pin_src == "") & (pin_dst == "")
        ts, cts = F.split(tag_src, ";"), F.split(_g(cols, "_c:src_tag"), ";")
        ps = F.split(pin_src, ";")
        cs, ccs = F.split(tag, ";"), F.split(_g(cols, "_c:cable_tag"), ";")
        td, ctd = F.split(tag_dst, ";"), F.split(_g(cols, "_c:dst_tag"), ";")
        pd = F.split(pin_dst, ";")
        # zip of src triples x dst pairs (page_processor.py:408-422);
        # Python zip truncates to the shortest list -> slice+least
        src_zip = F.slice(
            F.arrays_zip(ts.alias("t"), cts.alias("ct"), ps.alias("p"),
                         cs.alias("c"), ccs.alias("cc")),
            1, F.least(F.size(ts), F.size(ps), F.size(cs)),
        )
        dst_zip = F.slice(
            F.arrays_zip(td.alias("t"), ctd.alias("ct"), pd.alias("p")),
            1, F.least(F.size(td), F.size(pd)),
        )
        pairs = F.flatten(
            F.transform(
                src_zip,
                lambda sp: F.transform(
                    dst_zip,
                    lambda dp: _req(
                        kind=F.lit("cwl"),
                        through_tag=F.when(sp["c"] != "", sp["c"]),
                        through_tag_c=sp["cc"],
                        src_pin_tag=F.concat(sp["t"], F.lit(":"), sp["p"]),
                        src_pin_tag_c=F.concat(sp["ct"], F.lit(":"), sp["p"]),
                        dst_pin_tag=F.concat(dp["t"], F.lit(":"), dp["p"]),
                        dst_pin_tag_c=F.concat(dp["ct"], F.lit(":"), dp["p"]),
                        link_attrs=attrs,
                        loc_attrs=loc,
                    ),
                ),
            )
        )
        ok = F.concat(pairs, _one(_req(kind=F.lit("pool"), attrs=attrs)))
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty cable diagram info (is that intended?): `", tag,
                    "` from=`", tag_src, "``", pin_src,
                    "` to=`", tag_dst, "``", pin_dst, "` ",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    def _structure(self, cols: Column, attrs: Column) -> Column:
        return _one(
            _req(kind=F.lit("aspect"), raw_tag=_g(cols, "tag"), attrs=attrs)
        )

    def _plc(self, cols: Column, attrs: Column) -> Column:
        tag, plc_addr = _g(cols, "tag"), _g(cols, "plc_addr")
        bad = (tag == "") | (plc_addr == "")
        ok = _one(
            _req(
                kind=F.lit("xreq"),
                raw_tag=tag,
                raw_tag_c=_g(cols, "_c:tag"),
                target_type=F.lit("device"),
                attrs=attrs,
            )
        )
        err = _one(
            _err_req(
                _concat_str(
                    "row #", F.col("row_idx"),
                    " skipped: empty PLC diagram info (is that intended?): `",
                    tag, "` addr=`", plc_addr, "`",
                )
            )
        )
        return F.when(bad, err).otherwise(ok)

    @staticmethod
    def _terminal_side(prefix: str) -> Column:
        """_1/_2-prefixed columns merged over the base columns
        (page_processor.py:503-521)."""
        base = F.map_filter(
            F.col("cols"), lambda k, v: ~(k.startswith("_1") | k.startswith("_2"))
        )

        def keep(k, v):
            return k.startswith(prefix)

        def strip(k, v):
            return F.substring(k, 3, 100000)

        side = F.transform_keys(F.map_filter(F.col("cols"), keep), strip)
        return F.map_concat(base, side)

    _SIMPLE_EXCLUDE = {
        "connection_list": ["src_pin_tag", "dst_pin_tag", "name"],
        "device_tag_list": ["tag"],
        "cable_overview": ["cable_tag", "src_tag", "dst_tag"],
        "topology": ["designation", "src_tags", "dst_tags", "route"],
        "wires_part_list": ["src_pin_tag", "dst_pin_tag", "route"],
        "cable_diagram": ["cable_tag", "src_tag", "src_pin", "dst_tag", "dst_pin"],
        "structure_identifier_overview": ["tag"],
    }

    def _branch_exprs(self, page_type: str) -> tuple[list, "Column"]:
        """The branch's unresolved expression trees: an ordered list of
        precomputed (name, Column) pairs plus the request-array Column.

        Pure plan-building (no DataFrame, no jobs): every Column here
        references input columns by NAME only and depends on nothing but
        ``page_type`` and class-level constants, so the trees are
        memoized per (application, page_type) in ``_BRANCH_EXPR_CACHE``
        — building them is thousands of py4j round-trips (~3-5s for all
        nine branches, guide §1.2 "per-task work" at the driver), paid
        once per JVM instead of once per assemble() call.
        """
        cols = F.col("cols")
        pre: list = [("_loc_a", _loc_attrs())]

        def base_attrs(c: Column, ptype: str) -> Column:
            return F.concat(_simple_attrs(c, self._SIMPLE_EXCLUDE[ptype]), F.col("_loc_a"))

        attrs, loc_a = F.col("_attrs"), F.col("_loc_a")
        if page_type == "connection_list":
            pre.append(("_attrs", base_attrs(cols, page_type)))
            req = self._connection_list(cols, attrs, loc_a)
        elif page_type == "device_tag_list":
            pre.append(("_attrs", base_attrs(cols, page_type)))
            req = self._device_tag_list(cols, attrs)
        elif page_type == "cable_overview":
            pre.append(("_attrs", base_attrs(cols, page_type)))
            req = self._cable_overview(cols, attrs, loc_a)
        elif page_type == "topology":
            pre.append(
                (
                    "_attrs",
                    F.concat(
                        base_attrs(cols, page_type),
                        F.array(_routing_attr(_g(cols, "route"))),
                    ),
                )
            )
            req = self._topology(cols, attrs, loc_a)
        elif page_type == "wires_part_list":
            pre.append(
                (
                    "_attrs",
                    F.concat(
                        base_attrs(cols, page_type),
                        F.when(
                            _g(cols, "route") != "",
                            F.array(_routing_attr(_g(cols, "route"))),
                        ).otherwise(F.expr(EMPTY_ATTRS)),
                    ),
                )
            )
            req = self._wires(cols, attrs, loc_a)
        elif page_type == "cable_diagram":
            pre.append(("_attrs", base_attrs(cols, page_type)))
            req = self._cable_diagram(cols, attrs, loc_a)
        elif page_type == "terminal_diagram":
            cable_excl = self._SIMPLE_EXCLUDE["cable_diagram"]
            pre.extend(
                [
                    ("_cols1", self._terminal_side("_1")),
                    ("_cols2", self._terminal_side("_2")),
                    (
                        "_attrs1",
                        F.concat(_simple_attrs(F.col("_cols1"), cable_excl), loc_a),
                    ),
                    (
                        "_attrs2",
                        F.concat(_simple_attrs(F.col("_cols2"), cable_excl), loc_a),
                    ),
                ]
            )
            req = F.concat(
                self._cable_diagram(F.col("_cols1"), F.col("_attrs1"), loc_a),
                self._cable_diagram(F.col("_cols2"), F.col("_attrs2"), loc_a),
            )
        elif page_type == "structure_identifier_overview":
            pre.append(("_attrs", base_attrs(cols, page_type)))
            req = self._structure(cols, attrs)
        elif page_type == "plc_diagram":
            pre.append(("_attrs", F.concat(F.array(_plc_attr(cols)), loc_a)))
            req = self._plc(cols, attrs)
        else:  # pragma: no cover - guarded by HANDLED_PAGE_TYPES
            raise KeyError(page_type)
        return pre, req

    def _branch(self, rows: DataFrame, page_type: str) -> DataFrame:
        """One per-page-type branch: filter -> branch-specific precompute
        -> request projection -> explode.

        Design note (measured, scripts/profile_union.py): a single CASE
        projection over all 9 handlers compiles to one giant janino
        class (~35s one-time compile, and too wide for whole-stage
        codegen). Nine small per-type projections compile in ~2s each
        and execute codegen'd, cutting the assembly fixed cost >2x.
        Each branch re-scans the rows input with a pushable
        page_type filter — at warehouse scale the rows stage table is
        partitioned by page_type, so the 9 scans prune to 1 full pass.

        The precomputed ``_attrs``/``_loc_a`` (and terminal ``_cols1/2``)
        columns hold the expensive md5+to_json attribute arrays so they
        are evaluated once per row, never per emitted request element.
        The expression trees come from the per-application memo (see
        ``_branch_exprs``); only the cheap filter/withColumn/select
        application happens per call.
        """
        sc = rows.sparkSession.sparkContext
        key = (sc.applicationId, type(self).__qualname__, page_type)
        cached = _BRANCH_EXPR_CACHE.get(key)
        if cached is None:
            # build OUTSIDE the lock (py4j-heavy, parallelizes across
            # the branch thread pool); mutate under it
            cached = self._branch_exprs(page_type)
            with _BRANCH_EXPR_LOCK:
                # drop entries from previous (stopped) applications:
                # their py4j column handles point into a dead JVM
                stale = [
                    k for k in list(_BRANCH_EXPR_CACHE)
                    if k[0] != sc.applicationId
                ]
                for k in stale:
                    _BRANCH_EXPR_CACHE.pop(k, None)
                _BRANCH_EXPR_CACHE[key] = cached
        pre, req = cached
        b = rows.where(F.col("page_type") == page_type)
        for name, col in pre:
            b = b.withColumn(name, col)
        # explode_outer + isNotNull instead of a bare explode: the
        # non-outer Generate plants an implicit `size(reqs)>0` filter
        # that the optimizer pushes BELOW the request projection by
        # substitution — re-evaluating the entire (interpreted,
        # HOF-laden) request expression once more per input row
        # (guide §4.4's duplication, measured 2.8-4.4x per branch).
        # Equivalent output: request elements are constructed structs
        # (never NULL), and for a NULL/empty array both forms drop the
        # row (outer emits r=NULL which the filter removes).
        return (
            b.withColumn("reqs", req)
            .select(
                "url", "page_no", "footer_tags",
                F.explode_outer("reqs").alias("r"),
            )
            .where(F.col("r").isNotNull())
            .select("url", "page_no", "footer_tags", "r.*")
        )

    HANDLED_PAGE_TYPES = (
        "connection_list",
        "device_tag_list",
        "cable_overview",
        "topology",
        "wires_part_list",
        "cable_diagram",
        "terminal_diagram",
        "structure_identifier_overview",
        "plc_diagram",
    )

    # -- the per-type branches + finishers ------------------------------

    def requests_table(self, rows: DataFrame) -> DataFrame:
        """The typed-request stage table: union of the 9 per-page-type
        branches. At warehouse scale this is a real intermediate table
        (write it, then run ``finish`` as a separate restartable job)."""
        from concurrent.futures import ThreadPoolExecutor

        rows = rows.select(
            "url", "page_no", "page_type", "footer_tags", "row_idx", "cols", "loc_repr"
        )
        # branch construction is pure plan building (no jobs); the cost
        # is py4j round-trip latency, which parallelizes across threads
        # (measured 5.4s -> 3.0s at 9 branches)
        with ThreadPoolExecutor(len(self.HANDLED_PAGE_TYPES)) as pool:
            parts = list(
                pool.map(lambda pt: self._branch(rows, pt), self.HANDLED_PAGE_TYPES)
            )
        reqs = parts[0]
        for p in parts[1:]:
            reqs = reqs.unionByName(p)
        return reqs

    def assemble(self, rows: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
        """persist=True caches the two fan-out points (the exploded
        requests feed 6 finisher families; conn_all feeds 5 outputs) —
        at warehouse scale the same role is played by materializing
        stage tables."""
        if persist:
            # materialize the branch INPUT once (guide §2.4 "two
            # operations keyed the same way can share one pass"): the
            # nine per-type branches each re-run the upstream
            # scan+explode+project otherwise — 9 full parquet decodes of
            # the extracted table per assemble. One narrow eager
            # localCheckpoint of the 7 needed columns turns that into
            # 1 decode + 9 in-memory scans (measured ~2x on the request
            # stage at sf1.0). At warehouse scale the equivalent is the
            # page_type-partitioned rows stage table the branch
            # docstring describes.
            rows = rows.select(
                "url", "page_no", "page_type", "footer_tags",
                "row_idx", "cols", "loc_repr",
            ).localCheckpoint(eager=True)
        reqs = self.requests_table(rows)
        if persist:
            # localCheckpoint (not just persist): the request-building
            # projections are large, and every downstream action would
            # re-run Catalyst analysis over them; truncating the lineage
            # here makes all 9 output plans small. At warehouse scale
            # the equivalent is writing the requests stage table.
            #
            # coalesce first: the 9-branch union carries 9x the scan
            # partitions, the checkpointed RDD freezes that count, and
            # finisher plans scan reqs up to 7x per stage — without the
            # coalesce a single count ran 2016 sub-millisecond tasks
            # (pure scheduler overhead, measured 44-58s per output at
            # sf0.01). Narrow dependency, no shuffle.
            n = rows.sparkSession.sparkContext.defaultParallelism
            reqs = reqs.coalesce(n).localCheckpoint(eager=True)
            # the rows checkpoint fed exactly that materialization —
            # release its blocks now instead of holding a second copy
            # of the corpus in executor storage until context cleanup
            from .dedup import _release_local_checkpoint

            _release_local_checkpoint(rows)
        return self.finish(reqs, persist=persist)

    def finish(self, reqs: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
        """Entity tables from a (possibly persisted/read-back) requests
        stage table — the God-merge finisher layer."""

        handler_errors = reqs.where(F.col("kind") == "error").select(
            "url", "page_no", F.lit("WARNING").alias("severity"),
            F.col("message").alias("message"),
        )
        attr_pool = reqs.select("attrs", "link_attrs", "through_attrs", "loc_attrs")
        xreq = reqs.where(F.col("kind") == "xreq")
        aspect_req = reqs.where(F.col("kind") == "aspect")

        # ---- create_connection_with_link guards (god.py:507-533) ----
        def split_pin(col: Column):
            pos = F.instr(col, ":")
            tag = F.when(pos > 0, F.substring(col, 1, pos - 1)).otherwise(col)
            pin = F.when(pos > 0, F.substr(col, pos)).otherwise(F.lit(None))
            return tag, pin

        cwl = reqs.where(F.col("kind") == "cwl")
        s_tag, s_pin = split_pin(F.col("src_pin_tag"))
        d_tag, d_pin = split_pin(F.col("dst_pin_tag"))
        sc_tag, _ = split_pin(F.col("src_pin_tag_c"))
        dc_tag, _ = split_pin(F.col("dst_pin_tag_c"))
        cwl = (
            cwl.withColumn("src_tag", s_tag)
            .withColumn("src_pin", s_pin)
            .withColumn("dst_tag", d_tag)
            .withColumn("dst_pin", d_pin)
            .withColumn("src_tag_c", sc_tag)
            .withColumn("dst_tag_c", dc_tag)
        )
        no_pins = (
            F.col("src_pin").isNull() | (F.col("src_pin") == "")
            | F.col("dst_pin").isNull() | (F.col("dst_pin") == "")
        )
        pin_errors = cwl.where(no_pins).select(
            "url", "page_no", F.lit("WARNING").alias("severity"),
            _concat_str(
                "Linked connection where one/no pins specified: `",
                F.coalesce(F.col("src_pin"), F.lit("None")), "` `",
                F.coalesce(F.col("dst_pin"), F.lit("None")), "`",
            ).alias("message"),
        )
        cwl = cwl.where(~no_pins)
        no_tags = (F.col("src_tag") == "") | (F.col("dst_tag") == "")
        tag_errors = cwl.where(no_tags).select(
            "url", "page_no", F.lit("WARNING").alias("severity"),
            _concat_str(
                "Linked connection where one/no targets specified: `",
                F.col("src_tag"), "` `", F.col("dst_tag"), "`",
            ).alias("message"),
        )
        cwl = cwl.where(~no_tags)

        # ---- connections (both paths) --------------------------------
        base_cols = ["url", "page_no", "footer_tags"]
        cwl_conn = cwl.select(
            *base_cols, "through_tag", "through_tag_c",
            "src_tag", "src_tag_c", "dst_tag", "dst_tag_c",
            F.col("loc_attrs").alias("through_attrs"), "loc_attrs",
            "src_pin", "dst_pin", "link_attrs",
            F.lit(True).alias("with_link"),
        )
        conn_only = reqs.where(F.col("kind") == "conn").select(
            *base_cols, "through_tag", "through_tag_c",
            "src_tag", "src_tag_c", "dst_tag", "dst_tag_c",
            "through_attrs", "loc_attrs",
            F.lit(None).cast("string").alias("src_pin"),
            F.lit(None).cast("string").alias("dst_pin"),
            F.expr(EMPTY_ATTRS).alias("link_attrs"),
            F.lit(False).alias("with_link"),
        )
        conn_all = cwl_conn.unionByName(conn_only)

        # normalize empty through -> null ('' is falsy in god.py:484-489)
        conn_all = conn_all.withColumn(
            "through_tag",
            F.when(F.col("through_tag") == "", None).otherwise(F.col("through_tag")),
        )

        # completed tags come from the extraction kernel ('_c:' columns).
        # Pin-tag prohibition: create_xtarget returns None for raw tags
        # containing ':' (god.py:351-354)
        def completed(raw_col: str, c_col: str):
            return F.when(
                F.col(raw_col).isNull() | F.col(raw_col).contains(":"), None
            ).otherwise(F.col(c_col))

        conn_all = (
            conn_all.withColumn("through_completed", completed("through_tag", "through_tag_c"))
            .withColumn("src_completed", completed("src_tag", "src_tag_c"))
            .withColumn("dst_completed", completed("dst_tag", "dst_tag_c"))
            .withColumn("through_guid", G.xtarget_guid(F.col("through_completed")))
            .withColumn("src_guid", G.xtarget_guid(F.col("src_completed")))
            .withColumn("dst_guid", G.xtarget_guid(F.col("dst_completed")))
            .withColumn(
                "conn_guid",
                G.connection_guid(
                    F.col("src_guid"), F.col("dst_guid"), F.col("through_guid")
                ),
            )
        )
        if persist:
            # feeds connections, links, pins, xtargets (3 roles), lineage
            # (plan is small once reqs is checkpointed -> lazy cache)
            conn_all = conn_all.persist()

        connections = conn_all.select(
            F.col("conn_guid").alias("guid"), "src_guid", "dst_guid", "through_guid"
        ).dropDuplicates(["guid"])

        # ---- links + pins --------------------------------------------
        linked = conn_all.where("with_link").withColumn(
            "link_name",
            F.coalesce(F.col("through_tag"), F.lit("virtual_link")),
        ).withColumn(
            "link_guid",
            G.link_guid(
                F.col("link_name"), F.col("src_pin"), F.col("dst_pin"), F.col("conn_guid")
            ),
        )

        links = linked.select(
            F.col("link_guid").alias("guid"),
            F.col("link_name").alias("name"),
            F.col("conn_guid").alias("connection_guid"),
            F.col("src_pin").alias("src_pin_name"),
            F.col("dst_pin").alias("dest_pin_name"),
        ).dropDuplicates(["guid"])

        # explode_outer + isNotNull (not bare explode): the implicit
        # size()>0 filter of a non-outer Generate is pushed below the
        # projection and re-runs BOTH pin-chain md5 folds per row
        # (guide §4.4 duplication — same fix as the branch explode).
        # Chain elements are array_append'ed structs, never NULL.
        pins = (
            linked.select(
                F.explode_outer(
                    F.concat(
                        G.pin_chain_expr("src_pin", "src", "link_guid"),
                        G.pin_chain_expr("dst_pin", "dst", "link_guid"),
                    )
                ).alias("p")
            )
            .where(F.col("p").isNotNull())
            .select("p.*")
            .dropDuplicates(["guid"])
        )

        # ---- xtargets -------------------------------------------------
        x_parts = [
            xreq.withColumn("completed", completed("raw_tag", "raw_tag_c"))
            .where(F.col("completed").isNotNull())
            .select(*base_cols, "completed", "target_type", "attrs")
        ]
        for role, ttype, attr_col in (
            ("through", "cable", "through_attrs"),
            ("src", "device", "loc_attrs"),
            ("dst", "device", "loc_attrs"),
        ):
            x_parts.append(
                conn_all.where(F.col(f"{role}_completed").isNotNull()).select(
                    *base_cols,
                    F.col(f"{role}_completed").alias("completed"),
                    F.lit(ttype).alias("target_type"),
                    F.col(attr_col).alias("attrs"),
                )
            )
        xall = x_parts[0]
        for p in x_parts[1:]:
            xall = xall.unionByName(p)
        xall = xall.withColumn("guid", G.xtarget_guid(F.col("completed")))
        if persist:
            xall = xall.persist()  # feeds xtargets, aspects, attachments, lineage

        xtargets = (
            xall.groupBy("guid")
            .agg(
                F.first("completed").alias("tag"),
                F.max(_pri(F.col("target_type"))).alias("pri"),
            )
            .select("guid", "tag", _pri_name(F.col("pri")).alias("target_type"))
        )

        # invalid-tag warnings: once per unique tag, attributed to the
        # smallest (url, page_no) encounter (deterministic stand-in for
        # the reference's first-encounter attribution, god.py:288-292)
        distinct_tags = xall.groupBy(F.col("completed").alias("tag")).agg(
            F.min(F.struct("url", "page_no")).alias("at")
        )
        distinct_tags = distinct_tags.withColumn("parts", self.tag_parts(F.col("tag")))
        if persist:
            # tiny (one row per unique tag) but feeds 4 outputs, and a
            # filter on the pandas-UDF output column would otherwise
            # duplicate the whole aggregate+UDF subtree per consumer
            distinct_tags = distinct_tags.persist()
        invalid_errors = distinct_tags.where(F.size("parts") == 0).select(
            F.col("at.url").alias("url"),
            F.col("at.page_no").alias("page_no"),
            F.lit("WARNING").alias("severity"),
            F.concat(F.lit("Tag is invalid: "), F.col("tag")).alias("message"),
        )

        # ---- xtarget <-> aspect relation with sort_order ---------------
        # (W3, reference db_builder/db.py:222-240): aspects per xtarget
        # enumerated in config separator order; empty levels contribute
        # the empty-value aspect; sort_order = position in the flattened
        # enumeration. Derived from distinct_tags (the parts UDF already
        # ran there), so this costs one posexplode, no extra UDF pass.
        empty_sv = "cast(array() as array<struct<sep:string,value:string>>)"

        def _sep_entries(sep: str) -> Column:
            # closure factory, NOT `lambda v, s=sep`: pyspark HOF lambda
            # arity counts default args and would bind s to the index
            def entry(v: Column) -> Column:
                return F.struct(F.lit(sep).alias("sep"), v.alias("value"))

            return F.coalesce(
                F.transform(
                    F.when(
                        F.size(F.try_element_at("parts", F.lit(sep))) == 0,
                        F.array(F.lit("")),
                    ).otherwise(F.try_element_at("parts", F.lit(sep))),
                    entry,
                ),
                F.expr(empty_sv),
            )

        flat_parts = F.flatten(
            F.array(*[_sep_entries(sep) for sep in self.config.separators])
        )
        xtarget_aspects = (
            distinct_tags.where(F.size("parts") > 0)
            .select("tag", F.posexplode(flat_parts).alias("sort_order", "a"))
            .select(
                G.xtarget_guid(F.col("tag")).alias("xtarget_guid"),
                G.aspect_guid(F.col("a.sep"), F.col("a.value")).alias("aspect_guid"),
                "sort_order",
            )
        )

        # ---- aspects ----------------------------------------------------
        # from tags: one aspect per (separator, value); empty levels of
        # the priority slice become (sep, '') (god.py:269-286)
        tag_aspects = (
            distinct_tags.where(F.size("parts") > 0)
            .select(F.explode("parts").alias("sep", "vals"))
            .select(
                "sep",
                F.explode(
                    F.when(F.size("vals") == 0, F.array(F.lit(""))).otherwise(
                        F.col("vals")
                    )
                ).alias("value"),
            )
        )
        parsed = aspect_req.withColumn("p", self.single_aspect(F.col("raw_tag")))
        aspect_errors = parsed.where(F.col("p.status") != 0).select(
            "url", "page_no", F.lit("WARNING").alias("severity"),
            F.when(
                F.col("p.status") == 1,
                _concat_str(
                    "Failed to create aspect with tag: '", F.col("raw_tag"), "'"
                ),
            )
            .otherwise(
                _concat_str(
                    "Failed to create aspect with tag: '", F.col("raw_tag"),
                    "' - has composite structure",
                )
            )
            .alias("message"),
        )
        ok_aspects = parsed.where(F.col("p.status") == 0).select(
            F.col("p.sep").alias("sep"), F.col("p.value").alias("value"), "attrs"
        )
        aspect_attach = ok_aspects.select(
            G.aspect_guid(F.col("sep"), F.col("value")).alias("object_guid"),
            F.explode("attrs").alias("a"),
        ).select("object_guid", F.col("a.guid").alias("attribute_guid"))

        aspects = (
            tag_aspects.unionByName(ok_aspects.select("sep", "value"))
            .select(
                G.aspect_guid(F.col("sep"), F.col("value")).alias("guid"),
                F.col("sep").alias("separator"),
                "value",
            )
            .dropDuplicates(["guid"])
        )

        # ---- attributes registry + attachments -------------------------
        attributes = (
            attr_pool.select(
                F.explode(
                    F.concat("attrs", "link_attrs", "through_attrs", "loc_attrs")
                ).alias("a")
            )
            .select("a.*")
            .dropDuplicates(["guid"])
        )

        object_attributes = (
            xall.select(
                F.col("guid").alias("object_guid"), F.explode("attrs").alias("a")
            )
            .select("object_guid", F.col("a.guid").alias("attribute_guid"))
            .unionByName(
                linked.select(
                    F.col("link_guid").alias("object_guid"),
                    F.explode("link_attrs").alias("a"),
                ).select("object_guid", F.col("a.guid").alias("attribute_guid"))
            )
            .unionByName(aspect_attach)
            .distinct()
        )

        # ---- lineage -----------------------------------------------------
        lineage = (
            xall.select(
                "url", "page_no", F.col("guid").alias("object_guid"),
                F.lit("xtarget").alias("object_type"),
            )
            .unionByName(
                conn_all.select(
                    "url", "page_no", F.col("conn_guid").alias("object_guid"),
                    F.lit("connection").alias("object_type"),
                )
            )
            .unionByName(
                linked.select(
                    "url", "page_no", F.col("link_guid").alias("object_guid"),
                    F.lit("link").alias("object_type"),
                )
            )
            .distinct()
        )

        errors = (
            handler_errors.unionByName(pin_errors)
            .unionByName(tag_errors)
            .unionByName(invalid_errors)
            .unionByName(aspect_errors)
        )

        return {
            "xtargets": xtargets,
            "xtarget_aspects": xtarget_aspects,
            "aspects": aspects,
            "connections": connections,
            "links": links,
            "pins": pins,
            "attributes": attributes,
            "object_attributes": object_attributes,
            "lineage": lineage,
            "errors": errors,
        }


def assemble(rows: DataFrame, config: AspectsConfig = DEFAULT_ASPECTS) -> dict[str, DataFrame]:
    return Assembler(config).assemble(rows)
