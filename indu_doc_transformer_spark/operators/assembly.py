"""Relational entity assembly: normalized extraction rows -> deduplicated
entity tables, entirely in DataFrame algebra.

This is the Spark-first re-expression of the reference's God factory
layer (god.py:237-565) and per-type page handlers
(page_processor.py:107-521). Where the reference upserts into
in-memory dicts row by row, we:

- branch rows by page_type into handler subplans (T12),
- expand ';'-products with explode (J6) and arrays_zip (zip-truncation
  matched with slice+least),
- complete tags against footers with one Arrow-batched pandas UDF (F5),
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
from ..functions.tags import (
    make_complete_tag_udf,
    make_single_aspect_udf,
    make_tag_parts_udf,
)

ATTR_TYPE = "array<struct<guid:string,name:string,type:string,value_json:string>>"

TYPE_PRIORITY = {"cable": 3, "device": 2, "strip": 1, "other": 0}


def _pri(type_col: Column) -> Column:
    c = F.when(type_col == "cable", 3).when(type_col == "device", 2)
    return c.when(type_col == "strip", 1).otherwise(0)


def _pri_name(pri_col: Column) -> Column:
    c = F.when(pri_col == 3, "cable").when(pri_col == 2, "device")
    return c.when(pri_col == 1, "strip").otherwise("other")


def _get(name: str) -> Column:
    """str(row[name]).strip() with missing-key -> '' (handler accessor)."""
    return F.trim(F.coalesce(F.try_element_at("cols", F.lit(name)), F.lit("")))


def _simple_attrs(exclude: list[str]) -> Column:
    """SIMPLE attributes from every non-excluded, non-meta, non-empty
    column (page_processor.py:122-130 pattern)."""
    entries = F.filter(
        F.map_entries("cols"),
        lambda e: (~e["key"].isin(exclude))
        & (~e["key"].startswith("_"))
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
        F.expr(f"cast(array() as {ATTR_TYPE})")
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


def _plc_attr() -> Column:
    """PLC_ADDRESS attribute: address + sorted k=v metadata
    (attributes.py:492-500)."""
    entries = F.array_sort(
        F.transform(
            F.filter(
                F.map_entries("cols"),
                lambda e: (~e["key"].isin(["tag", "plc_addr"]))
                & (~e["key"].startswith("_"))
                & (F.trim(e["value"]) != ""),
            ),
            lambda e: F.struct(e["key"].alias("key"), F.trim(e["value"]).alias("value")),
        )
    )
    addr = _get("plc_addr")
    return F.struct(
        G.plc_address_attribute_guid(addr, F.map_from_entries(entries)).alias("guid"),
        addr.alias("name"),
        F.lit("PLC_ADDRESS").alias("type"),
        F.to_json(F.struct(F.map_from_entries(entries).alias("meta"))).alias("value_json"),
    )


def _err(msg: Column) -> list[Column]:
    return [
        F.col("url"),
        F.col("page_no"),
        F.lit("WARNING").alias("severity"),
        msg.alias("message"),
    ]


_BASE = ["url", "page_no", "footer_tags"]


def _split_pin(col: Column) -> tuple[Column, Column]:
    """split_pin_tag (common_utils.py:41-61): (tag, ':pin' | null)."""
    pos = F.instr(col, ":")
    tag = F.when(pos > 0, F.substring(col, 1, pos - 1)).otherwise(col)
    pin = F.when(pos > 0, F.substr(col, pos)).otherwise(F.lit(None))
    return tag, pin


class Assembler:
    """Builds the entity tables from a normalized rows DataFrame
    (operators/extraction.rows_table output)."""

    def __init__(self, config: AspectsConfig = DEFAULT_ASPECTS):
        self.config = config
        self.complete_tag = make_complete_tag_udf(config)
        self.tag_parts = make_tag_parts_udf(config)
        self.single_aspect = make_single_aspect_udf(config)

    # -- per-type handler subplans ------------------------------------
    # Each returns a dict with optional keys:
    #   xreq(url,page_no,footer_tags,raw_tag,target_type,attrs)
    #   conn(url,page_no,footer_tags,through_tag,src_tag,dst_tag,
    #        through_attrs,loc_attrs)              -- create_connection
    #   cwl (conn cols + src_pin_tag,dst_pin_tag,link_attrs)
    #                                     -- create_connection_with_link
    #   aspect_req(url,page_no,raw_tag,attrs)
    #   attr_pool(attrs)     errors(url,page_no,severity,message)

    def _h_connection_list(self, df: DataFrame) -> dict:
        df = df.withColumn("tag_from", _get("src_pin_tag")).withColumn(
            "tag_to", _get("dst_pin_tag")
        )
        bad = (F.col("tag_from") == "") | (F.col("tag_to") == "")
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: one/both of the connection targets are empty (is that intended?): `"),
                    F.col("tag_from"), F.lit("` `"), F.col("tag_to"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs",
            F.concat(_simple_attrs(["src_pin_tag", "dst_pin_tag", "name"]), _loc_attrs()),
        ).withColumn("loc_attrs", _loc_attrs())
        cwl = ok.select(
            *_BASE,
            F.lit(None).cast("string").alias("through_tag"),
            F.lit(None).cast("string").alias("through_tag_c"),
            F.col("tag_from").alias("src_pin_tag"),
            _get("_c:src_pin_tag").alias("src_pin_tag_c"),
            F.col("tag_to").alias("dst_pin_tag"),
            _get("_c:dst_pin_tag").alias("dst_pin_tag_c"),
            F.col("attrs").alias("link_attrs"),
            "loc_attrs",
        )
        return {"cwl": cwl, "attr_pool": ok.select(F.col("attrs")), "errors": errors}

    def _h_device_tag_list(self, df: DataFrame) -> dict:
        df = df.withColumn("tag", _get("tag"))
        bad = F.col("tag") == ""
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty device tag (is that intended?): `"),
                    F.col("tag"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs", F.concat(_simple_attrs(["tag"]), _loc_attrs())
        )
        xreq = ok.select(
            *_BASE,
            F.col("tag").alias("raw_tag"),
            _get("_c:tag").alias("raw_tag_c"),
            F.lit("device").alias("target_type"),
            "attrs",
        )
        return {"xreq": xreq, "attr_pool": ok.select("attrs"), "errors": errors}

    def _h_cable_overview(self, df: DataFrame) -> dict:
        df = (
            df.withColumn("tag", _get("cable_tag"))
            .withColumn("tag_from", _get("src_tag"))
            .withColumn("tag_to", _get("dst_tag"))
        )
        bad = (F.col("tag") == "") | (
            (F.col("tag_from") == "") & (F.col("tag_to") == "")
        )
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty cable tag (is that intended?): `"),
                    F.col("tag"), F.lit("` from=`"), F.col("tag_from"),
                    F.lit("` to=`"), F.col("tag_to"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs",
            F.concat(_simple_attrs(["cable_tag", "src_tag", "dst_tag"]), _loc_attrs()),
        ).withColumn("loc_attrs", _loc_attrs())
        conn = ok.where((F.col("tag_from") != "") & (F.col("tag_to") != "")).select(
            *_BASE,
            F.col("tag").alias("through_tag"),
            _get("_c:cable_tag").alias("through_tag_c"),
            F.col("tag_from").alias("src_tag"),
            _get("_c:src_tag").alias("src_tag_c"),
            F.col("tag_to").alias("dst_tag"),
            _get("_c:dst_tag").alias("dst_tag_c"),
            F.col("attrs").alias("through_attrs"),
            "loc_attrs",
        )
        return {"conn": conn, "attr_pool": ok.select("attrs"), "errors": errors}

    def _h_topology(self, df: DataFrame) -> dict:
        df = (
            df.withColumn("tag", _get("designation"))
            .withColumn("tags_src", _get("src_tags"))
            .withColumn("tags_dst", _get("dst_tags"))
            .withColumn("tags_route", _get("route"))
        )
        bad = (
            (F.col("tag") == "")
            | (F.col("tags_src") == "")
            | (F.col("tags_dst") == "")
            | (F.col("tags_route") == "")
        )
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty topology tag (is that intended?): `"),
                    F.col("tag"), F.lit("` from=`"), F.col("tags_src"),
                    F.lit("` to=`"), F.col("tags_dst"),
                    F.lit("` route=`"), F.col("tags_route"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs",
            F.concat(
                _simple_attrs(["designation", "src_tags", "dst_tags", "route"]),
                _loc_attrs(),
                F.array(_routing_attr(F.col("tags_route"))),
            ),
        ).withColumn("loc_attrs", _loc_attrs())
        # J6: cartesian of ';'-split src x dst (page_processor.py:299-304),
        # raw pieces zipped with their kernel-completed variants
        ok = (
            ok.withColumn("rs", F.split("tags_src", ";"))
            .withColumn("cs", F.split(_get("_c:src_tags"), ";"))
            .withColumn("rd", F.split("tags_dst", ";"))
            .withColumn("cd", F.split(_get("_c:dst_tags"), ";"))
        )
        conn = (
            ok.withColumn("t1", F.explode(F.arrays_zip(F.col("rs"), F.col("cs"))))
            .withColumn("t2", F.explode(F.arrays_zip(F.col("rd"), F.col("cd"))))
            .select(
                *_BASE,
                F.col("tag").alias("through_tag"),
                _get("_c:designation").alias("through_tag_c"),
                F.col("t1.rs").alias("src_tag"),
                F.col("t1.cs").alias("src_tag_c"),
                F.col("t2.rd").alias("dst_tag"),
                F.col("t2.cd").alias("dst_tag_c"),
                F.col("attrs").alias("through_attrs"),
                "loc_attrs",
            )
        )
        return {"conn": conn, "attr_pool": ok.select("attrs"), "errors": errors}

    def _h_wires(self, df: DataFrame) -> dict:
        df = (
            df.withColumn("tag_src", _get("src_pin_tag"))
            .withColumn("tag_dst", _get("dst_pin_tag"))
            .withColumn("tags_route", _get("route"))
        )
        bad = (F.col("tag_src") == "") | (F.col("tag_dst") == "")
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty wire connection info (is that intended?): from=`"),
                    F.col("tag_src"), F.lit("` to=`"), F.col("tag_dst"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs",
            F.concat(
                _simple_attrs(["src_pin_tag", "dst_pin_tag", "route"]),
                _loc_attrs(),
                F.when(
                    F.col("tags_route") != "",
                    F.array(_routing_attr(F.col("tags_route"))),
                ).otherwise(F.expr(f"cast(array() as {ATTR_TYPE})")),
            ),
        ).withColumn("loc_attrs", _loc_attrs())
        cwl = ok.select(
            *_BASE,
            F.lit(None).cast("string").alias("through_tag"),
            F.lit(None).cast("string").alias("through_tag_c"),
            F.col("tag_src").alias("src_pin_tag"),
            _get("_c:src_pin_tag").alias("src_pin_tag_c"),
            F.col("tag_dst").alias("dst_pin_tag"),
            _get("_c:dst_pin_tag").alias("dst_pin_tag_c"),
            F.col("attrs").alias("link_attrs"),
            "loc_attrs",
        )
        return {"cwl": cwl, "attr_pool": ok.select("attrs"), "errors": errors}

    def _h_cable_diagram(self, df: DataFrame) -> dict:
        df = (
            df.withColumn("tag", _get("cable_tag"))
            .withColumn("tag_src", _get("src_tag"))
            .withColumn("tag_dst", _get("dst_tag"))
            .withColumn("pin_src", _get("src_pin"))
            .withColumn("pin_dst", _get("dst_pin"))
        )
        bad = (
            (F.col("tag_src") == "")
            & (F.col("tag_dst") == "")
            & (F.col("pin_src") == "")
            & (F.col("pin_dst") == "")
        )
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty cable diagram info (is that intended?): `"),
                    F.col("tag"), F.lit("` from=`"), F.col("tag_src"), F.lit("``"),
                    F.col("pin_src"), F.lit("` to=`"), F.col("tag_dst"), F.lit("``"),
                    F.col("pin_dst"), F.lit("` "),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs",
            F.concat(
                _simple_attrs(["cable_tag", "src_tag", "src_pin", "dst_tag", "dst_pin"]),
                _loc_attrs(),
            ),
        ).withColumn("loc_attrs", _loc_attrs())
        # zip of src triples x dst pairs (page_processor.py:408-422);
        # Python zip truncates to the shortest list — slice+least
        # reproduces that (arrays_zip pads with null instead)
        ok = (
            ok.withColumn("ts", F.split("tag_src", ";"))
            .withColumn("cts", F.split(_get("_c:src_tag"), ";"))
            .withColumn("ps", F.split("pin_src", ";"))
            .withColumn("cs", F.split("tag", ";"))
            .withColumn("ccs", F.split(_get("_c:cable_tag"), ";"))
            .withColumn("td", F.split("tag_dst", ";"))
            .withColumn("ctd", F.split(_get("_c:dst_tag"), ";"))
            .withColumn("pd", F.split("pin_dst", ";"))
        )
        src_zip = F.slice(
            F.arrays_zip(F.col("ts"), F.col("cts"), F.col("ps"), F.col("cs"), F.col("ccs")),
            1,
            F.least(F.size("ts"), F.size("ps"), F.size("cs")),
        )
        dst_zip = F.slice(
            F.arrays_zip(F.col("td"), F.col("ctd"), F.col("pd")),
            1,
            F.least(F.size("td"), F.size("pd")),
        )
        exploded = ok.withColumn("sp", F.explode(src_zip)).withColumn(
            "dp", F.explode(dst_zip)
        )
        cwl = exploded.select(
            *_BASE,
            F.when(F.col("sp.cs") != "", F.col("sp.cs")).otherwise(None).alias(
                "through_tag"
            ),
            F.col("sp.ccs").alias("through_tag_c"),
            F.concat(F.col("sp.ts"), F.lit(":"), F.col("sp.ps")).alias("src_pin_tag"),
            F.concat(F.col("sp.cts"), F.lit(":"), F.col("sp.ps")).alias("src_pin_tag_c"),
            F.concat(F.col("dp.td"), F.lit(":"), F.col("dp.pd")).alias("dst_pin_tag"),
            F.concat(F.col("dp.ctd"), F.lit(":"), F.col("dp.pd")).alias("dst_pin_tag_c"),
            F.col("attrs").alias("link_attrs"),
            "loc_attrs",
        )
        return {"cwl": cwl, "attr_pool": ok.select("attrs"), "errors": errors}

    def _h_structure(self, df: DataFrame) -> dict:
        ok = df.withColumn("tag", _get("tag")).withColumn(
            "attrs", F.concat(_simple_attrs(["tag"]), _loc_attrs())
        )
        aspect_req = ok.select(
            "url", "page_no", F.col("tag").alias("raw_tag"), "attrs"
        )
        return {"aspect_req": aspect_req, "attr_pool": ok.select("attrs")}

    def _h_plc(self, df: DataFrame) -> dict:
        df = df.withColumn("tag", _get("tag")).withColumn("plc_addr", _get("plc_addr"))
        bad = (F.col("tag") == "") | (F.col("plc_addr") == "")
        errors = df.where(bad).select(
            *_err(
                F.concat(
                    F.lit("row #"), F.col("row_idx"),
                    F.lit(" skipped: empty PLC diagram info (is that intended?): `"),
                    F.col("tag"), F.lit("` addr=`"), F.col("plc_addr"), F.lit("`"),
                )
            )
        )
        ok = df.where(~bad).withColumn(
            "attrs", F.concat(F.array(_plc_attr()), _loc_attrs())
        )
        xreq = ok.select(
            *_BASE,
            F.col("tag").alias("raw_tag"),
            _get("_c:tag").alias("raw_tag_c"),
            F.lit("device").alias("target_type"),
            "attrs",
        )
        return {"xreq": xreq, "attr_pool": ok.select("attrs"), "errors": errors}

    def _terminal_sides(self, df: DataFrame) -> DataFrame:
        """T9: split _1/_2-prefixed columns into two logical
        cable-diagram rows (page_processor.py:503-521)."""
        base = F.map_filter(
            F.col("cols"), lambda k, v: ~(k.startswith("_1") | k.startswith("_2"))
        )
        def _side(prefix: str):
            def keep(k, v):
                return k.startswith(prefix)

            def strip(k, v):
                return F.substring(k, 3, 100000)

            side = F.transform_keys(F.map_filter(F.col("cols"), keep), strip)
            return df.withColumn("cols", F.map_concat(base, side))

        return _side("_1").unionByName(_side("_2"))

    # -- shared finishers ----------------------------------------------

    def assemble(self, rows: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
        """persist=True caches the fan-out points (rows feeds 8 handler
        branches; conn_all/xall/linked feed several entity outputs) —
        without it every output table re-executes the upstream
        extraction kernel per branch. At warehouse scale the same role
        is played by materializing stage tables (pipeline.run_assembly
        reads rows back from storage)."""
        rows = rows.select(
            "url", "page_no", "page_type", "footer_tags", "row_idx", "cols", "loc_repr"
        )
        if persist:
            rows = rows.persist()

        branches = {
            "connection_list": self._h_connection_list,
            "device_tag_list": self._h_device_tag_list,
            "cable_overview": self._h_cable_overview,
            "topology": self._h_topology,
            "wires_part_list": self._h_wires,
            "cable_diagram": self._h_cable_diagram,
            "structure_identifier_overview": self._h_structure,
            "plc_diagram": self._h_plc,
        }

        outs: dict[str, list[DataFrame]] = {
            "xreq": [], "conn": [], "cwl": [], "aspect_req": [],
            "attr_pool": [], "errors": [],
        }
        for ptype, handler in branches.items():
            branch = rows.where(F.col("page_type") == ptype)
            if ptype == "cable_diagram":
                terminal = self._terminal_sides(
                    rows.where(F.col("page_type") == "terminal_diagram")
                )
                branch = branch.unionByName(terminal)
            for k, v in handler(branch).items():
                outs[k].append(v)

        def _union(dfs: list[DataFrame]) -> DataFrame | None:
            if not dfs:
                return None
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out

        xreq = _union(outs["xreq"])
        conn = _union(outs["conn"])
        cwl = _union(outs["cwl"])
        aspect_req = _union(outs["aspect_req"])
        attr_pool = _union(outs["attr_pool"])
        handler_errors = _union(outs["errors"])

        # ---- create_connection_with_link guards (god.py:507-533) ----
        src_tag, src_pin = _split_pin(F.col("src_pin_tag"))
        dst_tag, dst_pin = _split_pin(F.col("dst_pin_tag"))
        src_tag_c, _ = _split_pin(F.col("src_pin_tag_c"))
        dst_tag_c, _ = _split_pin(F.col("dst_pin_tag_c"))
        cwl = (
            cwl.withColumn("src_tag", src_tag)
            .withColumn("src_pin", src_pin)
            .withColumn("dst_tag", dst_tag)
            .withColumn("dst_pin", dst_pin)
            .withColumn("src_tag_c", src_tag_c)
            .withColumn("dst_tag_c", dst_tag_c)
        )
        no_pins = (
            F.col("src_pin").isNull() | (F.col("src_pin") == "")
            | F.col("dst_pin").isNull() | (F.col("dst_pin") == "")
        )
        pin_errors = cwl.where(no_pins).select(
            *_err(
                F.concat(
                    F.lit("Linked connection where one/no pins specified: `"),
                    F.coalesce(F.col("src_pin"), F.lit("None")),
                    F.lit("` `"),
                    F.coalesce(F.col("dst_pin"), F.lit("None")),
                    F.lit("`"),
                )
            )
        )
        cwl = cwl.where(~no_pins)
        no_tags = (F.col("src_tag") == "") | (F.col("dst_tag") == "")
        tag_errors = cwl.where(no_tags).select(
            *_err(
                F.concat(
                    F.lit("Linked connection where one/no targets specified: `"),
                    F.col("src_tag"), F.lit("` `"), F.col("dst_tag"), F.lit("`"),
                )
            )
        )
        cwl = cwl.where(~no_tags)

        # ---- connections (both paths) --------------------------------
        cwl_conn = cwl.select(
            *_BASE, "through_tag", "through_tag_c",
            "src_tag", "src_tag_c", "dst_tag", "dst_tag_c",
            F.col("loc_attrs").alias("through_attrs"), "loc_attrs",
            "src_pin", "dst_pin", "link_attrs",
            F.lit(True).alias("with_link"),
        )
        conn_all = cwl_conn
        if conn is not None:
            conn_only = conn.select(
                *_BASE, "through_tag", "through_tag_c",
                "src_tag", "src_tag_c", "dst_tag", "dst_tag_c",
                "through_attrs", "loc_attrs",
                F.lit(None).cast("string").alias("src_pin"),
                F.lit(None).cast("string").alias("dst_pin"),
                F.expr(f"cast(array() as {ATTR_TYPE})").alias("link_attrs"),
                F.lit(False).alias("with_link"),
            )
            conn_all = conn_all.unionByName(conn_only)

        # normalize empty through -> null ('' is falsy in god.py:484-489)
        conn_all = conn_all.withColumn(
            "through_tag",
            F.when(F.col("through_tag") == "", None).otherwise(F.col("through_tag")),
        )

        # completed tags were computed in the extraction kernel ('_c:'
        # columns) — no per-row Python here. Pin-tag prohibition:
        # create_xtarget returns None for raw tags with ':' (god.py:351-354)
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
        if persist:
            linked = linked.persist()  # feeds links, pins, attachments, lineage
        links = linked.select(
            F.col("link_guid").alias("guid"),
            F.col("link_name").alias("name"),
            F.col("conn_guid").alias("connection_guid"),
            F.col("src_pin").alias("src_pin_name"),
            F.col("dst_pin").alias("dest_pin_name"),
        ).dropDuplicates(["guid"])

        pins = (
            linked.select(
                F.explode(
                    F.concat(
                        G.pin_chain_expr("src_pin", "src", "link_guid"),
                        G.pin_chain_expr("dst_pin", "dst", "link_guid"),
                    )
                ).alias("p")
            )
            .select("p.*")
            .dropDuplicates(["guid"])
        )

        # ---- xtargets -------------------------------------------------
        x_parts = []
        if xreq is not None:
            x_parts.append(
                xreq.withColumn("completed", completed("raw_tag", "raw_tag_c"))
                .where(F.col("completed").isNotNull())
                .select(*_BASE, "completed", "target_type", "attrs")
            )
        for role, ttype, attr_col in (
            ("through", "cable", "through_attrs"),
            ("src", "device", "loc_attrs"),
            ("dst", "device", "loc_attrs"),
        ):
            x_parts.append(
                conn_all.where(F.col(f"{role}_completed").isNotNull()).select(
                    *_BASE,
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
        invalid_errors = distinct_tags.where(F.size("parts") == 0).select(
            F.col("at.url").alias("url"),
            F.col("at.page_no").alias("page_no"),
            F.lit("WARNING").alias("severity"),
            F.concat(F.lit("Tag is invalid: "), F.col("tag")).alias("message"),
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
        aspect_parts = [tag_aspects]
        aspect_attach = None
        aspect_errors = None
        if aspect_req is not None:
            parsed = aspect_req.withColumn("p", self.single_aspect(F.col("raw_tag")))
            aspect_errors = parsed.where(F.col("p.status") != 0).select(
                *_err(
                    F.when(
                        F.col("p.status") == 1,
                        F.concat(
                            F.lit("Failed to create aspect with tag: '"),
                            F.col("raw_tag"), F.lit("'"),
                        ),
                    ).otherwise(
                        F.concat(
                            F.lit("Failed to create aspect with tag: '"),
                            F.col("raw_tag"), F.lit("' - has composite structure"),
                        )
                    )
                )
            )
            ok_aspects = parsed.where(F.col("p.status") == 0).select(
                F.col("p.sep").alias("sep"), F.col("p.value").alias("value"), "attrs"
            )
            aspect_parts.append(ok_aspects.select("sep", "value"))
            aspect_attach = ok_aspects.select(
                G.aspect_guid(F.col("sep"), F.col("value")).alias("object_guid"),
                F.explode("attrs").alias("a"),
            ).select("object_guid", F.col("a.guid").alias("attribute_guid"))

        aspects_all = aspect_parts[0]
        for p in aspect_parts[1:]:
            aspects_all = aspects_all.unionByName(p)
        aspects = (
            aspects_all.select(
                G.aspect_guid(F.col("sep"), F.col("value")).alias("guid"),
                F.col("sep").alias("separator"),
                "value",
            )
            .dropDuplicates(["guid"])
        )

        # ---- attributes registry + attachments -------------------------
        attributes = (
            attr_pool.select(F.explode("attrs").alias("a"))
            .select("a.*")
            .dropDuplicates(["guid"])
        )

        attach_parts = [
            xall.select(
                F.col("guid").alias("object_guid"), F.explode("attrs").alias("a")
            ).select("object_guid", F.col("a.guid").alias("attribute_guid")),
            linked.select(
                F.col("link_guid").alias("object_guid"),
                F.explode("link_attrs").alias("a"),
            ).select("object_guid", F.col("a.guid").alias("attribute_guid")),
        ]
        if aspect_attach is not None:
            attach_parts.append(aspect_attach)
        object_attributes = attach_parts[0]
        for p in attach_parts[1:]:
            object_attributes = object_attributes.unionByName(p)
        object_attributes = object_attributes.distinct()

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

        # ---- errors ------------------------------------------------------
        err_parts = [handler_errors, pin_errors, tag_errors, invalid_errors]
        if aspect_errors is not None:
            err_parts.append(aspect_errors)
        errors = err_parts[0]
        for p in err_parts[1:]:
            errors = errors.unionByName(p)

        return {
            "xtargets": xtargets,
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
