"""Search-query surface: query string -> Catalyst Column predicates.

Re-expresses the reference's Lark grammar + linear index scan
(/root/reference/src/indu_doc/lark_parser.py:45-67 search_grammar,
searcher.py:147-246 partial-match + path walk) as a driver-side parse
that compiles to a ``df.filter(...)`` over the entity tables — a full
scan with a pushable predicate instead of an in-memory dict loop.

Grammar (reference-compatible subset):
    query  := TAGWORD? ('@' dotted ('(' param ')')? ('=' value)?)*
    TAGWORD = /([=+\\-.][A-Za-z0-9_]+)+/

Semantics preserved:
- tag match is normalized substring (searcher.py:148-160);
- attribute filters match normalized-substring on the value, with
  list-any semantics over the attribute set (searcher.py:211-246);
- a filter with no value just requires path existence.

Supported dotted paths: ``tag``, ``type``, ``guid``,
``attributes(NAME)[=VALUE]`` on targets; ``tag``, ``src``, ``dest``,
``links.attributes(NAME)[=VALUE]`` on connections.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TAGWORD = re.compile(r"^([=+\-.][A-Za-z0-9_]+)+")
_FILTER = re.compile(
    r"@(?P<path>[^=.\s()@]+(?:\.[^=.\s()@]+)*)"
    r"(?:\((?P<param>[^)]*)\))?"
    r"(?:=(?P<value>[^@]+))?"
)


@dataclass
class Filter:
    dotted_path: list[str]
    dotted_param: str | None
    value: str | None


def run_parser(query: str) -> tuple[str | None, list[Filter]]:
    """Parse 'TAG @a.b(p)=v ...' (lark_parser.py:189-199 equivalent)."""
    query = query.strip()
    tag = None
    m = _TAGWORD.match(query)
    if m:
        tag = m.group(0)
        query = query[m.end():]
    filters = [
        Filter(f.group("path").split("."), f.group("param"),
               f.group("value").strip() if f.group("value") else None)
        for f in _FILTER.finditer(query)
    ]
    return tag, filters


def _norm(c: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def _norm_lit(s: str) -> str:
    return " ".join(s.lower().strip().split())


def _partial(col: Column, q: str) -> Column:
    return _norm(col).contains(F.lit(_norm_lit(q)))


def _attr_match(attrs_col: Column, param: str | None, value: str | None) -> Column:
    """attrs_col: array<struct<name,value>> (normalized). List-any
    semantics: any attribute entry matches name (+ value substring)."""
    if param is None:
        return F.size(attrs_col) > 0
    pn = _norm_lit(param)
    if value is None:
        return F.exists(attrs_col, lambda a: a["name"] == F.lit(pn))
    vn = _norm_lit(value)
    return F.exists(
        attrs_col,
        lambda a: (a["name"] == F.lit(pn)) & a["value"].contains(F.lit(vn)),
    )


def build_target_index(tables: dict[str, DataFrame]) -> DataFrame:
    """Searchable targets view: (guid, tag, type, attrs) with normalized
    attribute entries (searcher.py:114-130 index_targets analog)."""
    attr_entries = (
        tables["object_attributes"]
        .join(tables["attributes"], F.col("attribute_guid") == tables["attributes"].guid)
        .select(
            "object_guid",
            _norm(F.col("name")).alias("name"),
            _norm(F.get_json_object("value_json", "$.value")).alias("value"),
        )
        .groupBy("object_guid")
        .agg(F.collect_list(F.struct("name", "value")).alias("attrs"))
    )
    return (
        tables["xtargets"]
        .join(attr_entries, tables["xtargets"].guid == attr_entries.object_guid, "left")
        .select(
            "guid",
            "tag",
            F.col("target_type").alias("type"),
            F.coalesce(
                "attrs", F.expr("cast(array() as array<struct<name:string,value:string>>)")
            ).alias("attrs"),
        )
    )


def build_connection_index(tables: dict[str, DataFrame]) -> DataFrame:
    """Searchable connections view with through/src/dest tags and
    per-link attribute entries (searcher.py:132-145)."""
    xt = tables["xtargets"].select(F.col("guid").alias("xguid"), F.col("tag").alias("xtag"))
    conns = (
        tables["connections"]
        .join(xt.withColumnRenamed("xtag", "tag_through"), F.col("through_guid") == F.col("xguid"), "left")
        .drop("xguid")
        .join(xt.withColumnRenamed("xtag", "tag_src"), F.col("src_guid") == F.col("xguid"), "left")
        .drop("xguid")
        .join(xt.withColumnRenamed("xtag", "tag_dest"), F.col("dst_guid") == F.col("xguid"), "left")
        .drop("xguid")
    )
    link_attrs = (
        tables["links"]
        .select(F.col("guid").alias("lguid"), "connection_guid")
        .join(
            tables["object_attributes"],
            F.col("lguid") == F.col("object_guid"),
            "left",
        )
        .join(
            tables["attributes"].withColumnRenamed("guid", "aguid"),
            F.col("attribute_guid") == F.col("aguid"),
            "left",
        )
        .select(
            "connection_guid",
            _norm(F.col("name")).alias("name"),
            _norm(F.get_json_object("value_json", "$.value")).alias("value"),
        )
        .groupBy("connection_guid")
        .agg(
            F.collect_list(
                F.when(F.col("name").isNotNull(), F.struct("name", "value"))
            ).alias("link_attrs")
        )
    )
    return conns.join(
        link_attrs, conns.guid == link_attrs.connection_guid, "left"
    ).select(
        "guid",
        F.coalesce("tag_through", F.lit("")).alias("tag"),
        F.coalesce("tag_src", F.lit("")).alias("src"),
        F.coalesce("tag_dest", F.lit("")).alias("dest"),
        F.coalesce(
            "link_attrs",
            F.expr("cast(array() as array<struct<name:string,value:string>>)"),
        ).alias("link_attrs"),
    )


def search_targets(index: DataFrame, query: str) -> DataFrame:
    """Compile the query to predicates over the target index; returns
    matching (guid)."""
    tag, filters = run_parser(query)
    pred = F.lit(True)
    if tag:
        pred = pred & _partial(F.col("tag"), tag)
    for f in filters:
        head = f.dotted_path[0].lower()
        if head == "attributes":
            pred = pred & _attr_match(F.col("attrs"), f.dotted_param, f.value)
        elif head in ("tag", "type", "guid"):
            if f.value is not None:
                pred = pred & _partial(F.col(head), f.value)
            # no value -> existence of the field, always true here
        else:
            pred = pred & F.lit(False)  # unknown path matches nothing
    return index.where(pred).select("guid")


def target_search_guide_tree(index: DataFrame) -> dict:
    """Search-guide tree (A13, searcher.py:248-266): nested key paths a
    client can offer as filter suggestions. The distinct attribute
    names are aggregated distributed; tree assembly is driver-side
    (the key space is tiny)."""
    names = sorted(
        r.name
        for r in index.select(F.explode("attrs").alias("a"))
        .select(F.col("a.name").alias("name"))
        .distinct()
        .collect()
    )
    return {
        "tag": {},
        "type": {},
        "guid": {},
        "attributes": {n: {} for n in names},
    }


def search_connections(index: DataFrame, query: str) -> DataFrame:
    tag, filters = run_parser(query)
    pred = F.lit(True)
    if tag:
        pred = pred & _partial(F.col("tag"), tag)
    for f in filters:
        head = f.dotted_path[0].lower()
        if head in ("tag", "src", "dest"):
            if f.value is not None:
                pred = pred & _partial(F.col(head), f.value)
        elif head == "links" and len(f.dotted_path) >= 2 and f.dotted_path[1].lower() == "attributes":
            pred = pred & _attr_match(F.col("link_attrs"), f.dotted_param, f.value)
        elif head == "attributes":
            pred = pred & _attr_match(F.col("link_attrs"), f.dotted_param, f.value)
        else:
            pred = pred & F.lit(False)
    return index.where(pred).select("guid")
