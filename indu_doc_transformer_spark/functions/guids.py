"""Content-hash GUIDs as native Spark SQL expressions.

The reference assigns every entity a deterministic GUID =
str(uuid.UUID(bytes=md5(content))) (xtarget.py:141-154 and friends).
Because the GUID is a pure function of content, FK assignment needs no
join — both sides just hash (SURVEY.md J4, 'join elimination'). These
helpers keep that property *inside whole-stage codegen*: everything is
md5/concat/regexp, no Python in the hot path.

The Connection/Link/Pin GUIDs reproduce the reference's ``list += str``
quirk (characters of an embedded GUID joined by ':') via
``sql_charjoin``. Exact parity is pinned by tests against
kernels/tagparse.py, which is itself pinned against the reference.

All builders come in two flavors: pyspark Column functions and SQL
string templates (used inside higher-order-function lambdas where
Column objects can't reach).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_md5_uuid(expr: str) -> str:
    """SQL template: md5 hex digest formatted 8-4-4-4-12."""
    h = f"md5({expr})"
    return (
        f"concat(substr({h},1,8),'-',substr({h},9,4),'-',substr({h},13,4),"
        f"'-',substr({h},17,4),'-',substr({h},21,12))"
    )


def sql_charjoin(expr: str) -> str:
    """SQL template: ':'.join(characters of expr)."""
    return f"array_join(regexp_extract_all({expr}, '.', 0), ':')"


def md5_uuid(col: Column) -> Column:
    # F.concat (not concat_ws): null input must propagate to null GUID
    h = F.md5(col)
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-"),
        F.substring(h, 13, 4),
        F.lit("-"),
        F.substring(h, 17, 4),
        F.lit("-"),
        F.substring(h, 21, 12),
    )


def charjoin(col: Column) -> Column:
    return F.array_join(F.regexp_extract_all(col, F.lit("."), F.lit(0)), ":")


def xtarget_guid(tag: Column) -> Column:
    """xtarget.py:141-154: md5-uuid of the tag string."""
    return md5_uuid(tag)


def aspect_guid(separator: Column, value: Column) -> Column:
    """tag.py:61-75: md5-uuid of 'sep+value'."""
    return md5_uuid(F.concat(separator, value))


def connection_guid(src_guid: Column, dst_guid: Column, through_guid: Column) -> Column:
    """connection.py:359-372 (char-explosion quirk; None -> sentinel)."""
    return md5_uuid(
        F.concat(
            F.lit("CONN:"),
            F.when(src_guid.isNull(), F.lit("SRC:None")).otherwise(charjoin(src_guid)),
            F.lit(":"),
            F.when(dst_guid.isNull(), F.lit("DEST:None")).otherwise(charjoin(dst_guid)),
            F.lit(":"),
            F.when(through_guid.isNull(), F.lit("THROUGH:None")).otherwise(
                charjoin(through_guid)
            ),
        )
    )


def link_guid(
    name: Column, src_pin: Column, dst_pin: Column, conn_guid: Column
) -> Column:
    """connection.py:233-247."""
    return md5_uuid(
        F.concat(
            F.lit("LINK:"),
            name,
            F.lit(":"),
            F.when(src_pin.isNull() | (src_pin == ""), F.lit("SRC:None")).otherwise(
                charjoin(F.concat(F.lit("SRC:"), src_pin))
            ),
            F.lit(":"),
            F.when(dst_pin.isNull() | (dst_pin == ""), F.lit("DEST:None")).otherwise(
                charjoin(F.concat(F.lit("DEST:"), dst_pin))
            ),
            F.lit(":"),
            F.when(conn_guid.isNull(), F.lit("PARENT:None")).otherwise(charjoin(conn_guid)),
        )
    )


def pin_chain_expr(pin_col: str, role: str, link_guid_col: str) -> Column:
    """Expand a ':PIN1:PIN2' pin tag into its chain of pin rows with
    recursively defined GUIDs (connection.py:93-106, god.py:398-422).

    Pure SQL higher-order fold: the chain is built child-first
    (reversed), each step hashing the previous element's GUID. Returns
    array<struct<guid,name,role,child_guid,link_guid>>.
    """
    prev_guid = "if(size(acc)=0, null, acc[size(acc)-1].guid)"
    pin_guid = sql_md5_uuid(
        "concat('PIN:', nm, ':', "
        + sql_charjoin(f"'{role}'")
        + ", ':', "
        + f"coalesce({sql_charjoin(prev_guid)}, 'CHILD:None')"
        + ", ':', "
        + sql_charjoin(link_guid_col)
        + ")"
    )
    return F.expr(
        f"""
        aggregate(
          reverse(slice(split({pin_col}, ':'), 2, 100000)),
          cast(array() as array<struct<guid:string,name:string,role:string,child_guid:string,link_guid:string>>),
          (acc, nm) -> array_append(acc, struct(
              {pin_guid} as guid,
              nm as name,
              '{role}' as role,
              {prev_guid} as child_guid,
              {link_guid_col} as link_guid))
        )
        """
    )


def simple_attribute_guid(name: Column, value: Column) -> Column:
    """attributes.py:252-259."""
    return md5_uuid(F.concat(name, F.lit(":"), value))


def routing_tracks_attribute_guid(name: Column, tracks: Column) -> Column:
    """attributes.py:373-381 — tracks array sorted then ';'-joined."""
    return md5_uuid(
        F.concat(name, F.lit(":"), F.array_join(F.array_sort(tracks), ";"))
    )


def plc_address_attribute_guid(address: Column, meta: Column) -> Column:
    """attributes.py:492-500 — sorted 'k=v' pairs ';'-joined.

    ``meta`` is a map<string,string>; array_sort on the entries array
    sorts by key first, matching Python's sorted(dict.items()).
    """
    kv = F.transform(
        F.array_sort(F.map_entries(meta)),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )
    return md5_uuid(F.concat(address, F.lit(":"), F.array_join(kv, ";")))


def pdf_location_attribute_guid(page_no: Column, loc_repr: Column) -> Column:
    """attributes.py:623-630 — 'location:{page_no}:{bbox tuple repr}'.

    loc_repr is the Python-tuple repr emitted by the kernel
    (kernels/tagparse.pdf_location_repr) so the hash input is
    byte-identical to the reference."""
    return md5_uuid(
        F.concat(F.lit("location:"), page_no.cast("string"), F.lit(":"), loc_repr)
    )
