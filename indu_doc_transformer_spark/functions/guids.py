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
    """SQL template: md5 hex digest formatted 8-4-4-4-12.

    Nested zero-length overlays instead of concat-of-substrings: the
    old form repeated ``md5(expr)`` FIVE times in the tree, and
    common-subexpression elimination does not reach inside interpreted
    higher-order-function lambdas (where these templates mostly run —
    pin chains, attribute arrays), so every GUID paid 5 md5 digests.
    The overlay chain references the digest once (measured ~1.8x on a
    2M-guid transform; byte-identical output incl. NULL propagation)."""
    h = f"md5({expr})"
    return (
        f"overlay(overlay(overlay(overlay({h} placing '-' from 9 for 0)"
        f" placing '-' from 14 for 0) placing '-' from 19 for 0)"
        f" placing '-' from 24 for 0)"
    )


def sql_charjoin(expr: str) -> str:
    """SQL template: ':'.join(characters of expr)."""
    return f"array_join(regexp_extract_all({expr}, '.', 0), ':')"


def sql_guid_charjoin(expr: str) -> str:
    """``sql_charjoin`` for GUID/hex/keyword inputs ONLY: one lookaround
    regexp_replace instead of per-character extract_all + array_join
    (measured 3.4x; the finisher runs several of these per row).
    Equivalent to sql_charjoin only when the input cannot contain line
    terminators ('.' drops them, lookarounds do not) — true for
    md5_uuid outputs (hex + dashes) and role literals; user-data inputs
    (pin names) must keep sql_charjoin."""
    return f"regexp_replace({expr}, '(?<=.)(?=.)', ':')"


def md5_uuid(col: Column) -> Column:
    # Single-digest formatting via nested zero-length overlays (see
    # sql_md5_uuid): the concat-of-substrings form repeated the md5
    # subtree 5x, and CSE does not apply inside interpreted HOF
    # lambdas (_simple_attrs et al. hash per attribute entry). NULL
    # input still propagates to a NULL GUID (overlay is null-strict).
    h = F.md5(col)
    dash = F.lit("-")
    out = F.overlay(h, dash, F.lit(9), F.lit(0))
    out = F.overlay(out, dash, F.lit(14), F.lit(0))
    out = F.overlay(out, dash, F.lit(19), F.lit(0))
    return F.overlay(out, dash, F.lit(24), F.lit(0))


def charjoin(col: Column) -> Column:
    return F.array_join(F.regexp_extract_all(col, F.lit("."), F.lit(0)), ":")


def guid_charjoin(col: Column) -> Column:
    """``charjoin`` for GUID-typed inputs only — see sql_guid_charjoin."""
    return F.regexp_replace(col, "(?<=.)(?=.)", ":")


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
            F.when(src_guid.isNull(), F.lit("SRC:None")).otherwise(
                guid_charjoin(src_guid)
            ),
            F.lit(":"),
            F.when(dst_guid.isNull(), F.lit("DEST:None")).otherwise(
                guid_charjoin(dst_guid)
            ),
            F.lit(":"),
            F.when(through_guid.isNull(), F.lit("THROUGH:None")).otherwise(
                guid_charjoin(through_guid)
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
            F.when(conn_guid.isNull(), F.lit("PARENT:None")).otherwise(
                guid_charjoin(conn_guid)
            ),
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
    # role is a 'src'/'dst' literal and the other two are md5_uuid
    # outputs -> the GUID-safe charjoin applies to all three
    pin_guid = sql_md5_uuid(
        "concat('PIN:', nm, ':', "
        + sql_guid_charjoin(f"'{role}'")
        + ", ':', "
        + f"coalesce({sql_guid_charjoin(prev_guid)}, 'CHILD:None')"
        + ", ':', "
        + sql_guid_charjoin(link_guid_col)
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
