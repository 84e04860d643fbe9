"""Tag tokenization, footer completion, and content-hash GUIDs.

Pure-Python reference kernels reproducing the observable behavior of
the reference implementation (all citations into /root/reference):

- normalize_string            src/indu_doc/common_utils.py:12-24
- is_pin_tag / split_pin_tag  src/indu_doc/common_utils.py:26-61
- strip_pin                   src/indu_doc/tag.py:156-176
- try_parse_tag               src/indu_doc/tag.py:340-400
- tag_parts (priority slice)  src/indu_doc/tag.py:237-257, configs.py:131-147
- complete_tag_with_footer    src/indu_doc/tag.py:178-224
- reconstruct_name            src/indu_doc/xtarget.py:119-139
- GUID scheme                 src/indu_doc/xtarget.py:141-154, tag.py:61-75,
                              connection.py:93-106,233-247,359-372,
                              attributes.py:252-259,373-381,492-500,623-630

The GUIDs must be byte-identical to the reference, including its
``list += str`` character-explosion quirk in Pin/Link/Connection GUIDs
(each character of an embedded GUID is joined by ':').
"""

from __future__ import annotations

import hashlib
import re
import uuid
from functools import lru_cache
from typing import Optional

from ..config import AspectsConfig


def normalize_string(s: str) -> str:
    """Lowercase, strip, collapse whitespace (common_utils.py:12-24)."""
    return " ".join(s.lower().strip().split())


def is_pin_tag(tag: str) -> bool:
    """A pin designation starts at ':' (common_utils.py:26-38)."""
    return tag.find(":") != -1


def split_pin_tag(tag_pin: str) -> tuple[str, Optional[str]]:
    """Split at the first ':'; pin keeps its ':' prefix
    (common_utils.py:41-61)."""
    parts = tag_pin.split(":", 1)
    return parts[0], None if len(parts) == 1 else ":" + parts[1]


def strip_pin(tag: str) -> str:
    """Everything before the terminal ':' (tag.py:156-176)."""
    i = tag.find(":")
    return tag[:i] if i != -1 else tag


@lru_cache(maxsize=64)
def _sep_pattern(separators: tuple[str, ...]) -> re.Pattern:
    # DELIBERATE DIVERGENCE from the reference (tag.py:369-373): it
    # builds the alternation in config order and its comment claims
    # "regex matches longest first", which is FALSE for Python re
    # (alternation is first-match) — a config ordered ['=', '=='] would
    # tokenize '==A' there as '=' then '=A'. We implement the
    # documented *intent*: explicit longest-first ordering, so '=='
    # always wins over '='. Identical behavior for every shipped config
    # (all single-char separators); pinned by
    # tests/test_tagparse.py::test_overlapping_separators_*.
    ordered = sorted(separators, key=len, reverse=True)
    return re.compile("|".join(re.escape(s) for s in ordered))


def try_parse_tag(
    tag_str: str, separators: tuple[str, ...]
) -> Optional[dict[str, tuple[str, ...]]]:
    """Tokenize ``tag_str`` into separator -> tuple of values.

    Returns {} for an empty string, None when text precedes the first
    separator or no separator matches (tag.py:340-400). Values are the
    stripped slices between consecutive separator matches; repeated
    separators accumulate, preserving order.
    """
    tag_str = tag_str.strip()
    if not tag_str:
        return {}

    matches = list(_sep_pattern(tuple(separators)).finditer(tag_str))
    if not matches or matches[0].start() != 0:
        return None

    out: dict[str, list[str]] = {}
    for i, m in enumerate(matches):
        start = m.start() + len(m.group(0))
        end = matches[i + 1].start() if i + 1 < len(matches) else len(tag_str)
        out.setdefault(m.group(0), []).append(tag_str[start:end].strip())
    return {sep: tuple(vals) for sep, vals in out.items()}


def tag_parts(tag_str: str, config: AspectsConfig) -> dict[str, tuple[str, ...]]:
    """Parsed parts extended with empty tuples for every separator of
    higher priority than the lowest one present (tag.py:237-257 via
    configs.separator_ge)."""
    parsed = try_parse_tag(strip_pin(tag_str), tuple(config.separators))
    if parsed is None:
        return {}
    return {sep: parsed.get(sep, ()) for sep in config.separator_ge(parsed.keys())}


def footer_parts(footer_tags: list[str], config: AspectsConfig) -> dict[str, str]:
    """First value per separator from the footer tags, skipping '&' and
    empties (tag.py:200-211). Compute once per document."""
    out: dict[str, str] = {}
    for foo in footer_tags:
        parsed = try_parse_tag(foo, tuple(config.separators))
        if not parsed:
            continue
        for sep, vals in parsed.items():
            # '&' document separator and empty aspects are ignored
            # (tag.py:206-211).
            if sep != "&" and vals and vals != ("",):
                out[sep] = vals[0]
    return out


def complete_tag_with_parts(
    tag_str: str, fparts: dict[str, str], config: AspectsConfig
) -> str:
    """complete_tag_with_footer with the footer pre-parsed."""
    base = strip_pin(tag_str)
    parts = tag_parts(base, config)
    footer_parts = fparts
    prefix = ""
    for sep in config.separators:
        if sep in parts and parts[sep]:
            break
        if sep in footer_parts:
            prefix += f"{sep}{footer_parts[sep]}"
    # the reference builds Tag(prefix + tag) whose tag_str strips at the
    # FIRST ':' of the combined string (tag.py:224,156-176) — a footer
    # value containing ':' therefore truncates the completed tag
    return strip_pin(prefix + base)


def complete_tag_with_footer(
    tag_str: str, footer_tags: list[str], config: AspectsConfig
) -> str:
    """Prepend footer aspect values for every level of higher priority
    than the first level present in the page tag (tag.py:178-224).

    e.g. page tag ``-M2`` + footer ``["=F1", "+L1"]`` -> ``=F1+L1-M2``.
    Returns the *completed tag string* (pin already stripped).
    """
    return complete_tag_with_parts(tag_str, footer_parts(footer_tags, config), config)


def reconstruct_name(tag_str: str, config: AspectsConfig) -> str:
    """Re-join parsed parts in configured separator order
    (xtarget.py:119-139)."""
    parts = tag_parts(tag_str, config)
    if not parts:
        return ""
    return "".join(
        "".join(sep + v for v in parts[sep]) for sep in config.separators if sep in parts
    )


# ---------------------------------------------------------------------------
# Content-hash GUIDs
# ---------------------------------------------------------------------------


def md5_uuid(s: str) -> str:
    """str(uuid.UUID(bytes=md5(s))) — the reference's GUID primitive
    (xtarget.py:152-154)."""
    return str(uuid.UUID(bytes=hashlib.md5(s.encode("utf-8")).digest()))


def _charjoin(s: str) -> str:
    """':'.join(s) — each character separated by ':'.

    Reproduces the reference's ``list += str`` quirk where a GUID string
    is exploded into characters before joining (connection.py:359-372).
    """
    return ":".join(s)


def xtarget_guid(tag_str: str) -> str:
    """GUID of an xtarget = md5-uuid of its (completed) tag string
    (xtarget.py:141-154)."""
    return md5_uuid(tag_str)


def aspect_guid(separator: str, value: str) -> str:
    """GUID of an aspect = md5-uuid of 'sep+value' (tag.py:61-75,86-93)."""
    return md5_uuid(f"{separator}{value}")


def connection_guid(
    src_guid: Optional[str], dest_guid: Optional[str], through_guid: Optional[str]
) -> str:
    """connection.py:359-372 — md5-uuid of 'CONN:' + ':'.join(e) where e
    accumulates the *characters* of each present GUID."""
    e = []
    e.append(_charjoin(src_guid) if src_guid else "SRC:None")
    e.append(_charjoin(dest_guid) if dest_guid else "DEST:None")
    e.append(_charjoin(through_guid) if through_guid else "THROUGH:None")
    return md5_uuid("CONN:" + ":".join(e))


def link_guid(
    name: str,
    src_pin_name: Optional[str],
    dest_pin_name: Optional[str],
    parent_guid: Optional[str],
) -> str:
    """connection.py:233-247 — e = [name] + chars('SRC:'+src_pin) +
    chars('DEST:'+dest_pin) + chars(parent_guid)."""
    e = [name]
    e.append(_charjoin("SRC:" + src_pin_name) if src_pin_name else "SRC:None")
    e.append(_charjoin("DEST:" + dest_pin_name) if dest_pin_name else "DEST:None")
    e.append(_charjoin(parent_guid) if parent_guid else "PARENT:None")
    return md5_uuid("LINK:" + ":".join(e))


def pin_guid(
    name: str, role: str, child_guid: Optional[str], parent_link_guid: Optional[str]
) -> str:
    """connection.py:93-106 — e = [name] + chars(role) + chars(child
    GUID or 'CHILD:None') + chars(parent link GUID or 'PARENT:None')."""
    e = [name]
    e.append(_charjoin(role))
    e.append(_charjoin(child_guid) if child_guid else "CHILD:None")
    e.append(_charjoin(parent_link_guid) if parent_link_guid else "PARENT:None")
    return md5_uuid("PIN:" + ":".join(e))


def pin_chain(tag_pin: str, role: str, parent_link_guid: str) -> list[dict]:
    """Expand ':PIN1:PIN2' into a child->parent chain of pin rows
    (god.py:398-422: chain built in reverse, child first).

    Returns rows ordered leaf-first, each
    {guid, name, role, child_guid, link_guid}.
    """
    names = tag_pin.split(":")[1:]
    if not names:
        return []
    rows: list[dict] = []
    child: Optional[str] = None
    for name in reversed(names):
        g = pin_guid(name, role, child, parent_link_guid)
        rows.append(
            {
                "guid": g,
                "name": name,
                "role": role,
                "child_guid": child,
                "link_guid": parent_link_guid,
            }
        )
        child = g
    return rows


def simple_attribute_guid(name: str, value: str) -> str:
    """attributes.py:252-259."""
    return md5_uuid(f"{name}:{value}")


def routing_tracks_attribute_guid(name: str, tracks: list[str]) -> str:
    """attributes.py:373-381 — tracks sorted then ';'-joined."""
    return md5_uuid(f"{name}:{';'.join(sorted(tracks))}")


def plc_address_attribute_guid(address: str, meta: dict[str, str]) -> str:
    """attributes.py:492-500 — 'k=v' pairs sorted then ';'-joined."""
    meta_str = ";".join(f"{k}={v}" for k, v in sorted(meta.items()))
    return md5_uuid(f"{address}:{meta_str}")


def pdf_location_repr(loc: tuple[float, float, float, float]) -> str:
    """Python tuple repr of the bbox, as embedded in the reference's
    PDFLocationAttribute GUID string (attributes.py:623-630)."""
    return repr(tuple(float(v) for v in loc))


def pdf_location_attribute_guid(name: str, page_no: int, loc_repr: str) -> str:
    """attributes.py:623-630 — md5-uuid of 'name:page_no:bbox_repr'."""
    return md5_uuid(f"{name}:{page_no}:{loc_repr}")
