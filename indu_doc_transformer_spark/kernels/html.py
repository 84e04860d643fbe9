"""Deterministic lightweight HTML tokenizer -> layout-block tree.

The web recast of the reference's PyMuPDF page scan
(/root/reference/src/indu_doc/plugins/eplan_pdfs/table_extractor.py:37-68
extract_spans; common_page_utils.py:47-70 block walk): raw ``html``
bytes are tokenized into a flat list of layout blocks carrying kind,
region, bbox, font size, link/text char counts, and table rows. No
external HTML library — the corpus is a well-formed subset and the
tokenizer is regex-driven, byte-stable, and fast enough to vectorize
over Arrow batches.

Recognized structure (see sources/corpus.py for the generator):

- ``<nav>``/``<aside>`` .. boilerplate containers
- ``<h1..h6 data-fontsize="24.0">`` .. classifier title spans
- ``<p>``, ``<div>``  .. text blocks (link density decides boilerplate)
- ``<table data-region="NAME" data-bbox="..">`` with ``<tr data-bbox>``
  rows .. region tables
- ``<div data-region="NAME">`` .. text-only regions
- ``<span data-float="NAME" data-bbox="..">`` .. stray spans floating
  over a region (overlap-repair input, table_extractor.py:71-124)
- ``<footer>`` with ``<div class="project|product">`` and a
  ``<table class="footer-grid">`` .. footer grid (footers_extractor.py)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

_TOKEN = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>|([^<]+)")
_ATTR = re.compile(r"([a-zA-Z][a-zA-Z0-9_-]*)\s*=\s*\"([^\"]*)\"")


@dataclass
class TableRow:
    cells: list[Optional[str]]
    bbox: Optional[tuple[float, float, float, float]] = None


@dataclass
class Block:
    kind: str  # nav|heading|p|div|table|float_span|footer_project|footer_product|footer_grid|text_region
    text: str = ""
    region: Optional[str] = None
    float_region: Optional[str] = None
    fontsize: Optional[float] = None
    bbox: Optional[tuple[float, float, float, float]] = None
    total_chars: int = 0
    link_chars: int = 0
    rows: list[TableRow] = field(default_factory=list)
    grid: list[list[str]] = field(default_factory=list)


def _parse_bbox(s: Optional[str]) -> Optional[tuple[float, float, float, float]]:
    if not s:
        return None
    try:
        parts = [float(x) for x in s.split(",")]
    except ValueError:
        return None
    return tuple(parts) if len(parts) == 4 else None


_EMPTY_ATTRS: dict[str, str] = {}


def _attrs(raw: str) -> dict[str, str]:
    return dict(_ATTR.findall(raw or ""))


_WS = re.compile(r"[ \t\r\n]+")


def _clean(text: str) -> str:
    """Collapse intra-block whitespace deterministically."""
    return _WS.sub(" ", text).strip()


def parse_blocks(html: bytes | str, lang_hint: str = "") -> list[Block]:
    """Tokenize html into an ordered list of layout blocks."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")

    blocks: list[Block] = []

    # Parser state
    stack: list[str] = []  # open container kinds for context
    cur: Optional[Block] = None  # current text-ish block being accumulated
    cur_table: Optional[Block] = None
    cur_row: Optional[TableRow] = None
    cell_text: Optional[list[str]] = None
    in_anchor = 0
    in_footer = False
    footer_grid: Optional[Block] = None

    def flush():
        nonlocal cur
        if cur is not None:
            cur.text = _clean(cur.text)
            cur.total_chars = len(cur.text)
            if cur.text or cur.kind == "heading":
                blocks.append(cur)
            cur = None

    for m in _TOKEN.finditer(html):
        closing, tag, rawattrs, text = m.groups()

        if text is not None:
            if cell_text is not None:
                cell_text.append(text)
            elif cur is not None:
                cur.text += text
                if in_anchor:
                    cur.link_chars += len(_clean(text))
            continue

        tag = tag.lower()
        # attribute parse only when the tag actually carries key="value"
        a = _attrs(rawattrs) if rawattrs and "=" in rawattrs else _EMPTY_ATTRS

        if tag in ("html", "head", "title", "body", "meta", "br", "hr"):
            continue

        if tag == "a":
            in_anchor = max(0, in_anchor + (-1 if closing else 1))
            continue

        if tag == "footer":
            in_footer = not closing
            if closing:
                flush()
            continue

        if tag == "table":
            if not closing:
                flush()
                if in_footer and a.get("class") == "footer-grid":
                    cur_table = Block(kind="footer_grid")
                else:
                    cur_table = Block(
                        kind="table",
                        region=a.get("data-region"),
                        bbox=_parse_bbox(a.get("data-bbox")),
                    )
            else:
                if cur_table is not None:
                    if cur_table.kind == "footer_grid":
                        cur_table.grid = [
                            [c if c is not None else "" for c in r.cells]
                            for r in cur_table.rows
                        ]
                    blocks.append(cur_table)
                cur_table = None
            continue

        if tag == "tr":
            if not closing and cur_table is not None:
                cur_row = TableRow(cells=[], bbox=_parse_bbox(a.get("data-bbox")))
            elif closing and cur_table is not None and cur_row is not None:
                cur_table.rows.append(cur_row)
                cur_row = None
            continue

        if tag in ("td", "th"):
            if not closing:
                cell_text = []
            else:
                if cur_row is not None and cell_text is not None:
                    t = _clean("".join(cell_text))
                    # empty cells map to None, like PyMuPDF's empty
                    # table cells (table_extractor.py:137 'Can create
                    # None or empty cells')
                    cur_row.cells.append(t if t else None)
                cell_text = None
            continue

        if tag == "span":
            if not closing and a.get("data-float"):
                flush()
                blocks.append(
                    Block(
                        kind="float_span",
                        float_region=a.get("data-float"),
                        bbox=_parse_bbox(a.get("data-bbox")),
                        text="",  # text arrives via the text branch below
                    )
                )
                # capture the float text directly: set cur to the
                # float block so following text accumulates there
                cur = blocks.pop()
            elif closing and cur is not None and cur.kind == "float_span":
                cur.text = _clean(cur.text)
                cur.total_chars = len(cur.text)
                blocks.append(cur)
                cur = None
            continue

        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            if not closing:
                flush()
                fs = a.get("data-fontsize")
                cur = Block(
                    kind="heading",
                    fontsize=float(fs) if fs else None,
                    bbox=_parse_bbox(a.get("data-bbox")),
                )
            else:
                flush()
            continue

        if tag in ("p", "div", "nav", "aside"):
            if not closing:
                flush()
                region = a.get("data-region")
                if in_footer:
                    cls = a.get("class", "")
                    kind = (
                        "footer_project"
                        if cls == "project"
                        else "footer_product"
                        if cls == "product"
                        else "div"
                    )
                elif region:
                    kind = "text_region"
                elif tag in ("nav", "aside"):
                    kind = "nav"
                else:
                    kind = tag  # p | div
                cur = Block(
                    kind=kind,
                    region=region,
                    bbox=_parse_bbox(a.get("data-bbox")),
                )
                stack.append(kind)
            else:
                flush()
                if stack:
                    stack.pop()
            continue

        # unknown tags: ignored, their text still accumulates

    flush()
    return blocks
