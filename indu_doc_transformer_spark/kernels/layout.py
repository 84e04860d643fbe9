"""Per-document layout analysis: classify, footer, boilerplate strip,
region-table extraction and type-specific reshaping.

Pure-Python deterministic kernel; the Spark operator wraps
``extract_document`` in an Arrow-batched ``mapInPandas``. Semantics
mirror the reference (citations into /root/reference):

- page classification          plugins/eplan_pdfs/common_page_utils.py:47-70
- footer grid + hierarchy      plugins/eplan_pdfs/footers_extractor.py:137-212
- region table pipeline        plugins/eplan_pdfs/table_extractor.py:433-519
  (header promote/demote, column-count check, ignored-column drop,
  non-empty-row filter, forward fill, overlap repair by center method)
- cable-diagram segmentation   table_extractor.py:296-331
- terminal-diagram transform   table_extractor.py:333-430
- per-page error channel       table_extractor.py:184-216, page_processor.py:26-63

Divergence from the reference (deliberate, documented): the terminal
diagram transform prefixes *all* side columns with ``_1``/``_2`` —
the reference leaves the non-numeric columns unprefixed, which yields
duplicate column names after the horizontal concat and
pandas-version-dependent stringification; prefixing keeps each side's
attributes well-defined.
"""

from __future__ import annotations

from typing import Optional

from ..config import PAGE_SETUPS, PageSetup, RegionSetup, classifier_map
from .html import Block, parse_blocks

BBox = tuple[float, float, float, float]


class PageFault(ValueError):
    """Raised for reference-style FAULT conditions inside extraction."""


# ---------------------------------------------------------------------------
# Geometry (the reference leans on pymupdf.Rect; we implement the two
# predicates it uses: intersects and contains-point)
# ---------------------------------------------------------------------------


def rects_intersect(a: BBox, b: BBox) -> bool:
    return not (a[2] <= b[0] or b[2] <= a[0] or a[3] <= b[1] or b[3] <= a[1])


def rect_contains(r: BBox, x: float, y: float) -> bool:
    return r[0] <= x <= r[2] and r[1] <= y <= r[3]


def rect_center(r: BBox) -> tuple[float, float]:
    return (r[0] + r[2]) / 2.0, (r[1] + r[3]) / 2.0


# ---------------------------------------------------------------------------
# Classification + footer
# ---------------------------------------------------------------------------

_CLASSIFIER = classifier_map()


def detect_page_type(blocks: list[Block]) -> Optional[str]:
    """First heading with 20 < fontsize < 30 whose normalized text equals
    a configured search string wins (common_page_utils.py:47-70)."""
    for b in blocks:
        if b.kind == "heading" and b.fontsize is not None:
            if 20.0 < b.fontsize < 30.0:
                key = b.text.strip().lower()
                hit = _CLASSIFIER.get(key)
                if hit:
                    return hit
    return None


def extract_footer(blocks: list[Block]) -> Optional[dict]:
    """Project/product + hierarchy tags from the footer grid.

    Returns None when no project name is found (the reference treats a
    missing project name as 'page has no footer',
    footers_extractor.py:160-165). Hierarchy tags are grid cells
    [0][0],[2][0],[0][1],[2][1],[0][2], non-empty only
    (footers_extractor.py:203-206).
    """
    project = ""
    product = ""
    grid: list[list[str]] = []
    for b in blocks:
        if b.kind == "footer_project":
            project = b.text.strip()
        elif b.kind == "footer_product":
            product = b.text.strip()
        elif b.kind == "footer_grid":
            grid = b.grid
    if not project:
        return None
    tags: list[str] = []
    if len(grid) >= 3 and all(len(r) >= 3 for r in grid[:3]):
        needed = [grid[0][0], grid[2][0], grid[0][1], grid[2][1], grid[0][2]]
        tags = [t for t in needed if t]
    return {"project_name": project, "product_name": product, "tags": tags}


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate strip)
# ---------------------------------------------------------------------------

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.33


def extract_main_text(blocks: list[Block]) -> str:
    """Text-density / link-density boilerplate heuristic.

    Keeps headings with text and p/div blocks that are long enough and
    not link-dominated; nav/aside/footer/region blocks are dropped.
    Deterministic and byte-stable — this is the golden
    ``extracted_text`` per url.
    """
    kept: list[str] = []
    for b in blocks:
        if b.kind == "heading":
            if b.text:
                kept.append(b.text)
        elif b.kind in ("p", "div"):
            if b.total_chars >= MIN_CONTENT_CHARS:
                density = b.link_chars / b.total_chars if b.total_chars else 1.0
                if density < MAX_LINK_DENSITY:
                    kept.append(b.text)
    return "\n".join(kept)


# ---------------------------------------------------------------------------
# Region table extraction
# ---------------------------------------------------------------------------


class RegionTable:
    """Columnar region extraction result: ordered column names, row cell
    lists, parallel row locations, and pre-filter row indices."""

    __slots__ = ("cols", "rows", "locs", "idxs")

    def __init__(self, cols, rows, locs, idxs):
        self.cols: list[str] = cols
        self.rows: list[list[Optional[str]]] = rows
        self.locs: list[Optional[BBox]] = locs
        self.idxs: list[int] = idxs


def _detect_overlap_fixes(
    table: Block, floats: list[Block]
) -> list[tuple[int, Optional[tuple[int, str]], Optional[tuple[int, str]]]]:
    """All-pairs bbox intersection over float spans, then center-method
    cell replacement per affected physical row
    (table_extractor.py:71-124). Cell rects are equal horizontal splits
    of the row bbox."""
    spans = [(f.bbox, f.text) for f in floats if f.bbox]
    overlaps = []
    for i in range(len(spans)):
        for j in range(i + 1, len(spans)):
            if rects_intersect(spans[i][0], spans[j][0]):
                overlaps.append((spans[i][1], spans[j][1], spans[i][0], spans[j][0]))

    fixes = []
    for t1, t2, r1, r2 in overlaps:
        c1 = rect_center(r1)
        c2 = rect_center(r2)
        for r, row in enumerate(table.rows):
            if row.bbox is None:
                continue
            if rects_intersect(row.bbox, r1) or rects_intersect(row.bbox, r2):
                ncells = len(row.cells)
                repl_1 = repl_2 = None
                if ncells:
                    x0, y0, x1, y1 = row.bbox
                    w = (x1 - x0) / ncells
                    for idx in range(ncells):
                        cell = (x0 + idx * w, y0, x0 + (idx + 1) * w, y1)
                        if rect_contains(cell, *c1):
                            repl_1 = (idx, t1)
                        if rect_contains(cell, *c2):
                            repl_2 = (idx, t2)
                fixes.append((r, repl_1, repl_2))
    return fixes


def _frag_data(
    frag: Block, row_offset: int
) -> tuple[list[list[Optional[str]]], list[Optional[BBox]]]:
    """Header promote/demote: row_offset 0 drops the header row, -1
    keeps every row as data, N>0 drops the first N+1 rows
    (table_extractor.py:25-34,127-169)."""
    if row_offset < -1:
        raise PageFault(f"Can not demote on {-row_offset} levels")
    start = row_offset + 1
    rows = [list(r.cells) for r in frag.rows[start:]]
    locs = [r.bbox for r in frag.rows[start:]]
    return rows, locs


def extract_region_table(
    tables: list[Block],
    floats: list[Block],
    key: str,
    setup: RegionSetup,
) -> tuple[RegionTable, list[tuple[str, str]]]:
    """The universal region extractor (table_extractor.py:433-519).

    Returns (table, errors) where errors are (severity, message) pairs;
    raises PageFault for the reference's ValueError conditions, with
    identical message text.
    """
    errors: list[tuple[str, str]] = []
    frags = [t for t in tables if t.region == key]
    if not frags:
        raise PageFault(f"No required table(s) found on the page: {key}")
    if len(frags) > setup.expected_num_tables:
        raise PageFault(
            f"Expected <= {setup.expected_num_tables} tables, found more: {len(frags)}"
        )

    fixes = []
    if setup.overlap_test:
        if len(frags) > 1:
            raise PageFault("Overlap detection does not work witn many tables")
        region_floats = [f for f in floats if f.float_region == key]
        if region_floats:
            fixes = _detect_overlap_fixes(frags[0], region_floats)

    sz = len(frags[0].rows[0].cells) if frags[0].rows else 0
    if sz != len(setup.columns):
        raise PageFault(f"Expected {len(setup.columns)} columns, found {sz}")

    columns = list(setup.column_names)
    rows, locs = _frag_data(frags[0], setup.row_offset)
    for t in frags[1:]:
        tsz = len(t.rows[0].cells) if t.rows else 0
        if tsz != sz:
            raise PageFault(f"Expected {sz} columns, found {tsz}")
        lvl = setup.row_offset + (-1 if setup.on_many_no_header else 0)
        r2, l2 = _frag_data(t, lvl)
        rows.extend(r2)
        locs.extend(l2)

    # overlap repair (table_extractor.py:480-503), identical messages
    for r, repl1, repl2 in fixes:
        row = r - 1 - setup.row_offset
        if 0 <= row < len(rows):
            for repl in (repl1, repl2):
                if repl:
                    col_idx, new_text = repl
                    old = rows[row][col_idx] if col_idx < len(rows[row]) else None
                    msg = (
                        f"row #{row} overlap detected: replaced col #{col_idx}: "
                        f"{old} -> {new_text}"
                    )
                    errors.append(("INFO", msg))
                    if col_idx < len(rows[row]):
                        rows[row][col_idx] = new_text
            if not (repl1 and repl2):
                errors.append(
                    ("WARNING", f"row #{row} overlap detected: could not repair (fully)")
                )

    # drop ignored columns
    keep_idx = [i for i, (name, inc, _) in enumerate(setup.columns) if inc]
    cols = [columns[i] for i in keep_idx]
    rows = [[row[i] if i < len(row) else None for i in keep_idx] for row in rows]

    # non-empty-row filter; pandas keeps the original index after a
    # boolean filter, so record pre-filter positions for row_idx parity
    filtered_rows, filtered_locs, idxs = [], [], []
    for i, (row, loc) in enumerate(zip(rows, locs)):
        if any(v is not None and v != "" for v in row):
            filtered_rows.append(row)
            filtered_locs.append(loc)
            idxs.append(i)

    # forward fill: placeholder and None cells inherit the previous
    # value (replace(ph, NA).ffill() also fills pre-existing NaN)
    ffill = setup.ffill_map
    for ci, name in enumerate(cols):
        if name in ffill:
            ph = ffill[name]
            prev: Optional[str] = None
            for row in filtered_rows:
                v = row[ci]
                if v is None or v == ph:
                    row[ci] = prev
                else:
                    prev = v

    return RegionTable(cols, filtered_rows, filtered_locs, idxs), errors


def extract_text_region(blocks: list[Block], key: str) -> RegionTable:
    """text_only region -> 1x1 table (table_extractor.py:522-532)."""
    for b in blocks:
        if b.kind == "text_region" and b.region == key:
            if b.text:
                return RegionTable([key], [[b.text.strip()]], [b.bbox], [0])
    raise PageFault(f"No required text(s) found on the page: {key}")


# ---------------------------------------------------------------------------
# Type-specific reshaping
# ---------------------------------------------------------------------------


def _is_blank(v: Optional[str]) -> bool:
    return v is None or v == ""


def reshape_cable_diagram(main: RegionTable) -> RegionTable:
    """Block segmentation of stacked sub-tables
    (table_extractor.py:296-331): block start = two consecutive rows
    with columns 1-2 blank; cable name = last whitespace token of the
    block header's first cell; two info rows + one repeated header row
    are skipped; data rows accumulate until the next block."""
    rows, locs = main.rows, main.locs
    out_rows: list[list[Optional[str]]] = []
    out_locs: list[Optional[BBox]] = []
    i = 0
    n = len(rows)
    while i < n:
        if (
            i + 1 < n
            and _is_blank(rows[i][1])
            and _is_blank(rows[i][2])
            and _is_blank(rows[i + 1][1])
            and _is_blank(rows[i + 1][2])
        ):
            cable_name = (rows[i][0] or "").split(" ")[-1]
            i += 3  # two info rows + repeated header row
            while i < n and not (
                _is_blank(rows[i][1])
                and _is_blank(rows[i][2])
                and i + 1 < n
                and _is_blank(rows[i + 1][1])
                and _is_blank(rows[i + 1][2])
            ):
                out_rows.append(list(rows[i]) + [cable_name])
                out_locs.append(locs[i])
                i += 1
        else:
            i += 1
    cols = list(main.cols) + ["cable_tag"]
    return RegionTable(cols, out_rows, out_locs, list(range(len(out_rows))))


def _transform_side(
    cables: RegionTable, conn: RegionTable, prefix: str
) -> tuple[list[str], list[list[str]]]:
    """Melt digit-named slot columns; a non-empty color at column k looks
    up cable row k-1 positionally; emit ';'-joined cable and color lists
    (table_extractor.py:348-390). All side columns get the prefix (see
    module docstring for the deliberate divergence)."""
    number_idx = [(i, c) for i, c in enumerate(conn.cols) if c.isdigit()]
    other_idx = [
        (i, c) for i, c in enumerate(conn.cols) if not c.isdigit() and not c.startswith("_")
    ]
    cable_col = cables.cols.index("cable_tag")
    out_cols = [f"{prefix}cable_tag", f"{prefix}Color"] + [
        f"{prefix}{c}" for _, c in other_idx
    ]
    out_rows = []
    for row in conn.rows:
        cable_list: list[str] = []
        color_list: list[str] = []
        for i, c in number_idx:
            color = row[i]
            if color is not None and color.strip() != "":
                cable_index = int(c) - 1
                cable_tag = ""
                if 0 <= cable_index < len(cables.rows):
                    v = cables.rows[cable_index][cable_col]
                    cable_tag = v if v is not None else ""
                if cable_tag:
                    cable_list.append(str(cable_tag))
                    color_list.append(color)
        out_rows.append(
            [";".join(cable_list), ";".join(color_list)]
            + [(row[i] if row[i] is not None else "") for i, _ in other_idx]
        )
    return out_cols, out_rows


def reshape_terminal_diagram(regions: dict[str, RegionTable]) -> RegionTable:
    """Unpivot + positional join of [left, main, right]
    (table_extractor.py:333-430): left/right melted slot matrices are
    horizontally concatenated with the main table by row position,
    NaN-filled, link-side columns prefixed ``_1``/``_2``, and the strip
    tag inserted as the left side's dst and the right side's src."""
    main = regions["main"]
    strip_tag = regions["strip_tag"].rows[0][0] or ""

    l_cols, l_rows = _transform_side(regions["l_cables"], regions["l_conn"], "_1")
    r_cols, r_rows = _transform_side(regions["r_cables"], regions["r_conn"], "_2")

    # rename main link columns by side (table_extractor.py:418-421)
    rename = {
        "src_tag": "_1src_tag",
        "src_pin": "_1src_pin",
        "dst_tag": "_2dst_tag",
        "dst_pin": "_2dst_pin",
        "strip_pin": "_1dst_pin",
    }
    m_cols = [rename.get(c, c) for c in main.cols]

    n = max(len(l_rows), len(main.rows), len(r_rows))

    def pad_row(rows, width, i):
        if i < len(rows):
            return [(v if v is not None else "") for v in rows[i]]
        return [""] * width

    cols = (
        ["_2src_pin", "_2src_tag", "_1dst_tag"] + l_cols + m_cols + r_cols
    )
    out_rows = []
    out_locs: list[Optional[BBox]] = []
    strip_pin_idx = m_cols.index("_1dst_pin") if "_1dst_pin" in m_cols else None
    for i in range(n):
        lrow = pad_row(l_rows, len(l_cols), i)
        mrow = pad_row(main.rows, len(m_cols), i)
        rrow = pad_row(r_rows, len(r_cols), i)
        strip_pin_val = mrow[strip_pin_idx] if strip_pin_idx is not None else ""
        out_rows.append([strip_pin_val, strip_tag, strip_tag] + lrow + mrow + rrow)
        out_locs.append(main.locs[i] if i < len(main.locs) else None)
    return RegionTable(cols, out_rows, out_locs, list(range(len(out_rows))))


# ---------------------------------------------------------------------------
# Whole-document extraction
# ---------------------------------------------------------------------------

# Tag-role columns that receive footer completion (create_xtarget ->
# create_tag path, god.py:343-396). The kernel pre-computes completed
# variants under '_c:'-prefixed keys so the relational assembly needs
# no per-row Python UDF: ';'-list cells are completed piece-wise (the
# handlers split them later), pin parts are carried through unchanged.
_COMPLETE_COLUMNS = {
    "connection_list": ["src_pin_tag", "dst_pin_tag"],
    "device_tag_list": ["tag"],
    "cable_overview": ["cable_tag", "src_tag", "dst_tag"],
    "topology": ["designation", "src_tags", "dst_tags"],
    "wires_part_list": ["src_pin_tag", "dst_pin_tag"],
    "cable_diagram": ["cable_tag", "src_tag", "dst_tag"],
    "plc_diagram": ["tag"],
    "terminal_diagram": [
        "_1cable_tag", "_1src_tag", "_1dst_tag",
        "_2cable_tag", "_2src_tag", "_2dst_tag",
    ],
}


def _completed_key(col: str) -> str:
    """_1src_tag -> _1_c:src_tag (survives the terminal prefix split);
    src_tag -> _c:src_tag."""
    for p in ("_1", "_2"):
        if col.startswith(p):
            return f"{p}_c:{col[2:]}"
    return f"_c:{col}"


def _complete_cell(
    value: Optional[str], fparts: dict, config, memo: dict
) -> Optional[str]:
    """Piece-wise footer completion of a (possibly ';'-joined) tag cell;
    pin designations are re-attached after completing the tag part.
    Memoized per document (tag cells repeat heavily)."""
    from .tagparse import complete_tag_with_parts, split_pin_tag

    if value is None:
        return None
    hit = memo.get(value)
    if hit is not None:
        return hit
    pieces = []
    for piece in value.strip().split(";"):
        tag_part, pin_part = split_pin_tag(piece)
        pieces.append(
            complete_tag_with_parts(tag_part, fparts, config) + (pin_part or "")
        )
    out = ";".join(pieces)
    memo[value] = out
    return out


def _loc_repr(loc: Optional[BBox]) -> Optional[str]:
    if loc is None:
        return None
    return repr(tuple(float(v) for v in loc))


def extract_document(html: bytes | str, page_setups: dict[str, PageSetup] = PAGE_SETUPS) -> dict:
    """Full per-document kernel: parse -> classify -> footer ->
    main-content -> region tables -> type reshaping -> normalized rows.

    Mirrors PageProcessor.run + TableExtractor.extract
    (page_processor.py:26-63, table_extractor.py:184-216): faults are
    recorded as error rows, never raised.
    """
    blocks = parse_blocks(html)
    errors: list[tuple[str, str]] = []
    spans: list[dict] = []
    result = {
        "page_type": None,
        "footer": None,
        "extracted_text": extract_main_text(blocks),
        "spans": spans,
        "rows": [],
        "errors": errors,
    }

    # structural spans for content blocks
    for i, b in enumerate(blocks):
        if b.kind in ("heading", "p", "div", "nav") and b.text:
            spans.append(
                {
                    "region": "",
                    "kind": b.kind,
                    "row_idx": i,
                    "loc": list(b.bbox) if b.bbox else None,
                    "text": b.text,
                }
            )

    page_type = detect_page_type(blocks)
    if not page_type:
        errors.append(("FAULT", "Could not detect page type"))
        return result
    result["page_type"] = page_type

    footer = extract_footer(blocks)
    if footer is None:
        errors.append(("FAULT", "No footer found"))
        return result
    result["footer"] = footer

    setup = page_setups.get(page_type)
    if setup is None:
        # reachable only with user-supplied extraction settings (-e)
        # that omit a classified page type: an E2 error row, never a
        # task-killing KeyError
        errors.append(("FAULT", f"No page setup for page type `{page_type}`"))
        return result
    tables = [b for b in blocks if b.kind == "table"]
    floats = [b for b in blocks if b.kind == "float_span"]

    # table-row structural spans
    for t in tables:
        if t.region:
            for ri, row in enumerate(t.rows):
                spans.append(
                    {
                        "region": t.region,
                        "kind": "row",
                        "row_idx": ri,
                        "loc": list(row.bbox) if row.bbox else None,
                        "text": "\t".join(c if c is not None else "" for c in row.cells),
                    }
                )

    regions: dict[str, RegionTable] = {}
    try:
        for key, rsetup in setup.regions:
            if rsetup.text_only:
                regions[key] = extract_text_region(blocks, key)
            else:
                table, errs = extract_region_table(tables, floats, key, rsetup)
                regions[key] = table
                errors.extend(errs)

        if page_type == "cable_diagram":
            final = reshape_cable_diagram(regions["main"])
        elif page_type == "terminal_diagram":
            final = reshape_terminal_diagram(regions)
        else:
            final = regions["main"]
    except PageFault as ve:
        errors.append(("FAULT", f"{ve}"))
        return result
    except Exception as e:  # noqa: BLE001 — E2: failures become metric rows
        errors.append(("UNKNOWN_ERROR", f"{e}"))
        return result

    if not final.rows:
        errors.append(("FAULT", "No tables found"))
        return result

    from ..config import DEFAULT_ASPECTS
    from .tagparse import footer_parts

    complete_cols = _COMPLETE_COLUMNS.get(page_type, [])
    fparts = footer_parts(footer["tags"], DEFAULT_ASPECTS)
    memo: dict = {}
    out_rows = []
    for row, loc, idx in zip(final.rows, final.locs, final.idxs):
        cols = {c: (v if v is not None else "") for c, v in zip(final.cols, row)}
        for cc in complete_cols:
            if cc in cols:
                cols[_completed_key(cc)] = _complete_cell(
                    cols[cc], fparts, DEFAULT_ASPECTS, memo
                )
        out_rows.append(
            {
                "row_idx": idx,
                "cols": cols,
                "loc": list(loc) if loc else None,
                "loc_repr": _loc_repr(loc),
            }
        )
    result["rows"] = out_rows
    return result
