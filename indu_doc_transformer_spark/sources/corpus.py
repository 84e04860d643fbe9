"""Deterministic synthetic Common-Crawl-style web corpus.

Generates the north-rule input table
``(url, warc_ts, html binary, text string, lang string)``
(BASELINE.json input_hint) where each html document embeds exactly one
of the reference's nine page types — title heading with a font-size
attribute (classifier P1), footer grid (T13), region tables with
headers / placeholder cells / stacked blocks (T7) / slot-color
matrices (T8), boilerplate nav+ad blocks for the main-content
heuristics — plus negative cases (unknown page type, missing footer,
missing table, column mismatch).

Fully deterministic: every field derives from md5(seed, doc_id, key);
regeneration is byte-identical at any scale. Host choice is Zipf-ish
to create the domain skew the north rule requires us to defuse.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)


class DetRng:
    """Counter-mode md5 PRNG — stable across platforms/versions."""

    def __init__(self, seed: str):
        self.seed = seed
        self.n = 0

    def u(self) -> float:
        """uniform [0, 1)"""
        self.n += 1
        h = hashlib.md5(f"{self.seed}:{self.n}".encode()).digest()
        return int.from_bytes(h[:8], "big") / 2**64

    def randint(self, lo: int, hi: int) -> int:
        """inclusive bounds"""
        return lo + int(self.u() * (hi - lo + 1))

    def choice(self, seq):
        return seq[int(self.u() * len(seq))]


VARIANTS = [
    "device_tag_list",
    "connection_list",
    "cable_overview",
    "topology",
    "wires_part_list",
    "cable_diagram",
    "terminal_diagram",
    "structure_identifier_overview",
    "plc_diagram",
    "device_tag_list_de",
    "unknown",
    "no_footer",
]

SEARCH_NAMES = {
    "device_tag_list": "Device Tag List",
    "connection_list": "Connection List",
    "cable_overview": "Cable overview",
    "topology": "Topology: Routed cables / connections",
    "wires_part_list": "Wires parts list",
    "cable_diagram": "Cable diagram",
    "terminal_diagram": "Terminal diagram",
    "structure_identifier_overview": "Structure identifier overview",
    "plc_diagram": "PLC diagram",
    "device_tag_list_de": "Artikelstückliste",
}

COLORS = ["BK", "BN", "GY", "BU", "GNYE", "RD"]

_PARAS = [
    "Industrial control cabinets route signal and power wiring between "
    "field devices and controllers across terminal strips.",
    "Cable schedules document conductor cross sections, colors and "
    "routing tracks for every connection in the plant.",
    "Terminal diagrams map each strip pin to its incoming and outgoing "
    "cables so maintenance teams can trace circuits quickly.",
    "Programmable logic controllers expose their IO through rack and "
    "module addresses referenced by symbolic names.",
    "Structure identifiers group equipment by function, location and "
    "product following the IEC 81346 aspect model.",
]


def _tr(cells, bbox=None) -> str:
    attr = f' data-bbox="{bbox}"' if bbox else ""
    tds = "".join(f"<td>{c if c is not None else ''}</td>" for c in cells)
    return f"<tr{attr}>{tds}</tr>"


def _table(region: str, rows: list[str], bbox: str) -> str:
    return f'<table data-region="{region}" data-bbox="{bbox}">' + "".join(rows) + "</table>"


def _row_bbox(x0: float, y: float, x1: float, h: float = 10.0) -> str:
    return f"{x0},{y},{x1},{y + h}"


def _footer_html(f: int, l: int, project: str, product: str, no_tags: bool = False) -> str:
    """no_tags=True: footer exists (project present) but the hierarchy
    grid is empty — page tags get no completion prefix, so unparseable
    tags stay unparseable ('Tag is invalid' path, god.py:288-292)."""
    row0 = _tr(["", "", ""]) if no_tags else _tr([f"=F{f}", f"+L{l}", ""])
    grid = (
        '<table class="footer-grid">'
        + row0
        + _tr(["rev A", "2025-01-01", "sheet"])
        + _tr(["", "", ""])
        + "</table>"
    )
    return (
        "<footer>"
        f'<div class="project">{project}</div>'
        f'<div class="product">{product}</div>' + grid + "</footer>"
    )


def _boilerplate(rng: DetRng) -> str:
    links = "".join(
        f'<a href="/nav/{i}">Section {i}</a> ' for i in range(rng.randint(4, 8))
    )
    ad = (
        '<div class="ad"><a href="/buy">Buy now</a> <a href="/cheap">Cheap '
        'cables</a> <a href="/deal">Deal</a></div>'
    )
    return f"<nav>{links}</nav>{ad}"


def _paragraphs(rng: DetRng) -> tuple[str, list[str]]:
    texts = [
        _PARAS[rng.randint(0, len(_PARAS) - 1)] for _ in range(rng.randint(1, 3))
    ]
    return "".join(f"<p>{t}</p>" for t in texts), texts


def _main_table_html(rows: list[list], y0: float = 200.0) -> str:
    trs = [
        _tr(cells, _row_bbox(100, y0 + 10 * i, 800)) for i, cells in enumerate(rows)
    ]
    return _table("main", trs, f"100,{y0},800,{y0 + 10 * len(rows)}")


def _gen_device_rows(rng: DetRng, dev_prefix="M") -> list[list]:
    header = ["tag", "Quantity", "Designation", "Type number", "Manufacturer", "Part number"]
    rows = [header]
    for _ in range(rng.randint(2, 6)):
        k = rng.randint(1, 40)
        tag = rng.choice([f"-{dev_prefix}{k}", f"=F{rng.randint(1, 3)}+L{rng.randint(1, 4)}-{dev_prefix}{k}"])
        if rng.u() < 0.06:
            tag = f"GARBAGE{k}"  # no separator: invalid unless footer-completed
        rows.append(
            [
                tag,
                str(rng.randint(1, 3)),
                f"Motor {k}",
                f"T-{k:03d}",
                rng.choice(["ACME", "Globex", "Initech"]),
                f"P{k:05d}",
            ]
        )
    if rng.u() < 0.3:
        rows.append(["", "1", "Ghost device", "", "", ""])  # empty-tag skip case
    return rows


def _gen_connection_rows(rng: DetRng) -> list[list]:
    header = ["name", "src_pin_tag", "dst_pin_tag", "Color", "Cross-section"]
    rows = [header]
    for _ in range(rng.randint(2, 6)):
        a, b = rng.randint(1, 20), rng.randint(1, 20)
        pin_a = rng.choice([":1", ":2", ":PE", ":1:2"])
        rows.append(
            [
                f"W{rng.randint(1, 9)}",
                f"-X{a}{pin_a}",
                f"-X{b}:{rng.randint(1, 8)}",
                rng.choice(COLORS),
                rng.choice(["0.75", "1.5", "2.5"]),
            ]
        )
    if rng.u() < 0.3:
        rows.append(["W0", "", f"-X{rng.randint(1, 20)}:1", "BK", ""])  # skip case
    return rows


def _gen_cable_overview_rows(rng: DetRng) -> list[list]:
    header = [
        "cable_tag", "src_tag", "dst_tag", "Cable type", "Conductors",
        "Cross-section", "Length", "Function text",
    ]
    rows = [header]
    for i in range(rng.randint(2, 5)):
        k = rng.randint(1, 15)
        cable = f"-W{k}" if i == 0 or rng.u() < 0.6 else ""  # ffill placeholder
        rows.append(
            [
                cable,
                f"-X{rng.randint(1, 20)}",
                f"-X{rng.randint(1, 20)}",
                rng.choice(["H05VV", "LiYY", "NYM"]),
                str(rng.randint(2, 12)),
                rng.choice(["0.75", "1.5"]),
                f"{rng.randint(1, 90)}m",
                f"feed {k}",
            ]
        )
    if rng.u() < 0.25:
        rows.append([f"-W{rng.randint(1, 15)}", "", "", "LiYY", "2", "0.75", "3m", "dangling"])
    return rows


def _gen_topology_rows(rng: DetRng) -> list[list]:
    header = [
        "designation", "Part number", "Type number", "Length [m]", "src_tags",
        "Source connection length [m]", "route", "dst_tags",
        "Target connection length [m]",
    ]
    rows = [header]
    for _ in range(rng.randint(2, 4)):
        k = rng.randint(1, 15)
        nsrc = rng.randint(1, 2)
        ndst = rng.randint(1, 2)
        src = ";".join(f"-X{rng.randint(1, 20)}" for _ in range(nsrc))
        dst = ";".join(f"-K{rng.randint(1, 10)}" for _ in range(ndst))
        route = ";".join(f"TR{rng.randint(1, 6)}" for _ in range(rng.randint(1, 3)))
        rows.append(
            [f"-W{k}", f"P{k:05d}", f"T-{k:03d}", str(rng.randint(1, 40)), src,
             str(rng.randint(1, 5)), route, dst, str(rng.randint(1, 5))]
        )
    if rng.u() < 0.3:
        rows.append([f"-W{rng.randint(1, 15)}", "", "", "", "-X1", "", "", "-K1", ""])  # empty route skip
    return rows


def _gen_wires_rows(rng: DetRng) -> list[list]:
    header = [
        "src_pin_tag", "dst_pin_tag", "Part number", "Cross-section", "Color",
        "Length", "Bundle", "Conductor end source", "Conductor end target", "route",
    ]
    rows = [header]
    for _ in range(rng.randint(2, 5)):
        route = ";".join(f"TR{rng.randint(1, 6)}" for _ in range(rng.randint(0, 2)))
        rows.append(
            [
                f"-X{rng.randint(1, 20)}:{rng.randint(1, 8)}",
                f"-K{rng.randint(1, 10)}:{rng.randint(1, 8)}",
                f"P{rng.randint(1, 999):05d}",
                rng.choice(["0.75", "1.5"]),
                rng.choice(COLORS),
                f"{rng.randint(1, 9)}m",
                f"B{rng.randint(1, 4)}",
                rng.choice(["ferrule", "tinned"]),
                rng.choice(["ferrule", "tinned"]),
                route,
            ]
        )
    return rows


def _gen_cable_diagram_rows(rng: DetRng) -> list[list]:
    header = [
        "Function text Src", "Page / Column Src", "src_tag", "src_pin", "Conductor",
        "dst_tag", "dst_pin", "Page / Column Dst", "Function text Dst",
    ]
    rows = [header]
    for _ in range(rng.randint(1, 3)):  # blocks
        k = rng.randint(1, 15)
        rows.append([f"Cable -W{k}", None, None, None, "type LiYY", None, None, None, None])
        rows.append([f"{rng.randint(2, 12)} conductors", None, None, None, None, None, None, None, None])
        rows.append(list(header))  # repeated per-block header
        ndata = rng.randint(1, 4)
        for j in range(ndata):
            ft = f"feed {k}" if j == 0 else "="
            multi = rng.u() < 0.25
            dst_tag = f"-S{rng.randint(1, 9)};-S{rng.randint(1, 9)}" if multi else f"-S{rng.randint(1, 9)}"
            dst_pin = f"{rng.randint(1, 4)};{rng.randint(1, 4)}" if multi else str(rng.randint(1, 4))
            rows.append(
                [
                    ft,
                    f"/{rng.randint(1, 9)}.{rng.randint(1, 9)}",
                    f"-K{rng.randint(1, 10)}",
                    str(rng.randint(1, 8)),
                    rng.choice(COLORS),
                    dst_tag,
                    dst_pin,
                    f"/{rng.randint(1, 9)}.{rng.randint(1, 9)}",
                    "=" if j > 0 else f"load {k}",
                ]
            )
    return rows


def _gen_terminal_diagram_html(rng: DetRng, f: int, l: int) -> str:
    strip = f"=F{f}+L{l}-X{rng.randint(30, 39)}"
    n = rng.randint(2, 5)
    ncables_l = rng.randint(1, 3)
    ncables_r = rng.randint(1, 3)

    main_rows = [["src_tag", "src_pin", "strip_pin", "Jumpers", "PLC connection point", "dst_tag", "dst_pin"]]
    for i in range(n):
        main_rows.append(
            [
                f"-K{rng.randint(1, 10)}",
                str(rng.randint(1, 8)),
                str(i + 1),
                "" if rng.u() < 0.7 else f"J{i}",
                "" if rng.u() < 0.8 else f"%I0.{i}",
                f"-S{rng.randint(1, 9)}",
                str(rng.randint(1, 4)),
            ]
        )

    def cables_rows(nc):
        return [[f"-W{rng.randint(1, 15)}", "LiYY", "x"] for _ in range(nc)]

    def conn_rows(nc):
        hdr = ["1", "2", "3", "4", "5", "6", "Function text", "Page / column"]
        out = [hdr]
        for i in range(n):
            slots = ["" for _ in range(6)]
            for _ in range(rng.randint(0, 2)):
                slot = rng.randint(1, min(6, max(nc, 1)))
                slots[slot - 1] = rng.choice(COLORS)
            out.append(slots + [f"circuit {i}", f"/{rng.randint(1, 9)}.1"])
        return out

    y = 200.0
    html = [
        _main_table_html(main_rows, y),
    ]
    y2 = y + 10 * len(main_rows) + 20
    lc = cables_rows(ncables_l)
    html.append(_table("l_cables", [_tr(c, _row_bbox(10, y2 + 10 * i, 90)) for i, c in enumerate(lc)], f"10,{y2},90,{y2 + 10 * len(lc)}"))
    lcr = conn_rows(ncables_l)
    html.append(_table("l_conn", [_tr(c, _row_bbox(10, y2 + 60 + 10 * i, 90)) for i, c in enumerate(lcr)], f"10,{y2 + 60},90,{y2 + 60 + 10 * len(lcr)}"))
    rc = cables_rows(ncables_r)
    html.append(_table("r_cables", [_tr(c, _row_bbox(810, y2 + 10 * i, 890)) for i, c in enumerate(rc)], f"810,{y2},890,{y2 + 10 * len(rc)}"))
    rcr = conn_rows(ncables_r)
    html.append(_table("r_conn", [_tr(c, _row_bbox(810, y2 + 60 + 10 * i, 890)) for i, c in enumerate(rcr)], f"810,{y2 + 60},890,{y2 + 60 + 10 * len(rcr)}"))
    html.append(f'<div data-region="strip_tag" data-bbox="450,80,550,95">{strip}</div>')

    # overlap-repair case: two intersecting float spans whose centers
    # land in cells (2, 'strip_pin') and (3, 'Jumpers') of a data row
    if rng.u() < 0.4 and n >= 2:
        row_phys = 2  # physical row index (header is row 0)
        ry = 200.0 + 10 * row_phys
        # 7 columns over x 100..800 -> width 100 each
        html.append(
            f'<span data-float="main" data-bbox="350,{ry + 2},395,{ry + 8}">OV{rng.randint(1, 9)}</span>'
        )
        html.append(
            f'<span data-float="main" data-bbox="390,{ry + 2},430,{ry + 8}">OW{rng.randint(1, 9)}</span>'
        )
    return "".join(html)


def generate_doc(i: int, seed: str = "sparkgraft") -> dict:
    """One deterministic document. Returns the input-table row dict."""
    rng = DetRng(f"{seed}:{i}")
    variant = VARIANTS[int(rng.u() * len(VARIANTS))]
    host = f"host{int(50 * rng.u() ** 3):03d}"
    lang = "de" if variant.endswith("_de") else ("de" if rng.u() < 0.1 else "en")
    url = f"https://{host}.example/{variant}/{i}"
    f, l = rng.randint(1, 3), rng.randint(1, 4)

    paras_html, paras = _paragraphs(rng)
    parts = ["<html><head><title>doc</title></head><body>", _boilerplate(rng)]

    title = SEARCH_NAMES.get(variant)
    if variant == "unknown":
        # either a non-matching title or a matching one at the wrong size
        if rng.u() < 0.5:
            parts.append('<h1 data-fontsize="24.0">Unrelated heading</h1>')
        else:
            parts.append('<h1 data-fontsize="34.0">Device Tag List</h1>')
    elif title:
        size = 21.0 + 8.0 * rng.u()
        parts.append(f'<h1 data-fontsize="{size:.1f}">{title}</h1>')

    parts.append(paras_html)

    base = variant.removesuffix("_de")
    if base == "device_tag_list":
        parts.append(_main_table_html(_gen_device_rows(rng)))
    elif base == "connection_list":
        parts.append(_main_table_html(_gen_connection_rows(rng)))
    elif base == "cable_overview":
        parts.append(_main_table_html(_gen_cable_overview_rows(rng)))
    elif base == "topology":
        parts.append(_main_table_html(_gen_topology_rows(rng)))
    elif base == "wires_part_list":
        parts.append(_main_table_html(_gen_wires_rows(rng)))
    elif base == "cable_diagram":
        parts.append(_main_table_html(_gen_cable_diagram_rows(rng)))
    elif base == "terminal_diagram":
        parts.append(_gen_terminal_diagram_html(rng, f, l))
    elif base == "structure_identifier_overview":
        rows = [["tag", "Structure description"]]
        for _ in range(rng.randint(2, 4)):
            rows.append([f"=A{rng.randint(1, 9)}", f"area {rng.randint(1, 9)}"])
        if rng.u() < 0.4:
            rows.append(["=A1+B2", "composite (rejected)"])
        parts.append(_main_table_html(rows))
    elif base == "plc_diagram":
        rows = [["tag", "plc_addr", "Placement", "Function text", "Rack", "Module", "Symbolic address", "Terminal"]]
        for j in range(rng.randint(2, 4)):
            tag = f"-A{rng.randint(1, 9)}" if j == 0 or rng.u() < 0.5 else ""
            ft = f"input {j}" if j == 0 else "="
            rows.append([tag, f"%I0.{j}", f"R{j}", ft, "1", str(j), f"SYM_{j}", str(j)])
        parts.append(_main_table_html(rows))
    elif variant == "no_footer":
        parts.append('<h1 data-fontsize="24.0">Device Tag List</h1>')
        parts.append(_main_table_html(_gen_device_rows(rng)))

    if variant != "no_footer":
        no_tags = rng.u() < 0.12  # empty footer grid: no completion prefix
        parts.append(
            _footer_html(f, l, f"Project{rng.randint(1, 3)}", f"Product {f}/{l}", no_tags)
        )
    parts.append("</body></html>")

    html = "".join(parts)
    return {
        "url": url,
        "warc_ts": _BASE_TS + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": "\n".join(paras),
        "lang": lang,
    }


def generate_corpus(n_docs: int, seed: str = "sparkgraft") -> list[dict]:
    return [generate_doc(i, seed) for i in range(n_docs)]


def docs_for_sf(sf: float) -> int:
    """sf0.001 -> 100 docs, sf0.01 -> 1k, sf0.1 -> 10k."""
    return max(1, int(sf * 100_000))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' -> 0.01; default 0.01 when unparsable."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def corpus_df(spark, n_docs: int, seed: str = "sparkgraft", partitions: int = 32):
    """Distributed deterministic generation: parallelize doc ids, build
    docs on executors (no driver-side corpus materialization — at
    10^12-doc scale the corpus is generated/read per partition)."""
    from pyspark.sql import Row

    sc = spark.sparkContext
    rdd = sc.parallelize(range(n_docs), min(partitions, max(1, n_docs))).map(
        lambda i: Row(**generate_doc(i, seed))
    )
    return spark.createDataFrame(rdd, schema=CORPUS_SCHEMA)
