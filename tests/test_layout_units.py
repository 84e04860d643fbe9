"""Unit tests for the layout kernel — the reference's per-operator test
style (SURVEY.md §5) recast onto our region tables."""

import pytest

from indu_doc_transformer_spark.config import RegionSetup, _cols
from indu_doc_transformer_spark.kernels.html import Block, TableRow, parse_blocks
from indu_doc_transformer_spark.kernels.layout import (
    PageFault,
    detect_page_type,
    extract_footer,
    extract_main_text,
    extract_region_table,
    reshape_cable_diagram,
    reshape_terminal_diagram,
    RegionTable,
)


def mk_table(region, rows, y0=100.0):
    trs = [
        TableRow(cells=[c if c != "" else None for c in r],
                 bbox=(100.0, y0 + 10 * i, 800.0, y0 + 10 * (i + 1)))
        for i, r in enumerate(rows)
    ]
    return Block(kind="table", region=region, rows=trs)


class TestRegionTable:
    SETUP = RegionSetup(columns=_cols("a", ("b", False), ("c", True, "=")))

    def test_header_dropped_and_renamed(self):
        t = mk_table("main", [["x", "y", "z"], ["1", "2", "3"]])
        rt, errs = extract_region_table([t], [], "main", self.SETUP)
        assert rt.cols == ["a", "c"]
        assert rt.rows == [["1", "3"]]
        assert errs == []

    def test_missing_table_fault_message(self):
        with pytest.raises(PageFault, match="No required table\\(s\\) found on the page: main"):
            extract_region_table([], [], "main", self.SETUP)

    def test_column_count_fault(self):
        t = mk_table("main", [["x", "y"], ["1", "2"]])
        with pytest.raises(PageFault, match="Expected 3 columns, found 2"):
            extract_region_table([t], [], "main", self.SETUP)

    def test_nonempty_filter_keeps_original_index(self):
        t = mk_table("main", [["h", "h", "h"], ["1", "", "x"], ["", "", ""], ["2", "", "y"]])
        rt, _ = extract_region_table([t], [], "main", self.SETUP)
        assert rt.idxs == [0, 2]

    def test_forward_fill_placeholder_and_none(self):
        t = mk_table(
            "main",
            [["h", "h", "h"], ["1", "", "v1"], ["2", "", "="], ["3", "", ""]],
        )
        rt, _ = extract_region_table([t], [], "main", self.SETUP)
        # '=' and None both inherit v1 (replace+ffill fills NaN too)
        assert [r[1] for r in rt.rows] == ["v1", "v1", "v1"]

    def test_demoted_header_keeps_all_rows(self):
        setup = RegionSetup(columns=_cols("a", "b", "c"), row_offset=-1)
        t = mk_table("main", [["1", "2", "3"], ["4", "5", "6"]])
        rt, _ = extract_region_table([t], [], "main", setup)
        assert len(rt.rows) == 2

    def test_promote_header_two_levels(self):
        setup = RegionSetup(columns=_cols("a", "b", "c"), row_offset=1)
        t = mk_table("main", [["x", "x", "x"], ["y", "y", "y"], ["1", "2", "3"]])
        rt, _ = extract_region_table([t], [], "main", setup)
        assert rt.rows == [["1", "2", "3"]]

    def test_overlap_repair_center_method(self):
        setup = RegionSetup(columns=_cols("a", "b", "c"), overlap_test=True)
        t = mk_table("main", [["h", "h", "h"], ["1", "2", "3"]])
        # row 1 bbox y 110-120; cells split 100-333-566-800
        f1 = Block(kind="float_span", float_region="main", bbox=(200.0, 112.0, 420.0, 118.0), text="AA")
        f2 = Block(kind="float_span", float_region="main", bbox=(400.0, 112.0, 700.0, 118.0), text="BB")
        rt, errs = extract_region_table([t], [f1, f2], "main", setup)
        assert rt.rows == [["AA", "BB", "3"]]
        assert [s for s, _ in errs] == ["INFO", "INFO"]
        assert "row #0 overlap detected: replaced col #0: 1 -> AA" in errs[0][1]


class TestCableDiagramSegmentation:
    def test_blocks_segmented(self):
        cols = ["f", "src_tag", "src_pin", "x"]
        rows = [
            ["Cable -W1", None, None, None],
            ["info", None, None, None],
            ["f", "src_tag", "src_pin", "x"],
            ["a", "s1", "1", "v"],
            ["b", "s2", "2", "v"],
            ["Cable -W2", None, None, None],
            ["info", None, None, None],
            ["f", "src_tag", "src_pin", "x"],
            ["c", "s3", "3", "v"],
        ]
        rt = RegionTable(cols, rows, [None] * len(rows), list(range(len(rows))))
        out = reshape_cable_diagram(rt)
        assert out.cols == cols + ["cable_tag"]
        assert [r[-1] for r in out.rows] == ["-W1", "-W1", "-W2"]
        assert [r[0] for r in out.rows] == ["a", "b", "c"]
        assert out.idxs == [0, 1, 2]


class TestTerminalDiagram:
    def test_transform_and_concat(self):
        regions = {
            "main": RegionTable(
                ["src_tag", "src_pin", "strip_pin", "dst_tag", "dst_pin"],
                [["-K1", "1", "7", "-S1", "2"]],
                [(0.0, 0.0, 1.0, 1.0)],
                [0],
            ),
            "strip_tag": RegionTable(["strip_tag"], [["-X9"]], [None], [0]),
            "l_cables": RegionTable(["cable_tag"], [["-W5"], ["-W6"]], [None, None], [0, 1]),
            "l_conn": RegionTable(
                ["1", "2", "Function text"],
                [["BK", "", "c0"]],
                [None],
                [0],
            ),
            "r_cables": RegionTable(["cable_tag"], [["-W7"]], [None], [0]),
            "r_conn": RegionTable(
                ["1", "2", "Function text"],
                [["", "GY", "c0"]],  # slot 2 -> cable index 1 (missing) -> skipped
                [None],
                [0],
            ),
        }
        out = reshape_terminal_diagram(regions)
        row = dict(zip(out.cols, out.rows[0]))
        assert row["_1cable_tag"] == "-W5" and row["_1Color"] == "BK"
        assert row["_2cable_tag"] == "" and row["_2Color"] == ""  # OOB slot skipped
        assert row["_1dst_tag"] == "-X9" and row["_2src_tag"] == "-X9"
        assert row["_1dst_pin"] == "7" and row["_2src_pin"] == "7"
        assert row["_1src_tag"] == "-K1" and row["_2dst_tag"] == "-S1"


class TestClassifierFooterContent:
    HTML = (
        '<html><body><nav><a href="/x">AAA</a><a href="/y">BBB</a></nav>'
        '<h1 data-fontsize="24.0">Device Tag List</h1>'
        "<p>This paragraph is long enough to be kept as main content.</p>"
        '<div class="ad"><a href="/b">Buy</a> <a href="/c">Now</a></div>'
        "<footer><div class=\"project\">P1</div><div class=\"product\">Q1</div>"
        '<table class="footer-grid">'
        "<tr><td>=F1</td><td>+L2</td><td></td></tr>"
        "<tr><td>m</td><td>m</td><td>m</td></tr>"
        "<tr><td></td><td></td><td></td></tr>"
        "</table></footer></body></html>"
    )

    def test_classify(self):
        assert detect_page_type(parse_blocks(self.HTML)) == "device_tag_list"

    def test_wrong_size_not_classified(self):
        html = self.HTML.replace('data-fontsize="24.0"', 'data-fontsize="31.0"')
        assert detect_page_type(parse_blocks(html)) is None

    def test_footer(self):
        f = extract_footer(parse_blocks(self.HTML))
        assert f == {"project_name": "P1", "product_name": "Q1", "tags": ["=F1", "+L2"]}

    def test_no_project_means_no_footer(self):
        html = self.HTML.replace('<div class="project">P1</div>', "")
        assert extract_footer(parse_blocks(html)) is None

    def test_main_text_drops_boilerplate(self):
        text = extract_main_text(parse_blocks(self.HTML))
        assert "Device Tag List" in text
        assert "paragraph is long enough" in text
        assert "Buy" not in text and "AAA" not in text


class TestCorpusDeterminism:
    def test_same_seed_same_bytes(self):
        from indu_doc_transformer_spark.sources.corpus import generate_doc

        a = generate_doc(7)
        b = generate_doc(7)
        assert a["html"] == b["html"] and a["url"] == b["url"]
        c = generate_doc(7, seed="other")
        assert c["html"] != a["html"]
