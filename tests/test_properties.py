"""Property-based invariants for the tag kernel (hypothesis).

The reference's test strategy has no property tests (SURVEY.md §5);
these pin the algebraic invariants the distributed layer relies on:
determinism, idempotent footer completion, parse/reconstruct
consistency, GUID stability.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from indu_doc_transformer_spark.config import DEFAULT_ASPECTS
from indu_doc_transformer_spark.kernels import tagparse as tp

SEPS = tuple(DEFAULT_ASPECTS.separators)

value = st.text(
    alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_", min_size=0, max_size=6
)
tag_strings = st.lists(
    st.tuples(st.sampled_from(SEPS), value), min_size=0, max_size=6
).map(lambda parts: "".join(s + v for s, v in parts))
footer_lists = st.lists(tag_strings, min_size=0, max_size=4)


@given(tag_strings)
def test_parse_deterministic_and_total(tag):
    a = tp.try_parse_tag(tag, SEPS)
    b = tp.try_parse_tag(tag, SEPS)
    assert a == b
    if tag:
        # a tag built purely from separators+values always parses
        assert a is not None


@given(tag_strings)
def test_values_never_contain_separators(tag):
    parsed = tp.try_parse_tag(tag, SEPS) or {}
    for sep, vals in parsed.items():
        assert sep in SEPS
        for v in vals:
            for s in SEPS:
                assert s not in v


@given(tag_strings, footer_lists)
@settings(max_examples=200)
def test_footer_completion_idempotent(tag, footer):
    once = tp.complete_tag_with_footer(tag, footer, DEFAULT_ASPECTS)
    twice = tp.complete_tag_with_footer(once, footer, DEFAULT_ASPECTS)
    assert twice == once


@given(tag_strings)
def test_reconstruct_parses_back_to_same_parts(tag):
    name = tp.reconstruct_name(tag, DEFAULT_ASPECTS)
    if name:
        p1 = {k: v for k, v in tp.tag_parts(tag, DEFAULT_ASPECTS).items()}
        p2 = {k: v for k, v in tp.tag_parts(name, DEFAULT_ASPECTS).items()}
        assert p1 == p2


@given(tag_strings)
def test_guid_is_stable_and_uuid_shaped(tag):
    g1 = tp.xtarget_guid(tag)
    g2 = tp.xtarget_guid(tag)
    assert g1 == g2
    parts = g1.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]


@given(st.text(min_size=0, max_size=20))
def test_split_pin_roundtrip(s):
    tag, pin = tp.split_pin_tag(s)
    assert tag + (pin or "") == s
    assert ":" not in tag


@given(value, st.sampled_from(["src", "dst"]), st.integers(1, 4))
def test_pin_chain_links_child_guids(name, role, depth):
    pin = "".join(f":{name}{i}" for i in range(depth))
    chain = tp.pin_chain(pin, role, "L" * 8)
    assert len(chain) == depth
    for i in range(1, depth):
        assert chain[i]["child_guid"] == chain[i - 1]["guid"]
