"""Config-driven dynamic schema (F11): page setups serialize to JSON
and back without loss (the reference's PageSettings.save/load,
page_settings.py:88-129)."""

from indu_doc_transformer_spark.config import (
    PAGE_SETUPS,
    AspectsConfig,
    DEFAULT_ASPECTS,
    page_setups_from_json,
    page_setups_to_json,
)


def test_page_setups_json_roundtrip():
    s = page_setups_to_json(PAGE_SETUPS)
    back = page_setups_from_json(s)
    assert back == PAGE_SETUPS
    assert page_setups_to_json(back) == s


def test_aspects_config_json_roundtrip():
    s = DEFAULT_ASPECTS.to_json_str()
    back = AspectsConfig.from_json_str(s)
    assert back == DEFAULT_ASPECTS
    assert back.separators == ["=", "+", "-", ":", "/", "&"]


def test_separator_ge_priority_slice():
    assert DEFAULT_ASPECTS.separator_ge(["-"]) == ["=", "+", "-"]
    assert DEFAULT_ASPECTS.separator_ge([]) == DEFAULT_ASPECTS.separators
    assert DEFAULT_ASPECTS.separator_ge(["=", "&"]) == DEFAULT_ASPECTS.separators
