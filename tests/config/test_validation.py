"""Validation tests — the reference's test_validation.py is empty and its
module has two latent bugs (SURVEY.md §2.10); these tests pin the fixed
behavior."""

import pytest

from ons_utils_spark.config.validation import (
    get_all_errors,
    get_schema_errors,
    get_underlined_header,
    remove_list_wrappers,
)


class FakeConfig:
    name = "fake"

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


SCHEMA = {
    "threads": {"type": "integer", "required": True, "min": 1},
    "mode": {"type": "string", "allowed": ["fast", "safe"]},
    "nested": {"type": "dict", "schema": {"flag": {"type": "boolean"}}},
}


class TestSchemaErrors:
    def test_clean_config(self):
        errors = get_schema_errors(
            {"threads": 4, "mode": "fast", "nested": {"flag": True}}, SCHEMA
        )
        assert errors == []

    def test_type_error(self):
        assert get_schema_errors({"threads": "four"}, SCHEMA) == [
            "parameter threads: must be of integer type"
        ]

    def test_required_missing(self):
        assert "parameter threads: required field" in get_schema_errors({}, SCHEMA)

    def test_allowed_and_range(self):
        errors = get_schema_errors({"threads": 0, "mode": "turbo"}, SCHEMA)
        assert "parameter threads: min value is 1" in errors
        assert "parameter mode: unallowed value turbo" in errors

    def test_nested_schema_dotted_path(self):
        errors = get_schema_errors({"threads": 1, "nested": {"flag": "yes"}}, SCHEMA)
        assert errors == ["parameter nested.flag: must be of boolean type"]

    def test_unknown_keys_allowed(self):
        assert get_schema_errors({"threads": 1, "extra": 9}, SCHEMA) == []

    def test_bool_is_not_integer(self):
        assert get_schema_errors({"threads": True}, SCHEMA) == [
            "parameter threads: must be of integer type"
        ]


class TestGetAllErrors:
    def test_clean_returns_empty_string(self):
        cfg = FakeConfig(section={"threads": 2})
        out = get_all_errors(cfg, {"section": {"threads": {"type": "integer"}}})
        assert out == ""

    def test_combines_with_header(self):
        cfg = FakeConfig(section={"threads": "x"})
        out = get_all_errors(cfg, {"section": {"threads": {"type": "integer"}}})
        assert "Validation errors for config fake" in out
        assert "parameter section.threads" in out

    def test_inactive_section_skipped(self):
        cfg = FakeConfig(section={"active": False, "threads": "x"})
        out = get_all_errors(cfg, {"section": {"threads": {"type": "integer"}}})
        assert out == ""

    def test_file_sections_use_injected_checker(self):
        cfg = FakeConfig(mappers={"a": "/data/a.parquet", "b": "/data/b.parquet"})
        out = get_all_errors(
            cfg,
            file_sections=["mappers"],
            file_checker=lambda p: p.endswith("a.parquet"),
        )
        assert "file for b at /data/b.parquet does not exist" in out
        assert "file for a" not in out

    def test_table_sections_need_spark(self):
        cfg = FakeConfig(tables={"t": "db.t"})
        with pytest.raises(ValueError, match="spark session needs to be passed"):
            get_all_errors(cfg, table_sections=["tables"])

    def test_table_sections_with_injected_checker(self, spark):
        cfg = FakeConfig(tables={"good": "db.good", "bad": "db.bad"})
        out = get_all_errors(
            cfg,
            table_sections=["tables"],
            spark=spark,
            table_checker=lambda s, t: t == "db.good",
        )
        assert "table for bad at db.bad does not exist" in out


class TestHelpers:
    def test_underlined_header(self):
        assert get_underlined_header("abc") == "abc\n---"

    def test_remove_list_wrappers(self):
        wrapped = {"a": ["msg"], "b": [{"c": ["inner"]}]}
        assert remove_list_wrappers(wrapped) == {"a": "msg", "b": {"c": "inner"}}
