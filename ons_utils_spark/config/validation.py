"""Config validation: schema checks + file/table existence probes.

Parity: reference ``ons_utils/config/validation.py:106-347`` with its two
latent bugs fixed (SURVEY.md §2.10): the reference calls a commented-out
``full_schema`` (NameError) and references an undefined ``hdfs`` module —
here the schema is an argument and the existence checkers are injectable
callables, so the module works without cerberus or pydoop.

The built-in validator covers the cerberus subset the reference's schemas
actually use (``type``, ``required``, ``allowed``, ``min``/``max``,
``schema`` for nested mappings); error messages keep the reference's
``parameter <dotted.path>: <message>`` shape.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import lru_cache
from os.path import isfile
from typing import Any, Callable, Optional, Tuple, Union

from pyspark.sql import SparkSession

Section = Union[str, Tuple[str, ...]]

_TYPE_MAP = {
    "string": str,
    "integer": int,
    "float": (int, float),
    "number": (int, float),
    "boolean": bool,
    "list": (list, tuple),
    "dict": Mapping,
}


def _validate_value(path: str, value: Any, rules: Mapping[str, Any]) -> list[str]:
    errors: list[str] = []
    expected = rules.get("type")
    if expected is not None:
        py_type = _TYPE_MAP.get(expected)
        if py_type is None:
            errors.append(f"parameter {path}: unknown schema type {expected!r}")
            return errors
        if expected == "boolean":
            ok = isinstance(value, bool)
        elif expected in ("integer",):
            ok = isinstance(value, int) and not isinstance(value, bool)
        else:
            ok = isinstance(value, py_type)
        if not ok:
            errors.append(f"parameter {path}: must be of {expected} type")
            return errors
    if "allowed" in rules and value not in rules["allowed"]:
        errors.append(f"parameter {path}: unallowed value {value}")
    if "min" in rules and isinstance(value, (int, float)) and value < rules["min"]:
        errors.append(f"parameter {path}: min value is {rules['min']}")
    if "max" in rules and isinstance(value, (int, float)) and value > rules["max"]:
        errors.append(f"parameter {path}: max value is {rules['max']}")
    if "schema" in rules and isinstance(value, Mapping):
        errors.extend(_validate_mapping(value, rules["schema"], prefix=path))
    return errors


def _validate_mapping(
    config: Mapping[str, Any], schema: Mapping[str, Any], prefix: str = ""
) -> list[str]:
    errors: list[str] = []
    for key, rules in schema.items():
        path = f"{prefix}.{key}" if prefix else key
        if key not in config or config[key] is None:
            if rules.get("required"):
                errors.append(f"parameter {path}: required field")
            continue
        errors.extend(_validate_value(path, config[key], rules))
    return errors


def get_schema_errors(config: Mapping[str, Any], schema: Mapping[str, Any]) -> list[str]:
    """Validate a config mapping against a schema; unknown keys are allowed
    (the reference ran cerberus with ``allow_unknown=True``,
    ``validation.py:208-219``)."""
    return _validate_mapping(config, schema)


@lru_cache(maxsize=32)
def file_exists(path: str) -> bool:
    """Cached file-existence probe (reference ``validation.py:313-315`` —
    lru_cache kept; the undefined-``hdfs`` bug replaced by local ``isfile``;
    inject a custom checker in :func:`get_all_errors` for HDFS/S3)."""
    return isfile(path)


def hive_table_exists(spark: SparkSession, table: str) -> bool:
    """Catalog probe via the public API (reference used ``_jsparkSession``,
    ``validation.py:318-320``)."""
    return spark.catalog.tableExists(table)


def get_underlined_header(header: str, underline: str = "-") -> str:
    """Header followed by a same-length underline (reference ``validation.py:323-326``)."""
    return f"{header}\n{underline * len(header)}"


def remove_list_wrappers(
    d: Mapping[str, Any]
) -> dict[str, Any]:
    """Unwrap single-element list wrappers recursively (cerberus wraps each
    error value in a list — reference ``validation.py:329-347``)."""
    out: dict[str, Any] = {}
    for key, value in d.items():
        if isinstance(value, list) and len(value) == 1:
            value = value[0]
        if isinstance(value, Mapping):
            value = remove_list_wrappers(value)
        out[key] = value
    return out


def _iter_section(config: Any, section: Section) -> Mapping[str, str]:
    keys = (section,) if isinstance(section, str) else tuple(section)
    node: Any = config
    for key in keys:
        node = getattr(node, key) if not isinstance(node, Mapping) else node[key]
    if not isinstance(node, Mapping):
        raise TypeError(f"section {section!r} is not a mapping of label -> path")
    return node


def get_all_errors(
    config,
    sections_schema: Optional[Mapping[str, Mapping[str, Any]]] = None,
    file_sections: Optional[Sequence[Section]] = None,
    table_sections: Optional[Sequence[Section]] = None,
    spark: Optional[SparkSession] = None,
    file_checker: Callable[[str], bool] = file_exists,
    table_checker: Callable[[SparkSession, str], bool] = hive_table_exists,
) -> str:
    """Combine schema errors and file/table existence errors into one string.

    Mirrors reference ``get_all_errors`` (``validation.py:145-205``): one
    combined message under an underlined header, empty string when clean.
    Sections with ``active: false`` are skipped (reference
    ``validation.py:250-259``).
    """
    if table_sections and not spark:
        raise ValueError(
            "a spark session needs to be passed to spark if table_sections is passed"
        )

    err_msgs: list[str] = []
    config_vars = {
        k: v for k, v in vars(config).items() if not k.startswith("_")
    }

    for section, schema in (sections_schema or {}).items():
        value = config_vars.get(section)
        if value is None:
            err_msgs.append(f"parameter {section}: required section missing")
            continue
        if isinstance(value, Mapping) and value.get("active") is False:
            continue
        err_msgs.extend(
            _validate_mapping(value, schema, prefix=section)
            if isinstance(value, Mapping)
            else [f"parameter {section}: must be of dict type"]
        )

    for section in file_sections or []:
        for label, path in _iter_section(config, section).items():
            if not file_checker(path):
                err_msgs.append(f"file for {label} at {path} does not exist")

    for section in table_sections or []:
        for label, table in _iter_section(config, section).items():
            if not table_checker(spark, table):
                err_msgs.append(f"table for {label} at {table} does not exist")

    if err_msgs:
        header = get_underlined_header(f"Validation errors for config {config.name}")
        err_msgs = ["\n" + header] + err_msgs
    return "\n".join(err_msgs)
