"""Pure-Python helper functions (parity with reference ``ons_utils/generic.py``).

Behavioral parity notes (reference file:line cited per function). The reference
depends on the ``flatten_dict`` package; this implementation carries its own
minimal flatten/unflatten so the engine has no extra dependency.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any


def flatten_dict(d: Mapping[Any, Any]) -> dict[tuple, Any]:
    """Flatten a nested mapping to a single-level dict with tuple keys.

    Leaves are any non-mapping values (and empty mappings are dropped, same as
    the ``flatten_dict`` package the reference uses at ``generic.py:6``).
    """
    out: dict[tuple, Any] = {}

    def walk(node: Mapping[Any, Any], prefix: tuple) -> None:
        for key, value in node.items():
            path = prefix + (key,)
            if isinstance(value, Mapping) and len(value) > 0:
                walk(value, path)
            else:
                out[path] = value

    walk(d, ())
    return out


def unflatten_dict(d: Mapping[tuple, Any]) -> dict[Any, Any]:
    """Inverse of :func:`flatten_dict`: tuple-keyed dict → nested dict."""
    out: dict[Any, Any] = {}
    for path, value in d.items():
        node = out
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    return out


def invert_nested_keys(d: Mapping[Any, Any]) -> dict[Any, Any]:
    """Invert the order of the keys in a nested dict.

    Parity: reference ``generic.py:9-11`` (flatten → reverse each tuple key →
    unflatten). Depth-2 example: ``{a: {x: 1}} → {x: {a: 1}}``.
    """
    return unflatten_dict({path[::-1]: v for path, v in flatten_dict(d).items()})


def get_key_value_pairs(d: Mapping[Any, Any]) -> list[tuple[Any, Any]]:
    """Dict → list of ``(key, value)`` tuples, exploding sequence values.

    If a value is a non-string sequence, one pair is emitted per element.
    Parity: reference ``generic.py:14-25``.
    """
    pairs: list[tuple[Any, Any]] = []
    for key, value in d.items():
        for k in list_convert(key):
            for v in list_convert(value):
                pairs.append((k, v))
    return pairs


def fill_tuples(
    tuples: Sequence[Any],
    length: int | None = None,
    repeat: bool = False,
    fill_method: str = "bfill",
) -> Sequence[tuple]:
    """Pad the given objects to equal-length tuples.

    Parity: reference ``generic.py:28-65``. Semantics pinned by
    ``tests/test_generic.py:84-111``:

    - ``length=None``: pad to the max length among non-string-sequence inputs;
      if no input is a non-string sequence, return the input unchanged.
    - ``repeat=False``: pad with ``None``; ``repeat=True``: repeat the edge
      value.
    - ``fill_method='bfill'`` pads at the front, ``'ffill'`` pads at the end.
    - Non-sequence inputs are wrapped as 1-tuples before padding.
    """
    if not length:
        seq_lengths = [len(t) for t in tuples if is_non_string_sequence(t)]
        if not seq_lengths:
            return tuples
        length = max(seq_lengths)

    filled: list[tuple] = []
    for obj in tuples:
        tup = tuple_convert(obj)
        pad = length - len(tup)
        if pad > 0:
            if fill_method == "bfill":
                tup = tuple([tup[0] if repeat else None] * pad) + tup
            else:
                tup = tup + tuple([tup[-1] if repeat else None] * pad)
        filled.append(tup)
    return filled


def fill_tuple_keys(
    d: Mapping[Any, Any],
    length: int | None = None,
    repeat: bool = False,
    fill_method: str = "bfill",
) -> dict[tuple, Any]:
    """Pad a dict's keys to equal-length tuples (reference ``generic.py:68-88``)."""
    filled_keys = fill_tuples(list(d.keys()), length, repeat, fill_method)
    return dict(zip(filled_keys, d.values()))


def is_non_string_sequence(obj: Any) -> bool:
    """True for list/tuple-like sequences, False for strings and non-sequences.

    Parity: reference ``generic.py:91-93`` (sets are NOT sequences).
    """
    return isinstance(obj, Sequence) and not isinstance(obj, (str, bytes))


def tuple_convert(obj: Any) -> tuple:
    """Coerce to tuple; strings/scalars (incl. None) wrap as 1-tuples.

    Parity: reference ``generic.py:96-102``.
    """
    return tuple(obj) if is_non_string_sequence(obj) else (obj,)


def list_convert(obj: Any) -> list:
    """Coerce to list; strings/scalars (incl. None) wrap as 1-element lists.

    Parity: reference ``generic.py:105-111`` (``None → [None]``).
    """
    return list(obj) if is_non_string_sequence(obj) else [obj]
