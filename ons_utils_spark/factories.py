"""Decorator factories that transform function arguments before the call.

Parity: reference ``ons_utils/factories.py:16-135`` (pinned by
``tests/test_decorators.py:25-65``). Semantics kept exactly:

- ``include`` and ``exclude`` are mutually exclusive (both → ``ValueError``);
- positional args are matched to parameter names via introspection;
- ``None`` arguments are never transformed (reference ``factories.py:121``);
  the reference's kwargs path guards on the wrong variable
  (``kwargs is not None`` at ``factories.py:133`` — SURVEY.md §2.10 bug),
  here the *value* is guarded.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Optional, Sequence, Union

from ons_utils_spark.generic import list_convert


def args_kwargs_transformer_factory(
    transform_func: Callable[[Any], Any],
) -> Callable:
    """Build a decorator that applies ``transform_func`` to arguments.

    The produced decorator can be used bare (``@dec``) or parameterized
    (``@dec(include=...)`` / ``@dec(exclude=...)``) to limit which parameter
    names are transformed.
    """

    def decorator(
        _func: Optional[Callable] = None,
        *,
        include: Optional[Union[str, Sequence[str]]] = None,
        exclude: Optional[Union[str, Sequence[str]]] = None,
    ) -> Callable:
        if include and exclude:
            raise ValueError(
                "only one of include or exclude parameters can be specified"
                " but both have been specified"
            )
        if include:
            included = set(list_convert(include))
            should_transform = included.__contains__
        elif exclude:
            excluded = set(list_convert(exclude))
            should_transform = lambda name: name not in excluded  # noqa: E731
        else:
            should_transform = lambda name: True  # noqa: E731

        def apply(func: Callable) -> Callable:
            param_names = inspect.getfullargspec(func).args

            @functools.wraps(func)
            def wrapper(*args: Any, **kwargs: Any) -> Any:
                new_args = [
                    transform_func(arg)
                    if arg is not None and i < len(param_names) and should_transform(param_names[i])
                    else arg
                    for i, arg in enumerate(args)
                ]
                new_kwargs = {
                    name: transform_func(value)
                    if value is not None and should_transform(name)
                    else value
                    for name, value in kwargs.items()
                }
                return func(*new_args, **new_kwargs)

            return wrapper

        # Support both @decorator and @decorator(include=...) forms.
        return apply if _func is None else apply(_func)

    return decorator
