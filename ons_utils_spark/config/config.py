"""YAML config loading with attribute binding and normalization passes.

Parity: reference ``ons_utils/config/config.py:33-304`` with the app name
parameterized (the reference hard-codes ``cprices`` literals at
``config.py:79-80,241`` — SURVEY.md §2.10 says keep the shape, drop the
literals). Directory cascade, ``to_unpack`` hoisting, the attr-transform
passes and the ``dictConfig`` logging setup are all preserved.
"""

from __future__ import annotations

import os
from collections.abc import Collection, Mapping, Sequence
from datetime import datetime
from logging.config import dictConfig
from pathlib import Path
from typing import Any, Optional, Union

import yaml

from ons_utils_spark.generic import (
    fill_tuple_keys,
    fill_tuples,
    flatten_dict,
    get_key_value_pairs,
    is_non_string_sequence,
    list_convert,
    tuple_convert,
)


class ConfigFormatError(Exception):
    """Raised when the config YAML is not a mapping (reference ``config.py:25-30``)."""

    def __init__(self):
        super().__init__("attributes or config yaml must be a mapping")


class Config:
    """YAML config bound to instance attributes.

    Parameters
    ----------
    filename
        Config filename without the ``.yaml`` extension.
    subdir
        Subdirectory within the config dir holding the file.
    to_unpack
        Keys whose nested mappings are hoisted to top-level attributes
        (in addition to keeping the mapping itself).
    app_name
        Application namespace: the env var ``{APP_NAME}_CONFIG`` (upper-cased)
        and the home-directory cascade are derived from it. The reference
        hard-coded ``cprices``.
    config_dir
        Explicit config directory — bypasses the cascade entirely (useful
        for tests and services).
    """

    def __init__(
        self,
        filename: str,
        subdir: Optional[str] = None,
        to_unpack: Optional[Sequence[str]] = None,
        app_name: str = "ons_utils_spark",
        config_dir: Optional[Union[str, Path]] = None,
    ):
        self.name = filename
        self.app_name = app_name
        self._explicit_config_dir = Path(config_dir) if config_dir else None
        self.config_path = self.get_config_path(subdir)
        self.set_attrs(self.load_config(), to_unpack)

    def get_config_dir(self) -> Path:
        """Locate the config directory.

        Order (reference ``config.py:60-85``): the ``{APP_NAME}_CONFIG`` env
        var; else the first of ``~/{app}/{app}``, ``~/{app}``, ``~``, cwd
        that contains a ``config`` folder.
        """
        if self._explicit_config_dir:
            return self._explicit_config_dir

        env_value = os.getenv(f"{self.app_name.upper()}_CONFIG")
        if env_value:
            return Path(env_value)

        app = self.app_name
        for loc in (
            Path.home().joinpath(app, app),
            Path.home().joinpath(app),
            Path.home(),
            Path.cwd(),
        ):
            if loc.joinpath("config").exists():
                return loc.joinpath("config")
        raise FileNotFoundError(
            f"no config directory found for app {self.app_name!r}; set"
            f" {self.app_name.upper()}_CONFIG or pass config_dir"
        )

    def get_config_path(self, subdir: Optional[str] = None) -> Path:
        filename = self.name + ".yaml"
        parts = [filename] if not subdir else [subdir, filename]
        return self.get_config_dir().joinpath(*parts)

    def load_config(self) -> Any:
        with open(self.config_path) as f:
            return yaml.safe_load(f)

    def update(self, attrs: Mapping[str, Any]) -> None:
        for key, value in attrs.items():
            setattr(self, key, value)

    def set_attrs(
        self,
        attrs: Mapping[str, Any],
        to_unpack: Optional[Sequence[str]] = None,
    ) -> None:
        """Bind ``attrs`` as attributes; hoist the ``to_unpack`` mappings first."""
        if not isinstance(attrs, Mapping):
            raise ConfigFormatError
        for attr in to_unpack or []:
            nested = attrs[attr]
            if not isinstance(nested, Mapping):
                raise TypeError(f"given attr {attr} to unpack must be a mapping")
            self.update(nested)
        self.update(attrs)

    # -- normalization passes (reference config.py:138-222) ----------------

    def flatten_nested_dicts(self, attrs: Sequence[str]) -> None:
        self.update({k: flatten_dict(getattr(self, k)) for k in attrs})

    def get_key_value_pairs(self, attrs: Sequence[str]) -> None:
        self.update({k: get_key_value_pairs(getattr(self, k)) for k in attrs})

    def fill_tuples(
        self, attrs: Sequence[str], repeat: bool = True, length: Optional[int] = None
    ) -> None:
        self.update(
            {k: fill_tuples(getattr(self, k), repeat=repeat, length=length) for k in attrs}
        )

    def fill_tuple_keys(
        self, attrs: Sequence[str], repeat: bool = True, length: Optional[int] = None
    ) -> None:
        self.update(
            {k: fill_tuple_keys(getattr(self, k), repeat=repeat, length=length) for k in attrs}
        )

    def extend_attr(self, attr: str, extend_vals: Any) -> None:
        current = getattr(self, attr)
        if not is_non_string_sequence(current):
            raise AttributeError(f"attribute {attr} is not an extendable type")
        if isinstance(current, tuple):
            extend_vals = tuple_convert(extend_vals)
        else:
            extend_vals = list_convert(extend_vals)
        setattr(self, attr, current + extend_vals)

    def remove_from_attr(self, attr: str, remove: Collection[Any]) -> None:
        current = getattr(self, attr)
        if not isinstance(current, Collection):
            raise AttributeError(
                f"attribute {attr} is not a collection. There are no removable items"
            )
        setattr(self, attr, [x for x in current if x not in remove])

    def prepend_dir(self, attrs: Sequence[str], dir: Union[str, os.PathLike]) -> None:
        """Prepend a directory to filepath attrs (str or dict-of-paths)."""
        for attr in attrs:
            current = getattr(self, attr)
            if isinstance(current, Mapping):
                setattr(
                    self,
                    attr,
                    {key: Path(dir, path).as_posix() for key, path in current.items()},
                )
            else:
                setattr(self, attr, Path(dir, current).as_posix())


class LoggingConfig:
    """Timestamped-log-id console+file logging setup.

    Parity: reference ``config.py:225-304``, app-name parameterized
    (log dir ``~/{app}/{app}/run_logs`` or ``~/{app}_run_logs``).
    """

    def __init__(self, app_name: str = "ons_utils_spark", log_dir: Optional[Path] = None):
        self.app_name = app_name
        self._explicit_log_dir = Path(log_dir) if log_dir else None
        self.log_id = self.create_log_id()
        self.log_dir = self.get_logs_dir()
        self.filename = f"{self.log_id}.log"
        self.full_path = self.log_dir.joinpath(self.filename).as_posix()

    def create_log_id(self) -> str:
        return "log_" + datetime.now().strftime("%y%m%d_%H%M%S")

    def get_logs_dir(self) -> Path:
        if self._explicit_log_dir:
            return self._explicit_log_dir
        loc = Path.home().joinpath(self.app_name, self.app_name)
        if loc.exists():
            return loc.joinpath("run_logs")
        return Path.home().joinpath(f"{self.app_name}_run_logs")

    def create_logs_dir(self) -> None:
        self.get_logs_dir().mkdir(parents=True, exist_ok=True)

    def set_logging_config(
        self,
        console: str = "basic",
        text_log: str = "debug",
        disable_other_loggers: bool = False,
    ) -> None:
        """Apply a ``dictConfig`` with a console and a file handler."""
        dictConfig(
            {
                "version": 1,
                "loggers": {
                    "": {
                        "handlers": ["console", "file_log"],
                        "level": "INFO",
                        "propagate": False,
                    },
                },
                "handlers": {
                    "console": {
                        "class": "logging.StreamHandler",
                        "formatter": console,
                        "level": "INFO",
                    },
                    "file_log": {
                        "class": "logging.FileHandler",
                        "formatter": text_log,
                        "level": "DEBUG",
                        "mode": "w",
                        "filename": self.full_path,
                    },
                },
                "formatters": {
                    "basic": {"format": "%(message)s"},
                    "debug": {
                        "format": "[%(asctime)s %(levelname)s - file=%(filename)s:%(lineno)d] %(message)s",
                        "datefmt": "%y/%m/%d %H:%M:%S",
                    },
                },
                "disable_existing_loggers": disable_other_loggers,
            }
        )
