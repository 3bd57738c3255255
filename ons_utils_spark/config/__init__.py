from ons_utils_spark.config.config import Config, ConfigFormatError, LoggingConfig
from ons_utils_spark.config.validation import (
    get_all_errors,
    get_underlined_header,
    get_schema_errors,
    remove_list_wrappers,
)

__all__ = [
    "Config",
    "ConfigFormatError",
    "LoggingConfig",
    "get_all_errors",
    "get_schema_errors",
    "get_underlined_header",
    "remove_list_wrappers",
]
