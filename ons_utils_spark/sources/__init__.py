from ons_utils_spark.sources.media import read_media_dir
from ons_utils_spark.sources.store import compact_store, partitioned_delta_append
from ons_utils_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "compact_store",
    "load_tables",
    "partitioned_delta_append",
    "read_media_dir",
    "register_views",
]
