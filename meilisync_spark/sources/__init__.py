from meilisync_spark.sources.parquet import TABLES, load_table, register_views  # noqa: F401
from meilisync_spark.sources.events import normalize_events, DEFAULT_OP_MAP  # noqa: F401
