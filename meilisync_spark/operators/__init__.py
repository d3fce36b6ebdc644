from meilisync_spark.operators.project import apply_fields, normalize_types, snapshot_sync  # noqa: F401
from meilisync_spark.operators.compaction import compact_last_wins  # noqa: F401
from meilisync_spark.operators.apply import apply_changes  # noqa: F401
from meilisync_spark.operators.check import count_check  # noqa: F401
from meilisync_spark.operators.refresh import refresh_data  # noqa: F401
